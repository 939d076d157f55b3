package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL-surface registration for the graft native expressions, enabling
  * `SELECT cosine_sim(a, b)` etc. from `spark.sql`.
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "", "", "",
        "", "", "", "built-in")

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - euclidean distance of two float vectors"),
      (children: Seq[Expression]) => L2Distance(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a token array"),
      (children: Seq[Expression]) => SimHash64(children.head)))

    ext.injectFunction((FunctionIdentifier("sorted_intersection_count"),
      info("sorted_intersection_count",
        "sorted_intersection_count(a, b) - |a ∩ b| of two sorted distinct arrays"),
      (children: Seq[Expression]) => SortedIntersectionCount(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(tokens[, n]) - sorted distinct rolling n-gram hashes (n default 3)"),
      (children: Seq[Expression]) => ShingleHashes(children.head,
        n = children.lift(1).map(foldableInt).getOrElse(3), seed = 42L)))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(tokens[, k]) - k-hash MinHash signature (k default 128)"),
      (children: Seq[Expression]) => MinHashSignature(children.head,
        numHashes = children.lift(1).map(foldableInt).getOrElse(128), seed = 42L)))

    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text[, k[, w]]) - sorted distinct winnowing minima (k=7, w=4)"),
      (children: Seq[Expression]) => WinnowFingerprints(children.head,
        k = children.lift(1).map(foldableInt).getOrElse(7),
        w = children.lift(2).map(foldableInt).getOrElse(4))))

    ext.injectFunction((FunctionIdentifier("cdc_boundaries"),
      info("cdc_boundaries",
        "cdc_boundaries(text[, w[, d]]) - content-defined chunking cut positions (w=16, d=64)"),
      (children: Seq[Expression]) => CdcBoundaries(children.head,
        w = children.lift(1).map(foldableInt).getOrElse(16),
        d = children.lift(2).map(foldableInt).getOrElse(64))))

    ext.injectFunction((FunctionIdentifier("jaro_sim"),
      info("jaro_sim", "jaro_sim(a, b) - Jaro similarity of two strings"),
      (children: Seq[Expression]) => JaroSimilarity(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings"),
      (children: Seq[Expression]) => JaroWinklerSimilarity(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))

    // parser extension: `SHOW GRAFT CHECKS` catalog command, everything
    // else delegated verbatim — the fourth and last extension surface
    // (functions, planner strategy, optimizer rule, parser)
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))

    // whole-operator extension: plans graft.plans.AsofJoin logical nodes to
    // the native sort-merge AsofJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // limit pushdown through the left-preserving AsofJoin (Catalyst's own
    // LimitPushDown cannot reason about a foreign node)
    ext.injectOptimizerRule(_ => graft.plans.AsofLimitPushDown)
  }

  /** Literal int argument of a SQL call (e.g. `shingle_hashes(toks, 2)`). */
  private def foldableInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal int argument, got $e")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
  }
}
