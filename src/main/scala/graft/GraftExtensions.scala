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
  }
}
