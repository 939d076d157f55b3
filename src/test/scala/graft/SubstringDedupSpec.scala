package graft

import org.apache.spark.sql.functions._

/** Semantics of exact-substring removal (`Dedup.removeDuplicatedSpans`) on
  * handcrafted corpora, plus a hash-vs-exact-grouping equivalence sweep on
  * the real fixture. (Cross-engine parity: the `q_dedup_substring` DuckDB
  * oracle rebuilds the character cover independently and hash-matches at
  * sf0.001 / sf0.01 / sf0.1.)
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val k = 40

  private def run(docs: Seq[(Long, String)], k: Int = k) =
    graft.dedup.Dedup.removeDuplicatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)]
      .collect()

  test("a substring shared across two docs is cut from BOTH, exactly") {
    val shared = "0123456789" * 6 // 60 chars, length >= k
    // boundary chars DIFFER between the docs (X/Y vs W/Z) so the maximal
    // shared substring is exactly `shared` — flanking chars survive
    val a = s"aaaa left contextX${shared}Yright aaaa"
    val b = s"bbbb other prefixW${shared}Zsuffix bbbb"
    val out = run(Seq(1L -> a, 2L -> b))
    // duplicated 40-grams are precisely those fully inside `shared`, so
    // the merged cover is exactly the 60 shared characters — all copies
    // removed, per the ExactSubstr contract
    assert(out(0) === ((1L, "aaaa left contextXYright aaaa", 1, 60)))
    assert(out(1) === ((2L, "bbbb other prefixWZsuffix bbbb", 1, 60)))
  }

  test("internal repetition within ONE doc is cut (both copies)") {
    val x = "abcdefghij" * 5 // 50 chars
    val out = run(Seq(1L -> s"$x--MID--$x", 2L -> "completely unrelated content here"))
    // the two copies of x are each covered; the periodic overlap inside
    // the repeat also duplicates, but the cover cannot exceed the copies
    val (_, clean, spans, removed) = out(0)
    assert(!clean.contains("abcdefghij"))
    assert(clean.contains("MID") || removed > 100) // separator survives unless bridged
    assert(removed >= 100 && spans >= 1)
    assert(out(1)._4 === 0) // unrelated doc untouched
  }

  test("docs shorter than one gram are unchanged; identical docs empty out") {
    val whole = "z" * 80
    val out = run(Seq(1L -> "short text", 2L -> whole, 3L -> whole))
    assert(out(0) === ((1L, "short text", 0, 0)))
    assert(out(1) === ((2L, "", 1, 80)))
    assert(out(2) === ((3L, "", 1, 80)))
  }

  test("overlapping duplicated regions merge into one maximal span") {
    // two distinct 45-char repeats placed adjacently in doc 1: covers
    // [0,45) and [45,90) merge into a single maximal interval
    val r1 = "p" * 20 + "q" * 25
    val r2 = "u" * 25 + "v" * 20
    // distinct boundary chars (Q/R/S) keep each shared region maximal at
    // exactly r1 / r2; inside doc 1 their covers are adjacent and merge
    val out = run(Seq(1L -> (r1 + r2 + "S-tail-only-here"),
      2L -> (r1 + "Q elsewhere"), 3L -> (r2 + "R another")))
    val (_, clean, spans, removed) = out(0)
    assert(spans === 1, s"expected one merged span, got $spans")
    assert(removed === 90 && clean === "S-tail-only-here")
  }

  test("matches a brute-force reference on random binary-alphabet corpora") {
    // alphabet {a, b} with k=6 forces dense duplication, overlap chains,
    // and whole-doc covers — the adversarial shapes for interval merging
    val rnd = new scala.util.Random(20260814L)
    val kk = 6
    def brute(docs: Seq[(Long, String)]): Seq[(Long, String, Int, Int)] = {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for ((_, t) <- docs; i <- 0 to t.length - kk)
        counts.updateWith(t.substring(i, i + kk))(c => Some(c.getOrElse(0) + 1))
      docs.map { case (id, t) =>
        val covered = new Array[Boolean](t.length)
        for (i <- 0 to t.length - kk; if counts(t.substring(i, i + kk)) >= 2;
             j <- i until i + kk) covered(j) = true
        val clean = t.indices.collect { case j if !covered(j) => t(j) }.mkString
        val spans = t.indices.count(j => covered(j) && (j == 0 || !covered(j - 1)))
        (id, clean, spans, covered.count(identity))
      }
    }
    for (trial <- 1 to 5) {
      val docs = (1L to 12L).map(id =>
        id -> Seq.fill(5 + rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b').mkString)
      val got = run(docs, k = kk).toSeq
      assert(got === brute(docs), s"trial $trial mismatch")
    }
  }

  test("hash-keyed grouping matches exact substring grouping on the fixture") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaHash = graft.dedup.Dedup.removeDuplicatedSpans(docs, "doc_id", "text", k = k)
    // exact twin: group on the REAL 40-char gram, not its XXH64 hash
    val pos = docs.select(col("doc_id"), col("text"),
        posexplode(split(col("text"), "")).as(Seq("__p0", "__ch")))
      .filter(col("__p0") <= length(col("text")) - k)
      .select(col("doc_id"), col("__p0"),
        expr(s"substring(text, __p0 + 1, $k)").as("__gram"))
    val dup = pos.withColumn("__c",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__gram")))
      .filter(col("__c") >= 2)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("__p0").cast("long"))).as("__starts"))
    val viaExact = docs.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.cut_spans(col("text"),
          coalesce(col("__starts"), array().cast("array<bigint>")), k).as("c"))
      .select(col("doc_id"), col("c.clean_text").as("clean_text"),
        col("c.n_spans").as("n_spans"), col("c.n_removed").as("n_removed"))
    assert(viaHash.exceptAll(viaExact).count() === 0L)
    assert(viaExact.exceptAll(viaHash).count() === 0L)
  }
}
