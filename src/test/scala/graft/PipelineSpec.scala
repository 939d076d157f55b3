package graft

import org.apache.spark.sql.functions._

/** End-to-end curation pipeline invariants (the oracle hash-checks exact
  * content; these assert the semantic contract on real fixture data). */
class PipelineSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val train = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val evalDocs = docs.filter(col("doc_id") % 10 === 0)
  private lazy val curated =
    Pipeline.curate(train, evalDocs, "doc_id", "text").cache()

  test("curated corpus is a subset of the train side with all stages active") {
    assert(curated.count() > 0)
    assert(curated.join(evalDocs, Seq("doc_id"), "left_semi").count() == 0)
    assert(curated.join(train, Seq("doc_id"), "left_semi").count() == curated.count())
  }

  test("no exact duplicates survive") {
    val fps = curated.select(
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count())
  }

  test("no curated doc shares an 8-gram with the eval set") {
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(explode(
      array_distinct(graft.text.TextAnalysis.wordNgrams(col("text"), 8))).as("g"))
    assert(grams(curated).join(grams(evalDocs), Seq("g")).count() == 0)
  }

  test("every kept doc meets the quality bar and has a split label") {
    val below = curated.filter(
      graft.text.TextAnalysis.qualityScore(col("text")) < 0.83).count()
    assert(below == 0)
    val splits = curated.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("deterministic: rerun on a repartitioned input yields the identical corpus") {
    val again = Pipeline.curate(train.repartition(13), evalDocs, "doc_id", "text")
    assert(curated.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).isEmpty &&
      again.select("doc_id", "split").exceptAll(curated.select("doc_id", "split")).isEmpty)
  }

  test("curateIncremental: empty catalog == one-shot curate; catalog update is the monoid merge") {
    import graft.dedup.Dedup
    val (day0, cat0) = Pipeline.curateIncremental(
      Pipeline.emptyCatalog(spark), train, evalDocs, "doc_id", "text", batchId = 0L)
    // day-0 bootstrap: no history to dedup against -> identical to curate
    val g = curated.select("doc_id", "split")
    val s0 = day0.select("doc_id", "split")
    assert(g.exceptAll(s0).isEmpty && s0.exceptAll(g).isEmpty)
    // the updated catalog is exactly merge(old, ofBatch(quality-gated day))
    val gated = train.filter(
      graft.text.TextAnalysis.qualityScore(col("text")) >= 0.83)
    val want = Dedup.dedupCatalogOfBatch(gated, "doc_id", "text", 0L)
    assert(cat0.exceptAll(want).isEmpty && want.exceptAll(cat0).isEmpty)
    // day 1 is a FULL REPLAY of day 0: every fingerprint is cataloged,
    // so nothing survives the history probe...
    val (day1, cat1) = Pipeline.curateIncremental(
      cat0, train, evalDocs, "doc_id", "text", batchId = 1L)
    assert(day1.count() === 0L)
    // ...and the catalog is SIZE-invariant (bounded by distinct content,
    // not batch count) with every gated fingerprint seen again
    assert(cat1.count() === cat0.count())
    assert(cat1.agg(min("n_seen")).collect().head.getLong(0) >= 2L)
  }

  test("curateSharded output is set-equal to the global curate, any nShards") {
    for (nShards <- Seq(1, 8)) {
      val sharded = Pipeline.curateSharded(
        train, evalDocs, "doc_id", "text", nShards = nShards)
      val g = curated.select("doc_id", "split")
      val s = sharded.select("doc_id", "split")
      assert(g.exceptAll(s).isEmpty && s.exceptAll(g).isEmpty,
        s"nShards=$nShards diverged from global curate")
      // the shard column is the rendezvous route of the doc's fingerprint:
      // in range, and constant per fingerprint (equal fps co-shard)
      val shards = sharded.select("shard").distinct()
        .collect().map(_.getLong(0))
      assert(shards.forall(sh => sh >= 0 && sh < nShards))
      val fpShards = sharded
        .select(graft.text.TextAnalysis.fingerprint(col("text")).as("fp"),
          col("shard"))
        .groupBy("fp").agg(countDistinct("shard").as("ns"))
        .filter(col("ns") > 1).count()
      assert(fpShards == 0, "a fingerprint routed to two shards")
    }
  }
}
