package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.operators.Splits

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships, built entirely from this engine's operators:
  *
  *  1. quality gate   — keep docs with `qualityScore >= minQuality`
  *     (row-local, runs in the scan's codegen);
  *  2. exact dedup    — keep the smallest id per content fingerprint
  *     (one hash aggregate on the 128-bit md5 + a semi join);
  *  3. decontaminate  — drop docs sharing any word `n`-gram with the eval
  *     set (eval grams broadcast; the corpus side never shuffles);
  *  4. split          — deterministic md5-threshold train/val/test labels.
  *
  * Every stage is declarative, so Catalyst pipelines 1 with the scan,
  * fuses the joins of 2-3, and the whole thing is ~3 shuffles end-to-end
  * regardless of corpus size. Deterministic by construction (no rand()),
  * so reruns and backfills produce byte-identical corpora.
  */
object Pipeline {

  /** [[curateDetailed]] result: the curated frame plus the handle for the
    * persisted quality-gated corpus it reads from. The gated corpus feeds
    * THREE plan branches (dedup keep-set, gram explosion, final joins);
    * without the persist, Spark re-evaluates the regex-heavy quality
    * filter per branch (no cross-branch CSE) — measured 3× the pipeline
    * cost. Call [[CuratedCorpus.unpersist]] once the curated frame has
    * been written/consumed (round-1 lesson: never strand a persisted
    * handle inside a lazily-returned frame). */
  final case class CuratedCorpus(curated: DataFrame, gated: DataFrame) {
    def unpersist(): Unit = { gated.unpersist(); () }
  }

  /** One-call convenience over [[curateDetailed]]; the persisted gated
    * corpus stays cached for the returned frame's lifetime (bounded: it is
    * at most the post-quality-filter corpus projection). */
  def curate(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8
  ): DataFrame =
    curateDetailed(docs, evalDocs, idCol, textCol, minQuality, contaminationNgram).curated

  /** [[curate]] + content-defined chunking of the surviving corpus — the
    * emit shape a training pipeline writes: one row per ~`chunkBytes`
    * chunk with the doc's split label and the chunk text carried
    * (`TextAnalysis.cdcChunks`; Rabin rolling-hash cuts, so edited or
    * re-crawled docs re-align with the previous corpus's chunks after
    * ~one window — the property chunk-level dedup/caching relies on).
    * Same shuffle count as [[curate]]: the chunk explode is narrow. */
  def curateChunked(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8,
      chunkWindow: Int = 16,
      chunkBytes: Int = 64
  ): DataFrame =
    TextAnalysis.cdcChunks(
      curateDetailed(docs, evalDocs, idCol, textCol, minQuality, contaminationNgram).curated,
      idCol, textCol, chunkWindow, chunkBytes,
      carryCols = Seq("split"), emitText = true)

  /** [[curate]] + a chunk-level novelty gate against a reference corpus
    * (the previous crawl, an already-ingested snapshot): docs whose
    * content-defined chunks are mostly already present
    * (`novelty < minNovelty`, [[graft.dedup.Dedup.chunkNovelty]]) drop
    * before the split — re-crawls and boilerplate assemblies that exact
    * dedup misses because a few bytes changed. Adds one digest
    * membership join (corpus reduced to distinct chunk digests) and one
    * semi join over [[curate]]'s shuffle count.
    *
    * Granularity contract: a document that chunks into `k` pieces can
    * only score novelty in steps of `1/k` — a prefix-edited replay
    * scores exactly `1/k` (one changed chunk) — so `minNovelty` must
    * exceed `1/k_min`; with the default ~64-byte chunks, 0.6 catches
    * replays down to 2-chunk (~128-byte) documents (spec-asserted). */
  def curateNovel(
      docs: DataFrame,
      evalDocs: DataFrame,
      referenceCorpus: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8,
      minNovelty: Double = 0.5
  ): DataFrame = {
    val cc = curateDetailed(docs, evalDocs, idCol, textCol, minQuality, contaminationNgram)
    val novelIds = graft.dedup.Dedup
      .chunkNovelty(cc.curated, referenceCorpus, idCol, textCol)
      .filter(col("novelty") >= minNovelty)
      .select(idCol)
    cc.curated.join(novelIds, Seq(idCol), "left_semi")
  }

  /** Shard-routed twin of [[curate]] — the composition a 100 TB corpus
    * actually runs: every document's content FINGERPRINT is routed to one
    * of `nShards` shards by rendezvous hashing
    * ([[graft.operators.Routing.rendezvousAssign]] on the md5 fingerprint,
    * the dedup key), and the exact-dedup keep-set groups by
    * `(shard, fingerprint)`. The shard is functionally determined by the
    * fingerprint, so the groups — and therefore the output SET — are
    * identical to the global [[curate]] (spec-pinned set-equality;
    * oracle-gated as `q_curate_sharded`). What the route buys at scale:
    * equal fingerprints co-shard by construction, and every other stage is
    * already shard-independent — the quality gate is row-local, the
    * decontamination join probes a BROADCAST eval-gram set, and the split
    * label is row-local — so the whole post-gate pipeline can run as
    * `nShards` independent jobs (different cluster, different day) with
    * ZERO cross-shard traffic, then a bare union. Rendezvous (not `mod`)
    * keeps re-sharding cheap: changing `nShards` by one moves ~1/n of the
    * fingerprint space. Returns `(idCol, shard, split, textCol)` rows —
    * the shard column is the routing key an external pipeline splits on. */
  def curateSharded(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8
  ): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val q = docs.repartition(par)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact dedup under the shard route: keep-min-id per (shard, fp) —
    // identical groups to the global path (shard = f(fp))
    val routed = graft.operators.Routing.rendezvousAssign(
      q.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("__fp")),
      "__fp", nShards)
    val keepIds = routed
      .groupBy("shard", "__fp").agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("shard"))
    val deduped = q.join(keepIds, Seq(idCol))
    def grams(df: DataFrame) = explode(graft.functions.shingle_hashes(
      TextAnalysis.tokens(col(textCol)), contaminationNgram)).as("g")
    val evalPar = evalDocs.repartition(par)
    val evalGrams = evalPar.select(grams(evalPar)).distinct()
    val contaminated = deduped.select(col(idCol), grams(deduped))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    val out = Splits.assignSplit(clean, idCol)
      .select(col(idCol), col("shard"), col("split"), col(textCol))
      .localCheckpoint() // eager: release the gated cache before returning
    q.unpersist()
    out
  }

  /** Day-N INCREMENTAL curation against the standing dedup catalog
    * ([[graft.dedup.Dedup.dedupCatalogOfBatch]] family) — the composition
    * a daily 100 TB ingest actually runs, where "the corpus so far" is
    * never re-scanned:
    *
    *  1. quality gate   — row-local, as [[curate]];
    *  2. history dedup  — drop batch docs whose content fingerprint is
    *     already CATALOGED ([[graft.dedup.Dedup.dedupCatalogFlag]]:
    *     one probe join against distinct-content-sized state, O(batch +
    *     state) instead of O(corpus));
    *  3. in-batch dedup — keep-min-id per fingerprint within the batch;
    *  4. decontaminate  — broadcast eval-gram anti-join, as [[curate]];
    *  5. split          — deterministic md5-threshold labels.
    *
    * Returns `(curated, updatedCatalog)`: the catalog gains EVERY
    * quality-gated batch fingerprint (including ones later dropped by
    * decontamination — re-crawls of contaminated content stay deduped),
    * via one [[graft.dedup.Dedup.dedupCatalogMerge]]. With an EMPTY
    * catalog this equals the one-shot [[curate]] output on the batch
    * (spec-asserted), which is the day-0 bootstrap. */
  def curateIncremental(
      catalog: DataFrame,
      batch: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      batchId: Long,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8
  ): (DataFrame, DataFrame) = {
    val par = batch.sparkSession.sparkContext.defaultParallelism
    val q = batch.repartition(par)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2. history dedup: the catalog probe
    val novel = graft.dedup.Dedup.dedupCatalogFlag(catalog, q, idCol, textCol)
      .filter(col("is_dup") === 0).select(idCol)
    val fresh = q.join(novel, Seq(idCol), "left_semi")
    // 3. in-batch exact dedup (keep-min-id)
    val keepIds = fresh
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = fresh.join(keepIds, Seq(idCol), "left_semi")
    // 4. decontamination (broadcast eval grams)
    def grams(df: DataFrame) = explode(graft.functions.shingle_hashes(
      TextAnalysis.tokens(col(textCol)), contaminationNgram)).as("g")
    val evalPar = evalDocs.repartition(par)
    val evalGrams = evalPar.select(grams(evalPar)).distinct()
    val contaminated = deduped.select(col(idCol), grams(deduped))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    // 5. split; eager so the gated cache can be released
    val curated = Splits.assignSplit(clean, idCol)
      .select(col(idCol), col("split"), col(textCol))
      .localCheckpoint()
    val updated = graft.dedup.Dedup.dedupCatalogMerge(catalog,
        graft.dedup.Dedup.dedupCatalogOfBatch(q, idCol, textCol, batchId))
      .localCheckpoint()
    q.unpersist()
    (curated, updated)
  }

  /** Empty catalog frame (day-0 bootstrap for [[curateIncremental]]). */
  def emptyCatalog(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("fingerprint", StringType),
        StructField("first_batch", LongType, nullable = false),
        StructField("first_id", LongType),
        StructField("n_seen", LongType, nullable = false))))
  }

  def curateDetailed(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8
  ): CuratedCorpus = {
    // 1. quality gate — persisted: read by three downstream branches.
    // Repartition FIRST: a compacted source (one parquet file = one
    // partition) would otherwise pin every narrow CPU stage that follows —
    // quality regexes, md5 fingerprints, n-gram explosion — to one core
    // (round-1 lesson; the shuffle moves only raw text once).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val q = docs.repartition(par)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2. exact dedup (keep-min-id)
    val keepIds = q
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = q.join(keepIds, Seq(idCol), "left_semi")
    // 3. decontamination against the eval set — grams as 64-bit kernel
    // hashes (same trade as Dedup.crossNgramContamination)
    def grams(df: DataFrame) = explode(graft.functions.shingle_hashes(
      TextAnalysis.tokens(col(textCol)), contaminationNgram)).as("g")
    // eval side gets the same single-partition-source treatment
    val evalPar = evalDocs.repartition(par)
    val evalGrams = evalPar.select(grams(evalPar)).distinct()
    val contaminated = deduped.select(col(idCol), grams(deduped))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    // 4. deterministic split labels
    CuratedCorpus(Splits.assignSplit(clean, idCol), q)
  }

  /** One-pass filter-funnel readout: for a sequence of named predicates,
    * how many rows survive each CUMULATIVE conjunction — the pipeline
    * observability report a curation run publishes before anyone trusts
    * its output ("the repetition rule is what ate 40% of the corpus").
    * A single aggregation computes every stage (map-side combined
    * conditional sums — no per-stage passes, no joins); the row explosion
    * at the end is over the one aggregate row. Returns
    * `(stage, stage_name, n_docs, survival)` with stage 0 = "all". */
  def filterFunnel(df: DataFrame,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(stages.nonEmpty, "filterFunnel needs at least one stage")
    val cums = stages.scanLeft(lit(true))((acc, st) => acc && st._2).tail
    val aggs = count(lit(1)).as("__n0") +: cums.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"__n${i + 1}")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val names = "all" +: stages.map(_._1)
    val arr = array(names.indices.map(i => struct(
      lit(i).as("stage"), lit(names(i)).as("stage_name"),
      col(s"__n$i").as("n_docs"),
      (col(s"__n$i").cast("double") / col("__n0")).as("survival"))): _*)
    row.select(explode(arr).as("__s"))
      .select(col("__s.stage"), col("__s.stage_name"), col("__s.n_docs"),
        col("__s.survival"))
  }
}
