package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{CountMinSketchAgg, HllSketchAgg, KmvSketchAgg, Md5Hash60}

/** Sketch-backed frequency / cardinality / set-overlap operators.
  *
  * Everything here is the 100 TB shape: ONE streaming aggregation pass
  * whose shuffled state is a constant-size sketch per group (a CMS
  * matrix, k hash mins, or 2^p byte registers), never the keys
  * themselves. All three sketches hash with the md5-derived
  * [[graft.functions.Md5Hash60]], so a DuckDB oracle rebuilds the exact
  * same sketch bit-for-bit — these are full hash-match queries, not
  * recall-floor contracts (the same graduation pattern as
  * `q_dedup_simhash`).
  *
  * Reference scope: the reference engine has no sketch surface at all
  * (its `metric_results` are exact counts); these extend SURVEY §2c's
  * "custom sketch → Aggregator" line beyond the DDSketch quantiles.
  */
object Sketches {

  /** Spark-SQL twin of [[Md5Hash60.hash60]]: non-negative 60-bit long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Count-Min point estimates for every key in `keys`, checked against
    * a sketch built over `tokenArrays` in one pass (depth×width longs of
    * aggregation state). Returns `keys` with an `est` column satisfying
    * `est >= true_count`, equality unless the key collides in all
    * `depth` rows. At 100 TB the candidate `keys` frame would come from
    * a sample / prior window — the sketch pass itself never materializes
    * per-key state.
    */
  def cmsEstimates(tokenArrays: DataFrame, tokenArrayCol: String,
      keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64, md5Hash: Boolean = true): DataFrame = {
    val cms = CountMinSketchAgg.columnFn(depth, width, md5Hash)(col(tokenArrayCol))
    val counters = tokenArrays.agg(cms.as("__cms"))
    // the lookup hash must be the SAME function the Aggregator used:
    // md5 path mirrors hash60(j + ":" + key); xxh64 scale path mirrors
    // xxhash64(lit(j), key) (see CountMinSketchAgg.bucket)
    def rowBucket(j: Int) =
      if (md5Hash) hash60(concat(lit(s"$j:"), col(keyCol))) % width
      else pmod(xxhash64(lit(j.toLong), col(keyCol)), lit(width.toLong))
    val est = (0 until depth)
      .map(j => element_at(col("__cms"), (lit(j * width) + rowBucket(j) + 1).cast("int")))
      .reduce(least(_, _))
    keys.crossJoin(broadcast(counters)).withColumn("est", est).drop("__cms")
  }

  /** Sketch-based equi-join cardinality estimate (Cormode &
    * Muthukrishnan 2005 §4.2, "An improved data stream summary: the
    * count-min sketch and its applications", J. Algorithms): build one
    * Count-Min sketch over each side's join key, then
    * `est = min_j Σ_b cmsA[j][b] · cmsB[j][b]` — the per-row inner
    * product is an UPPER bound on the true join size
    * `Σ_k cntA(k)·cntB(k)` (colliding keys only add cross terms), and
    * the min over `depth` independent rows tightens it. The query
    * planner's use case: size a join BEFORE running it — two O(input)
    * sketch passes with `depth·width` longs of aggregation state replace
    * the shuffle the join itself would need, which is what makes the
    * estimate affordable at 100 TB (both sketches broadcast; the final
    * inner product is a driver-sized crossJoin of two 1-row frames).
    * All-integer math end to end — the DuckDB oracle rebuilds both
    * counter matrices and the min-of-inner-products bit-for-bit. */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 256, md5Hash: Boolean = true): DataFrame = {
    val cms = CountMinSketchAgg.columnFn(depth, width, md5Hash)(_)
    val skA = a.select(array(col(aKey).cast("string")).as("__t"))
      .agg(cms(col("__t")).as("__ra"))
    val skB = b.select(array(col(bKey).cast("string")).as("__t"))
      .agg(cms(col("__t")).as("__rb"))
    val prod = zip_with(col("__ra"), col("__rb"), (x, y) => x * y)
    val rowSums = (0 until depth).map { j =>
      aggregate(slice(prod, j * width + 1, width), lit(0L), (acc, x) => acc + x)
    }
    skA.crossJoin(broadcast(skB))
      .select(least(rowSums: _*).as("est_join_size"))
  }

  /** Per-group KMV sketch (array of the k smallest distinct hash60
    * values of `keyCol`) plus the distinct-count estimate read off it:
    * exact set size while `|group| < k`, else `(k-1)·2^60 / h_k`.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int = 64): DataFrame = {
    val kmv = KmvSketchAgg.columnFn(k)(col(keyCol).cast("string"))
    df.groupBy(groupCols.map(col): _*)
      .agg(kmv.as("kmv"))
      .withColumn("est_distinct", kmvEstimate(col("kmv"), k))
  }

  /** Estimate off a KMV sketch column (array<long>, sorted ascending). */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * Md5Hash60.Range) /
        element_at(sketch, k).cast("double"))

  /** Set-overlap estimates between every pair of groups, from per-group
    * KMV sketches alone (the pair stage touches only `#groups²` sketch
    * rows, never the raw data — the reason KMV beats exact distinct
    * pipelines at scale). For groups A,B with sketches `ka`,`kb`:
    * union sketch `ku = k smallest of (ka ∪ kb)`, overlap rate
    * `rho = |ku ∩ ka ∩ kb| / |ku|` (Jaccard estimate), and
    * `est_union = estimate(ku)`, `est_intersection = rho · est_union`.
    * All array algebra over longs — deterministic, oracle-reproducible.
    */
  def kmvOverlap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    val sk = kmvDistinct(df, Seq(groupCol), keyCol, k)
      .select(col(groupCol), col("kmv"))
    val a = sk.select(col(groupCol).as("ga"), col("kmv").as("ka"))
    val b = sk.select(col(groupCol).as("gb"), col("kmv").as("kb"))
    val ku = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    val rhoCnt = size(array_intersect(array_intersect(ku, col("ka")), col("kb")))
    a.join(b, col("ga") < col("gb"))
      .withColumn("__ku", ku)
      .withColumn("jaccard_est", rhoCnt / size(col("__ku")).cast("double"))
      .withColumn("est_union", kmvEstimate(col("__ku"), k))
      .withColumn("est_intersection", col("jaccard_est") * col("est_union"))
      .select(col("ga"), col("gb"), col("jaccard_est"), col("est_union"),
        col("est_intersection"))
  }

  /** Per-group HyperLogLog distinct estimate (2^p byte registers of
    * aggregation state per group; merge = register max, so re-processing
    * duplicate keys is a no-op). Emits the estimate plus the exact
    * long-arithmetic harmonic sum and zero-register count the oracle
    * recomputes.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    val hll = HllSketchAgg.columnFn(p)(col(keyCol).cast("string"))
    df.groupBy(groupCols.map(col): _*)
      .agg(hll.as("__h"))
      .select(groupCols.map(col) :+
        round(col("__h.est"), 2).as("est_distinct") :+
        col("__h.harmonicSumScaled").as("harmonic_sum_scaled") :+
        col("__h.zeros").as("zero_registers"): _*)
  }

  /** Per-group HLL REGISTERS as a persistable binary column — the
    * sketch-lifecycle form: write these per (segment, day), and any
    * later rollup re-aggregates them with [[hllRollup]] without ever
    * reprocessing raw keys. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    val hll = graft.functions.HllRegistersAgg.columnFn(p)(col(keyCol).cast("string"))
    df.groupBy(groupCols.map(col): _*).agg(hll.as("hll_regs"))
  }

  /** Second-level rollup of stored register columns to coarser groups:
    * the same `(est_distinct, harmonic_sum_scaled, zero_registers)`
    * surface as [[hllDistinct]] plus the merged registers for further
    * levels. Max-merge associativity makes this BIT-IDENTICAL to
    * sketching the raw keys directly — `q_hll_rollup` hash-matches the
    * direct path's oracle. */
  def hllRollup(sketches: DataFrame, rollupCols: Seq[String],
      p: Int = 8, regsCol: String = "hll_regs"): DataFrame = {
    val merged = graft.functions.HllMergeAgg.columnFn(p)(col(regsCol))
    sketches.groupBy(rollupCols.map(col): _*).agg(merged.as("__r"))
      .select(rollupCols.map(col) :+
        round(col("__r.est"), 2).as("est_distinct") :+
        col("__r.harmonicSumScaled").as("harmonic_sum_scaled") :+
        col("__r.zeros").as("zero_registers") :+
        col("__r.regs").as("hll_regs"): _*)
  }
}
