package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-routing primitives for sharded pipelines.
  *
  * Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar 1998,
  * the scheme behind cache/shard routing in Memcached/Ceph-style systems —
  * assigns each key to the shard whose `hash(key, shard)` is largest.
  * Unlike `key mod n`, adding or removing one shard moves only ~1/n of the
  * keys (the minimal-disruption property), which is what a 100 TB corpus
  * wants when its shard map changes mid-life.
  *
  * The weight is the first 15 hex digits of `md5(key ":" shard)` read as
  * an integer — the repo's standard engine-reproducible hash (any engine
  * with md5 derives the identical routing; no JVM-private hash seeds), and
  * the whole assignment is one row-local codegen'd expression: no shuffle,
  * no UDF, no per-shard join. O(rows · nShards) work, embarrassingly
  * parallel — the shape that survives any scale.
  */
object Routing {

  /** The HRW weight of `(key, shard)`: first 15 md5 hex digits as a long
    * (uniform over [0, 16¹⁵); collisions across 8–1024 shards of one key
    * are cryptographically negligible, and the tie-break below is pinned
    * anyway). */
  private def weight(key: Column, shard: Column): Column =
    conv(substring(md5(concat(key, lit(":"), shard.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Append a `shard` column: the rendezvous winner among `nShards`
    * shards for `idCol`'s string form. Ties (practically impossible)
    * break toward the SMALLEST shard id, pinned via struct max over
    * `(weight, −shard)`. */
  def rendezvousAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 1024, s"nShards=$nShards")
    val cands = transform(sequence(lit(0), lit(nShards - 1)),
      k => struct(weight(col(idCol).cast("string"), k).as("w"),
        (-k).cast("int").as("negk")))
    df.withColumn("shard",
      (-array_max(cands).getField("negk")).cast("long"))
  }

  /** Size-targeted output-file planning (small-file compaction): route
    * rows to shards by rendezvous hash, then cut each shard's id-ordered
    * byte stream into files of ~`targetBytes`:
    * `file_idx = floor((cum_bytes − bytes) / targetBytes)` — the
    * cursor-at-file-start rule, so every file except a shard's last holds
    * ≥ targetBytes − max_row and < targetBytes + max_row bytes. This is
    * the planner a 100 TB writer runs BEFORE the shuffle: the plan frame
    * (one row per output file) sizes `repartitionByRange` and names the
    * files, and is a pure function of the data — no sampling, no
    * clock.
    *
    * Per-shard running totals use a partitioned window (shards bound the
    * partition width by construction — `nShards` keys, each ~1/n of the
    * corpus; the window sorts WITHIN a shard, which is exactly the
    * id-ordered layout the writer wants anyway). Returns one row per
    * planned file: `(shard, file_idx, n_rows, file_bytes)`. */
  def compactionPlan(df: DataFrame, idCol: String, bytesCol: Column,
      nShards: Int, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes")
    val assigned = rendezvousAssign(df, idCol, nShards)
      .select(col("shard"), col(idCol).as("__id"), bytesCol.cast("long").as("__b"))
      .filter(col("__b") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("__id")
    assigned
      .withColumn("__cum", sum("__b").over(w))
      // integer `div`, not `/` (double division loses exactness past 2^53)
      .withColumn("file_idx", expr(s"(__cum - __b) div ${targetBytes}L"))
      .groupBy("shard", "file_idx")
      .agg(count(lit(1)).as("n_rows"), sum("__b").as("file_bytes"))
  }

  /** Shard-balance audit for a rendezvous assignment: per-shard row and
    * byte totals plus `load_ratio` = share of rows relative to perfect
    * balance (1.0 = exactly even). One keyed aggregation + a one-row
    * broadcast total — the operator a routing change is judged by before
    * any data moves. */
  def shardBalanceReport(df: DataFrame, idCol: String, bytesCol: Column,
      nShards: Int): DataFrame = {
    val assigned = rendezvousAssign(df, idCol, nShards)
    val per = assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(bytesCol.cast("long")).as("total_bytes"))
    val tot = per.agg(sum("n_docs").as("__tot"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("total_bytes"),
        (col("n_docs").cast("double") * nShards / col("__tot")).as("load_ratio"))
  }
}
