package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the benchmark tables (TESTDATA.md layout): one parquet
  * per table under a scale-factor directory.
  *
  * Centralizes the two real-world source gotchas:
  *  - `events.ts` has shipped as BOTH INT64 TIMESTAMP(NANOS) (early fixture
  *    vintages; Spark 4 refuses it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, set by [[withGraftConf]],
  *    after which it surfaces as bigint nanos) and TIMESTAMP(MICROS)
  *    (current vintage; surfaces as TIMESTAMP_NTZ). The library's contract
  *    is BIGINT EPOCH NANOS — [[load]] normalizes whichever vintage is on
  *    disk to that, so every downstream operator and every DuckDB oracle
  *    (which reads the same instants via `epoch_ns(ts)`) sees identical
  *    values. The NTZ wall time is interpreted in UTC (the session timezone
  *    [[withGraftConf]] pins), matching DuckDB's timezone-naive read.
  *  - a single compacted parquet file reads as ONE partition; CPU-heavy
  *    consumers should repartition (the dedup/similarity operators do this
  *    themselves).
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTsNanos(df) else df
  }

  /** `ts` → bigint epoch nanos regardless of the on-disk vintage. */
  private def normalizeTsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // nanosAsLong vintage: already bigint nanos
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Derived `partsupp` — the one TPC-H table the fixtures do not ship
    * (re-raised to the driver rounds 3-5; unblocked here by derivation).
    * Deterministically reconstructed from `part` × `supplier` with pure
    * integer arithmetic, mirrored VERBATIM by the DuckDB oracle CTE
    * ([[graft.SparkEntry.psCte]]) so both engines materialize the identical
    * relation from the same parquet inputs. Each part gets 4 suppliers:
    *
    *   ps_suppkey = (p_partkey*4 + i + p_partkey div S) % S,  i ∈ 0..3
    *
    * — always 4 DISTINCT keys for S ≥ 4 (consecutive after rotation),
    * echoing dbgen's part→supplier spread without its small-S distinctness
    * edge cases (dbgen's stride form degenerates when 2·stride ≡ 0 mod S).
    * `ps_availqty` / `ps_supplycost` are integer hashes of the key pair;
    * the cost's one double division of an exact integer is IEEE-identical
    * across engines. Scale shape: |part| × 4 rows, narrow — the dimension
    * side of every consuming join; the supplier-count side is a one-row
    * broadcast. */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, explode, expr, sequence}
    val p = load(spark, dir, "part").select("p_partkey")
    val sCnt = broadcast(load(spark, dir, "supplier").agg(count(lit(1)).as("s_cnt")))
    p.crossJoin(sCnt)
      .select(col("p_partkey"), explode(sequence(lit(0L), lit(3L))).as("i"), col("s_cnt"))
      .select(col("p_partkey").as("ps_partkey"),
        expr("(p_partkey * 4 + i + p_partkey div s_cnt) % s_cnt").as("ps_suppkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        ((col("ps_partkey") * 7 + col("ps_suppkey") * 3) % 9999 + 1).as("ps_availqty"),
        (((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 20000) / lit(100.0) + 1.0)
          .as("ps_supplycost"))
  }

  /** Events with an optional decoded `ts_ts` timestamp column next to the
    * raw bigint nanos `ts`. */
  def events(spark: SparkSession, dir: String, decodeTs: Boolean = false): DataFrame = {
    val df = load(spark, dir, "events")
    if (decodeTs) df.withColumn("ts_ts", graft.streaming.StreamingDQ.nanosToTs(col("ts")))
    else df
  }

  /** Session configs this library's sources need; apply on the builder. */
  def withGraftConf(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
}
