package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting — the last step of a
  * training-data pipeline. The split is a pure function of the row id
  * (md5 of its string form compared against lexicographic hex
  * thresholds), so it is:
  *  - stable across runs, partitionings, and cluster sizes (no rand());
  *  - reproducible by ANY engine that has md5 (the DuckDB oracle mirrors
  *    it exactly — no engine-specific hash);
  *  - uniform, since md5 hex prefixes are uniform over [0, 16^k).
  *
  * `fractions` are cumulative 2-hex-digit thresholds out of 256: e.g.
  * (204, 230) → md5 < "cc" ⇒ train (~79.7%), < "e6" ⇒ val (~10.2%),
  * else test (~10.1%).
  */
object Splits {

  private def hex2(n: Int): String = f"$n%02x"

  /** Split label column derived from the id. */
  def splitCol(id: Column, trainUpper: Int = 204, valUpper: Int = 230): Column = {
    require(0 < trainUpper && trainUpper < valUpper && valUpper < 256,
      "thresholds must satisfy 0 < trainUpper < valUpper < 256 (test = remainder)")
    val h = md5(id.cast("string"))
    when(h < hex2(trainUpper), "train")
      .when(h < hex2(valUpper), "val")
      .otherwise("test")
  }

  /** Attach a `split` column. */
  def assignSplit(df: DataFrame, idCol: String,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame =
    df.withColumn("split", splitCol(col(idCol), trainUpper, valUpper))
}
