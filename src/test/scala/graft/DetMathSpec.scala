package graft

import org.apache.spark.sql.functions._

/** Contract tests for the engine-deterministic series ln. The cross-engine
  * bit-identity claim (Spark vs DuckDB over n = 1..200 000, zero mismatching
  * bit patterns) was established with the generated-SQL mirror at build time
  * and is re-checked continuously by the q_dsir_weights oracle gate; these
  * specs pin the Spark-side semantics. */
class DetMathSpec extends SparkSpec {

  test("lnPosInt tracks Math.log within 2e-11 over 1..100000") {
    val rows = spark.range(1, 100001).toDF("n")
      .select(col("n"), graft.functions.DetMath.lnPosInt(col("n")).as("lnv"))
      .collect()
    rows.foreach { r =>
      val n = r.getLong(0); val v = r.getDouble(1)
      assert(math.abs(v - math.log(n.toDouble)) < 2e-11, s"n=$n")
    }
  }

  test("lnPosInt exact at powers of two (pure k*LN2, z = 0)") {
    val rows = spark.range(0, 40).toDF("k")
      .select(col("k"),
        graft.functions.DetMath.lnPosInt(shiftleft(lit(1L), 0) * pow(lit(2.0), col("k")).cast("long")).as("lnv"))
      .collect()
    rows.foreach { r =>
      val k = r.getLong(0); val v = r.getDouble(1)
      assert(v === k * graft.functions.DetMath.LN2, s"k=$k")
    }
  }

  test("LN2 constant equals Math.log(2) bit-for-bit") {
    assert(java.lang.Double.doubleToLongBits(graft.functions.DetMath.LN2) ===
      java.lang.Double.doubleToLongBits(math.log(2.0)))
  }

  test("generated DuckDB mirror text is structurally pinned") {
    val sql = graft.functions.DetMath.lnPosIntSqlSelect("vals")
    // the constants that MUST appear verbatim for cross-engine bit-identity
    assert(sql.contains("6931471805599453::DOUBLE / 1e16"))
    assert(sql.contains("printf('%b', nval)"))
    assert(sql.contains("(1::BIGINT << k))::DOUBLE"))
    Seq(3, 5, 7, 9, 11, 13, 15, 17, 19).foreach(k =>
      assert(sql.contains(s"(1::DOUBLE / $k)"), s"coefficient 1/$k"))
  }
}
