package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-deterministic transcendental math for oracle-pinned contracts.
  *
  * `Math.log` (JVM) and libm `ln` (DuckDB) are only guaranteed to within ~1
  * ulp of each other, so a contract that rounds `ln(x)` to a fixed number of
  * decimals can flip on a value that sits at a rounding boundary — the
  * failure mode that broke `q_dsir_weights` at the round-6 driver gate.
  * This object replaces libm with a FIXED expression tree of single IEEE-754
  * operations (integer bit-length range reduction + a 10-term atanh series),
  * evaluated with the identical association in Spark and in generated DuckDB
  * SQL — two engines seeing the same integer input produce bit-identical
  * doubles, so no rounding boundary can disagree.
  *
  * Contract: `lnPosInt(n)` for integer `n ≥ 1` computes
  * `k·LN2 + 2·atanh(z)` where `k = bitLength(n) − 1` (exact integer math),
  * `m = n / 2ᵏ ∈ [1, 2)` (power-of-two scaling — exact in IEEE),
  * `z = (m−1)/(m+1) ∈ [0, 1/3)`, and atanh is the odd series truncated at
  * z¹⁹ (worst-case truncation ≈ 9e-12 — far below any 6-dp contract, and
  * identical in both engines by construction). LN2 is pinned to the double
  * `6931471805599453 / 10¹⁶` (both operands exactly representable, so the
  * IEEE quotient is the same bits everywhere — and equal to
  * `Math.log(2)`'s shortest-round-trip decimal).
  */
object DetMath {

  /** Pinned ln 2: exact-rational division both engines reproduce bit-for-bit
    * (`6931471805599453::DOUBLE / 1e16` in DuckDB). */
  val LN2: Double = 6931471805599453L.toDouble / 1e16

  private val coeffs: Seq[Double] =
    Seq(3, 5, 7, 9, 11, 13, 15, 17, 19).map(k => 1.0 / k)

  /** Deterministic natural log of a positive integer column (LONG-valued).
    * Pure codegen arithmetic — no libm, no UDF. */
  def lnPosInt(n: Column): Column = {
    val k = (length(bin(n.cast("long"))) - lit(1)).cast("int")
    val p2 = call_function("shiftleft", lit(1L), k).cast("double")
    val m = n.cast("double") / p2
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val z2 = z * z
    // t = 1 + z2*(1/3 + z2*(1/5 + ... + z2*(1/19)))
    val t = coeffs.reverse.tail.foldLeft(lit(coeffs.last): Column) {
      (acc, c) => lit(c) + z2 * acc
    }
    k.cast("double") * lit(LN2) + (z * (lit(1.0) + z2 * t)) * lit(2.0)
  }

  /** JVM-scalar twin of [[lnPosInt]] — the IDENTICAL IEEE operation
    * sequence, for driver-side constants (e.g. ln 6 normalizers) that must
    * match the Column/SQL values bit-for-bit. */
  def lnPosIntScalar(n: Long): Double = {
    require(n >= 1, s"lnPosIntScalar domain: n=$n")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << k).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    val t = coeffs.reverse.tail.foldLeft(coeffs.last)((acc, c) => c + z2 * acc)
    k.toDouble * LN2 + (z * (1.0 + z2 * t)) * 2.0
  }

  /** The DuckDB mirror of [[lnPosInt]]: a SELECT producing `(nval, lnv)`
    * for every row of a single-column relation `vals(nval)` of positive
    * integers. Layered subselects pin each intermediate to one column so
    * the expression tree — and therefore every IEEE operation — matches
    * the Spark side exactly. */
  def lnPosIntSqlSelect(valsRelation: String): String = {
    // 1/3 + z2*(1/5 + ... + z2*(1/19)) nested innermost-first, mirroring
    // the Spark-side foldLeft term for term
    val ks = Seq(3, 5, 7, 9, 11, 13, 15, 17, 19)
    val inner = ks.reverse.tail.foldLeft(s"(1::DOUBLE / ${ks.last})") {
      (acc, k) => s"(1::DOUBLE / $k) + z2 * ($acc)"
    }
    s"""SELECT nval,
       |    k::DOUBLE * (6931471805599453::DOUBLE / 1e16)
       |      + (z * (1::DOUBLE + z2 * ($inner))) * 2.0 AS lnv
       |  FROM (SELECT nval, k, z, z * z AS z2
       |    FROM (SELECT nval, k, (m - 1.0) / (m + 1.0) AS z
       |      FROM (SELECT nval, k, nval::DOUBLE / ((1::BIGINT << k))::DOUBLE AS m
       |        FROM (SELECT nval, length(printf('%b', nval)) - 1 AS k
       |          FROM $valsRelation))))""".stripMargin
  }
}
