package graft.core

/** String-valued enums mirroring the reference's `core/_enums.py`.
  *
  * Reference: `/root/reference/src/pyspark_data_quality/core/_enums.py:5-29`.
  * The `.value` string is what lands in the metric row (see
  * `completeness_col_ratio_check.py:131-132`), so the values here must match
  * byte-for-byte.
  */
sealed abstract class SeverityLevel(val value: String)
object SeverityLevel {
  case object Low extends SeverityLevel("low")
  case object Medium extends SeverityLevel("medium")
  case object High extends SeverityLevel("high")
  case object Critical extends SeverityLevel("critical")
  val all: Seq[SeverityLevel] = Seq(Low, Medium, High, Critical)
  def fromString(s: String): SeverityLevel =
    all.find(_.value == s).getOrElse(throw new IllegalArgumentException(s"unknown severity: $s"))
}

/** Data-quality dimension (`core/_enums.py:11-17`). */
sealed abstract class Dimension(val value: String)
object Dimension {
  case object Freshness extends Dimension("freshness")
  case object Completeness extends Dimension("completeness")
  case object Accuracy extends Dimension("accuracy")
  case object Consistency extends Dimension("consistency")
  case object Uniqueness extends Dimension("uniqueness")
  case object Validity extends Dimension("validity")
  val all: Seq[Dimension] =
    Seq(Freshness, Completeness, Accuracy, Consistency, Uniqueness, Validity)
}

/** Freshness period (`core/_enums.py:19-25`; unused in the reference — the
  * promised freshness rule was never written. We implement it: see
  * [[graft.checks.FreshnessCheck]]).
  */
sealed abstract class FreshnessPeriod(val value: String, val seconds: Long)
object FreshnessPeriod {
  case object Year extends FreshnessPeriod("year", 365L * 24 * 3600)
  case object Month extends FreshnessPeriod("month", 30L * 24 * 3600)
  case object Week extends FreshnessPeriod("week", 7L * 24 * 3600)
  case object Day extends FreshnessPeriod("day", 24L * 3600)
  case object Hour extends FreshnessPeriod("hour", 3600L)
  case object Minute extends FreshnessPeriod("minute", 60L)
}

/** Check status (`core/_enums.py:27-29`). Never reaches the metric schema —
  * only selects the success/failure message text.
  */
sealed abstract class CheckStatus(val value: String)
object CheckStatus {
  case object Success extends CheckStatus("success")
  case object Failure extends CheckStatus("failure")
}
