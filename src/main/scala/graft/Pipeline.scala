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

  def curate(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8
  ): DataFrame = {
    // 1. quality gate
    val q = docs.filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    // 2. exact dedup (keep-min-id)
    val keepIds = q
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = q.join(keepIds, Seq(idCol), "left_semi")
    // 3. decontamination against the eval set
    def grams(df: DataFrame) = explode(array_distinct(
      TextAnalysis.wordNgrams(col(textCol), contaminationNgram))).as("g")
    val evalGrams = evalDocs.select(grams(evalDocs)).distinct()
    val contaminated = deduped.select(col(idCol), grams(deduped))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    // 4. deterministic split labels
    Splits.assignSplit(clean, idCol)
  }
}
