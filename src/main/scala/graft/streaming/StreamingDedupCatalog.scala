package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the standing dedup catalog
  * ([[graft.dedup.Dedup.dedupCatalogOfBatch]] family) — exact-fingerprint
  * ingestion dedup as a STREAM: each micro-batch's documents fingerprint
  * row-locally, fingerprints route to `nShards` rendezvous shards (the
  * SAME `Routing.rendezvousAssign` route as [[graft.Pipeline
  * .curateSharded]], so one shard's stream can run as its own query), and
  * each shard keeps the catalog entries for its fingerprints in `MapState`.
  *
  * Per document the processor emits `(docId, fingerprint, isDup, firstId)`
  * — `isDup = 1` iff the fingerprint was already cataloged by ANY earlier
  * micro-batch or by the admitted first occurrence within this batch.
  * In-batch admission is DETERMINISTIC regardless of row order: all of a
  * batch's rows for a novel fingerprint are buffered and the MINIMUM id is
  * admitted (exactly `dedupCatalogOfBatch`'s `first_id = min(id)`), so the
  * stream's output is a pure function of (batching, data) — the same
  * contract the batch fold `C_k = merge(C_{k-1}, ofBatch(b_k, k))` +
  * `dedupCatalogFlag(C_{k-1}, b_k)` computes, spec-asserted
  * (`StreamingDedupCatalogSpec`). Replayed batches flag fully as dups and
  * grow no state.
  *
  * State size: one entry per DISTINCT fingerprint — the bounded-size
  * catalog invariant, now held as keyed stream state; `n_seen` accumulates
  * so the state doubles as the frequency side of the batch catalog. */
object StreamingDedupCatalog {

  final case class CatalogFlag(docId: Long, fingerprint: String, isDup: Int,
      firstId: Long)

  /** Per-fingerprint state: first admitted id + total occurrences seen. */
  final case class CatEntry(firstId: Long, nSeen: Long)

  final class CatalogProcessor
      extends StatefulProcessor[Long, (Long, String, Long), CatalogFlag] {
    @transient private var entries: MapState[String, CatEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getMapState[String, CatEntry]("catalog",
        Encoders.STRING, Encoders.product[CatEntry], TTLConfig.NONE)

    override def handleInputRows(shard: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[CatalogFlag] = {
      // buffer the batch per fingerprint: admission must be order-free
      val perFp = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
      rows.foreach { case (_, fp, id) =>
        perFp.getOrElseUpdate(fp, scala.collection.mutable.ArrayBuffer.empty) += id
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[CatalogFlag]
      perFp.foreach { case (fp, ids) =>
        val existing = if (entries.containsKey(fp)) Some(entries.getValue(fp)) else None
        val first = existing match {
          case Some(e) => e.firstId
          case None => ids.min // deterministic in-batch admission
        }
        ids.foreach { id =>
          val dup = existing.isDefined || id != first
          out += CatalogFlag(id, fp, if (dup) 1 else 0, first)
        }
        entries.updateValue(fp,
          CatEntry(first, existing.map(_.nSeen).getOrElse(0L) + ids.length))
      }
      out.iterator
    }
  }

  /** Front door: `docs` is a STREAMING frame with `idCol` (long-castable)
    * and `textCol`. Update mode; requires the RocksDB state-store
    * provider. Keep `isDup = 0` rows to append to the corpus. */
  def catalogFlags(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 16): Dataset[CatalogFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val routed = graft.operators.Routing.rendezvousAssign(
      docs.select(col(idCol).cast("long").as("id"),
        graft.text.TextAnalysis.fingerprint(col(textCol)).as("fingerprint")),
      "fingerprint", nShards)
    routed
      .select(col("shard"), col("fingerprint"), col("id"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new CatalogProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
