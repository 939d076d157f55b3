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
      // Order-free admission needs each fingerprint's batch-MIN id, which is
      // only known after the full pass — so one buffered pass is inherent.
      // Memory discipline: ONE flat (fp, id) buffer (O(shard's slice of the
      // micro-batch) — the executor-memory bound; size micro-batches
      // accordingly) plus a per-DISTINCT-fingerprint (min, count) map; flags
      // then stream lazily off the flat buffer instead of materializing a
      // second batch-sized output list.
      val flat = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val stats = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      rows.foreach { case (_, fp, id) =>
        flat += ((fp, id))
        stats.updateWith(fp) {
          case Some((mn, c)) => Some((math.min(mn, id), c + 1))
          case None => Some((id, 1L))
        }
        ()
      }
      // resolve first-id per fingerprint (existing catalog entry wins) and
      // update state EAGERLY — the returned iterator is pure after this
      val first = stats.map { case (fp, (batchMin, cnt)) =>
        val existing = if (entries.containsKey(fp)) Some(entries.getValue(fp)) else None
        val f = existing.map(_.firstId).getOrElse(batchMin)
        val dupAll = existing.isDefined // cataloged before this batch
        entries.updateValue(fp, CatEntry(f, existing.map(_.nSeen).getOrElse(0L) + cnt))
        fp -> ((f, dupAll))
      }
      flat.iterator.map { case (fp, id) =>
        val (f, dupAll) = first(fp)
        CatalogFlag(id, fp, if (dupAll || id != f) 1 else 0, f)
      }
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
