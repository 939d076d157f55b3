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
  * State RETENTION (round 11 — a standing 100 TB ingest must honor
  * erasure without a restart):
  *  - FORGET ([[catalogFlagsWithForget]]): a second streaming input of
  *    takedown documents routes to the same shards; a forget row REMOVES
  *    its fingerprint's entry, so the content re-admits as novel on its
  *    next arrival — the streaming twin of [[graft.dedup.Dedup
  *    .dedupCatalogForget]]. Within a micro-batch ALL forgets resolve
  *    BEFORE any ingest (deterministic whatever the row interleaving):
  *    a same-batch (forget F, ingest F) pair always re-admits. Each
  *    forget acks with `isDup = -1` and `firstId` = the removed entry's
  *    first id (`-1` when nothing was cataloged) — the audit trail that
  *    state actually shrank (spec-asserted, with re-admission).
  *  - TTL (`ttl` param): optional RocksDB-native eviction for
  *    retention-policy deployments — entries older than the duration
  *    vanish without a takedown row (TimeMode becomes ProcessingTime).
  *    Default `None` keeps the catalog permanent.
  *
  * State size: one entry per DISTINCT un-forgotten fingerprint — the
  * bounded-size catalog invariant, now held as keyed stream state;
  * `n_seen` accumulates so the state doubles as the frequency side of the
  * batch catalog. */
object StreamingDedupCatalog {

  final case class CatalogFlag(docId: Long, fingerprint: String, isDup: Int,
      firstId: Long)

  /** Per-fingerprint state: first admitted id + total occurrences seen. */
  final case class CatEntry(firstId: Long, nSeen: Long)

  private val OpIngest = 0L
  private val OpForget = 1L

  final class CatalogProcessor(ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, (Long, String, Long, Long), CatalogFlag] {
    @transient private var entries: MapState[String, CatEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getMapState[String, CatEntry]("catalog",
        Encoders.STRING, Encoders.product[CatEntry],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(shard: Long,
        rows: Iterator[(Long, String, Long, Long)],
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
      val forgets = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, fp, id, op) =>
        if (op == OpForget) { forgets.getOrElseUpdate(fp, id); () }
        else {
          flat += ((fp, id))
          stats.updateWith(fp) {
            case Some((mn, c)) => Some((math.min(mn, id), c + 1))
            case None => Some((id, 1L))
          }
          ()
        }
      }
      // forgets FIRST (deterministic vs arbitrary interleaving): remove the
      // entry and ack with the removed first id (-1 = nothing cataloged)
      val acks = forgets.iterator.map { case (fp, reqId) =>
        val removed =
          if (entries.containsKey(fp)) {
            val f = entries.getValue(fp).firstId
            entries.removeKey(fp)
            f
          } else -1L
        CatalogFlag(reqId, fp, -1, removed)
      }.toSeq
      // resolve first-id per fingerprint (existing catalog entry wins) and
      // update state EAGERLY — the returned iterator is pure after this
      val first = stats.map { case (fp, (batchMin, cnt)) =>
        val existing = if (entries.containsKey(fp)) Some(entries.getValue(fp)) else None
        val f = existing.map(_.firstId).getOrElse(batchMin)
        val dupAll = existing.isDefined // cataloged before this batch
        entries.updateValue(fp, CatEntry(f, existing.map(_.nSeen).getOrElse(0L) + cnt))
        fp -> ((f, dupAll))
      }
      acks.iterator ++ flat.iterator.map { case (fp, id) =>
        val (f, dupAll) = first(fp)
        CatalogFlag(id, fp, if (dupAll || id != f) 1 else 0, f)
      }
    }
  }

  /** Front door: `docs` is a STREAMING frame with `idCol` (long-castable)
    * and `textCol`. Update mode; requires the RocksDB state-store
    * provider. Keep `isDup = 0` rows to append to the corpus. Pass `ttl`
    * to age entries out (retention policy); pair with
    * [[catalogFlagsWithForget]] when erasure must be request-driven. */
  def catalogFlags(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 16, ttl: Option[java.time.Duration] = None): Dataset[CatalogFlag] =
    flagsOf(routedOps(docs, idCol, textCol, nShards, OpIngest), ttl)

  /** [[catalogFlags]] plus a takedown stream: `forgets` rows (same
    * `idCol`/`textCol` schema — a takedown carries the content to erase;
    * its fingerprint is computed with the same kernel) REMOVE their
    * fingerprint's catalog entry. Forgets resolve before ingests within a
    * micro-batch; each acks with `isDup = -1` (see class doc). */
  def catalogFlagsWithForget(docs: DataFrame, forgets: DataFrame,
      idCol: String, textCol: String, nShards: Int = 16,
      ttl: Option[java.time.Duration] = None): Dataset[CatalogFlag] =
    flagsOf(
      routedOps(docs, idCol, textCol, nShards, OpIngest)
        .unionByName(routedOps(forgets, idCol, textCol, nShards, OpForget)),
      ttl)

  private def routedOps(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, op: Long): DataFrame =
    graft.operators.Routing.rendezvousAssign(
      docs.select(col(idCol).cast("long").as("id"),
        graft.text.TextAnalysis.fingerprint(col(textCol)).as("fingerprint")),
      "fingerprint", nShards)
      .select(col("shard"), col("fingerprint"), col("id"), lit(op).as("op"))

  private def flagsOf(routed: DataFrame,
      ttl: Option[java.time.Duration]): Dataset[CatalogFlag] = {
    val spark = routed.sparkSession
    import spark.implicits._
    routed
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CatalogProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }
}
