package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the shard-routed LSH dedup
  * ([[graft.dedup.Dedup.minHashLshPairsSharded]]) — the daily-ingest shape:
  * documents arrive in micro-batches, each computes its MinHash signature
  * ROW-LOCALLY (the same `shingle_hashes` → `minhash_from_hashes` kernels
  * and band hashing as the batch path, expression-for-expression), band
  * keys route to `nShards` rendezvous shards
  * ([[graft.operators.Routing.rendezvousAssign]] — identical routing, so a
  * shard's stream can run as its own independent query), and each shard
  * keeps per-bucket member state (`transformWithState` + `MapState`). A
  * new document emits one candidate row against every earlier member of
  * each of its buckets, scored by SIGNATURE AGREEMENT — the standard
  * streaming verify: `est_jaccard = |equal minhash components| / numHashes`
  * is the unbiased MinHash estimate of the true Jaccard, computable from
  * state alone (the earlier document's shingle set is long gone; its
  * 128-long signature is the state the stream keeps).
  *
  * Exactly-once pair emission: a (bucket, id) pair is admitted once — a
  * replayed document re-keyed into a bucket it already occupies emits
  * nothing (spec-asserted), so the UNION of per-batch outputs equals the
  * one-shot batch candidate set regardless of how the stream is split
  * into batches (spec-asserted against the batch front door on the same
  * fixture).
  *
  * Bucket cap: state per bucket is bounded by `maxBucketSize` members; a
  * full bucket admits no further ids (a degenerate-bucket guard — the
  * batch path DROPS buckets that exceed the cap outright, which a stream
  * cannot retroactively do; the two agree whenever no bucket exceeds the
  * cap, the configuration both are meant to run in). State is therefore
  * ≤ `maxBucketSize · numHashes` longs per occupied bucket, and bucket
  * occupancy tracks DISTINCT band keys — corpus-content-sized, the same
  * state a standing batch index would hold.
  *
  * State RETENTION (round 11): [[candidatePairsWithForget]] takes a
  * second streaming input of takedown documents — each forgotten doc's
  * band keys are recomputed with the SAME kernels, routed to the same
  * shards, and the id is REMOVED from every bucket it occupies, so (a)
  * the forgotten document stops generating candidate pairs, (b) a
  * re-submission is admitted and pairs afresh (erasure must not censor
  * future legitimate content — the [[graft.dedup.Dedup
  * .dedupCatalogForget]] semantics), and (c) state shrinks by the id's
  * bucket entries (ack rows carry the per-shard removal count,
  * spec-asserted). Within a micro-batch ALL forgets resolve BEFORE any
  * admission — deterministic whatever the row interleaving. Optional
  * `ttl` ages whole buckets out for retention-policy deployments
  * (TimeMode becomes ProcessingTime); default `None` keeps state
  * permanent. */
object StreamingLshDedup {

  /** One candidate pair: `est_jaccard = same_components / num_hashes`.
    * Forget acks reuse the shape with `idb = -1`, `estJaccard = -1.0` and
    * `sameComponents` = the number of bucket entries removed in the
    * shard. */
  final case class LshCandidate(shard: Long, ida: Long, idb: Long,
      sameComponents: Int, numHashes: Int, estJaccard: Double)

  /** Per-bucket members: parallel id/signature sequences. */
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  private val OpIngest = 0L
  private val OpForget = 1L

  final class LshProcessor(cap: Int, numHashes: Int,
      ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, (Long, String, Long, Seq[Long], Long), LshCandidate] {
    @transient private var buckets: MapState[String, BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buckets = getHandle.getMapState[String, BucketState]("buckets",
        Encoders.STRING, Encoders.product[BucketState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(shard: Long,
        rows: Iterator[(Long, String, Long, Seq[Long], Long)],
        timerValues: TimerValues): Iterator[LshCandidate] = {
      // Buffer the micro-batch per bucket key and admit NEW ids in sorted
      // (min-first) order: when a bucket fills mid-batch, WHICH ids get
      // admitted — and therefore which candidate pairs exist — must be a
      // pure function of (batching, data), never of nondeterministic row
      // arrival order (the CatalogProcessor admission discipline, applied
      // to the cap path; cap-overflow spec-asserted).
      val perBucket = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.TreeMap[Long, Seq[Long]]]
      // forgotten (bucket, id) entries, buffered so removal happens FIRST
      val perBucketForgets = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.TreeSet[Long]]
      rows.foreach { case (_, bk, id, sig, op) =>
        if (op == OpForget)
          perBucketForgets.getOrElseUpdate(bk,
            scala.collection.mutable.TreeSet.empty[Long]) += id
        else
          perBucket.getOrElseUpdate(bk,
            scala.collection.mutable.TreeMap.empty[Long, Seq[Long]])
            .getOrElseUpdate(id, sig)
        ()
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[LshCandidate]
      // forgets first: drop the id from every bucket it occupies; ack one
      // row per forgotten id with the shard's removal count (0 = the id
      // held no state here)
      val removedPerId = scala.collection.mutable.TreeMap.empty[Long, Int]
      perBucketForgets.foreach { case (bk, ids) =>
        ids.foreach { id => removedPerId.getOrElseUpdate(id, 0); () }
        if (buckets.containsKey(bk)) {
          val st = buckets.getValue(bk)
          val keep = st.ids.zip(st.sigs).filterNot { case (i, _) => ids.contains(i) }
          if (keep.length != st.ids.length) {
            st.ids.filter(ids.contains).foreach { i =>
              removedPerId.updateWith(i)(c => Some(c.getOrElse(0) + 1)); ()
            }
            if (keep.isEmpty) buckets.removeKey(bk)
            else buckets.updateValue(bk, BucketState(keep.map(_._1), keep.map(_._2)))
          }
        }
      }
      removedPerId.foreach { case (id, n) =>
        out += LshCandidate(shard, id, -1L, n, numHashes, -1.0)
      }
      perBucket.foreach { case (bk, newbies) =>
        var st = if (buckets.containsKey(bk)) buckets.getValue(bk)
          else BucketState(Seq.empty, Seq.empty)
        var changed = false
        // TreeMap iterates ascending by id — deterministic admission order
        newbies.foreach { case (id, sig) =>
          // admitted once per (bucket, id): replays emit nothing
          if (!st.ids.contains(id) && st.ids.length < cap) {
            st.ids.zip(st.sigs).foreach { case (oid, osig) =>
              val same = osig.iterator.zip(sig.iterator).count { case (a, b) => a == b }
              out += LshCandidate(shard, math.min(id, oid), math.max(id, oid),
                same, numHashes, same.toDouble / numHashes)
            }
            st = BucketState(st.ids :+ id, st.sigs :+ sig)
            changed = true
          }
        }
        if (changed) buckets.updateValue(bk, st)
      }
      out.iterator
    }
  }

  /** Front door: `docs` is a STREAMING frame with `idCol` (long-castable)
    * and `textCol`. Emits candidate pairs in Update mode; filter
    * `estJaccard >= threshold` downstream and `distinct()` the pair key
    * per sink batch (the same pair can surface via different bands).
    * Requires the RocksDB state-store provider. */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      nShards: Int = 16,
      ttl: Option[java.time.Duration] = None
  ): Dataset[LshCandidate] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val banded = bandedSignatures(docs, idCol, textCol, shingleN, numHashes,
      bands, seed, nShards).withColumn("op", lit(OpIngest))
    pairsOf(banded, maxBucketSize, numHashes, ttl)
  }

  /** [[candidatePairs]] plus a takedown stream: `forgets` rows (same
    * schema — the takedown carries the document, whose band keys are
    * recomputed with the same kernels) REMOVE the id from every bucket it
    * occupies. Forgets resolve before admissions within a micro-batch;
    * each acks with `idb = -1`, `estJaccard = -1` and the shard's removal
    * count (see class doc). Filter `estJaccard >= 0` for the pair
    * stream. */
  def candidatePairsWithForget(
      docs: DataFrame,
      forgets: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      nShards: Int = 16,
      ttl: Option[java.time.Duration] = None
  ): Dataset[LshCandidate] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val ingest = bandedSignatures(docs, idCol, textCol, shingleN, numHashes,
      bands, seed, nShards).withColumn("op", lit(OpIngest))
    val forget = bandedSignatures(forgets, idCol, textCol, shingleN, numHashes,
      bands, seed, nShards).withColumn("op", lit(OpForget))
    pairsOf(ingest.unionByName(forget), maxBucketSize, numHashes, ttl)
  }

  private def pairsOf(banded: DataFrame, maxBucketSize: Int, numHashes: Int,
      ttl: Option[java.time.Duration]): Dataset[LshCandidate] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .select(col("shard"), col("__bk"), col("id"), col("sig"), col("op"))
      .as[(Long, String, Long, Seq[Long], Long)]
      .groupByKey(_._1)
      .transformWithState(new LshProcessor(maxBucketSize, numHashes, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** The shared (batch/stream) row-local front half: id, full signature,
    * exploded band keys, rendezvous shard — expression-for-expression the
    * [[graft.dedup.Dedup.minHashLshPairsSharded]] banding, minus the
    * corpus repartition (a stream is already partitioned by arrival).
    * Public so the batch-replay equality spec can collect the IDENTICAL
    * banded table the processor consumes. */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int, seed: Long,
      nShards: Int): DataFrame = {
    val r = numHashes / bands
    val base = docs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.shingle_hashes(
          graft.text.TextAnalysis.tokens(col(textCol)), shingleN, seed).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), graft.functions.minhash_from_hashes(col("sh"), numHashes).as("sig"))
    val banded = base
      .select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bucket")))
      .withColumn("__bk",
        concat(col("band").cast("string"), lit(":"), col("bucket").cast("string")))
    graft.operators.Routing.rendezvousAssign(banded, "__bk", nShards)
  }
}
