package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming chunk-level novelty scoring — ingestion-time dedup, the
  * composition the CDC chunker exists for on a stream: each incoming
  * document is cut into content-defined chunks
  * ([[graft.text.TextAnalysis.cdcChunks]]), chunk digests route to
  * hash shards, and each shard keeps a FIXED-SIZE Bloom filter of every
  * chunk digest ever seen (`transformWithState`). Per document and
  * shard the processor reports how many of its chunks were already in
  * the corpus vs new — re-crawled or boilerplate-heavy documents score
  * near-zero novelty BEFORE any expensive downstream processing.
  *
  * Guarantees (spec-asserted): the Bloom filter has NO false negatives,
  * so a replayed document always reports zero new chunks — the dedup
  * direction is exact; false positives only UNDERCOUNT novelty, at the
  * standard `(1 − e^{−kn/m})^k` rate (k=4 probes). State is `m` bits
  * per shard FOREVER — an unbounded stream cannot grow it, which is the
  * property a 100 TB ingest needs (a digest SET grows linearly and
  * eventually dies). Chunk-hash sharding also means shard state never
  * overlaps: per-document partials sum across shards without double
  * counting. */
object StreamingChunkDedup {

  final case class BloomState(n: Long, bits: Array[Long])

  /** Per-(document, shard) partial: sum over shards for the document's
    * full `(n_seen, n_new)` and novelty `n_new / (n_seen + n_new)`. */
  final case class NoveltyPartial(shard: Int, docId: Long, nSeen: Long, nNew: Long)

  /** Fixed-size blocked Bloom filter over 64-bit chunk digests. */
  final class Bloom(val mBits: Int) extends Serializable {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of 2 >= 64")
    private val words = new Array[Long](mBits / 64)
    private var count = 0L

    def n: Long = count
    def toState: BloomState = BloomState(count, words.clone())

    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    private def bitAt(h: Long, i: Int): Int =
      (mix(h + i * 0xc2b2ae3d27d4eb4fL) & (mBits - 1)).toInt

    def mightContain(h: Long): Boolean = {
      var i = 0
      while (i < 4) {
        val b = bitAt(h, i)
        if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
        i += 1
      }
      true
    }

    def add(h: Long): Unit = {
      var i = 0
      while (i < 4) {
        val b = bitAt(h, i)
        words(b >>> 6) |= 1L << (b & 63)
        i += 1
      }
      count += 1
    }
  }

  object Bloom {
    def fromState(mBits: Int, s: BloomState): Bloom = {
      val bl = new Bloom(mBits)
      System.arraycopy(s.bits, 0, bl.words, 0, s.bits.length)
      bl.count = s.n
      bl
    }
  }

  final class NoveltyProcessor(mBits: Int)
      extends StatefulProcessor[Int, (Int, Long, Long), NoveltyPartial] {
    @transient private var state: ValueState[BloomState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BloomState]("bloom",
        Encoders.product[BloomState], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[(Int, Long, Long)],
        timerValues: TimerValues): Iterator[NoveltyPartial] = {
      val bloom = if (state.exists()) Bloom.fromState(mBits, state.get())
        else new Bloom(mBits)
      // insert-as-we-go: a chunk repeated within the batch counts seen
      // from its second occurrence — the dedup semantics
      val perDoc = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
      rows.foreach { case (_, docId, h) =>
        val (s0, n0) = perDoc.getOrElse(docId, (0L, 0L))
        if (bloom.mightContain(h)) perDoc.update(docId, (s0 + 1, n0))
        else { bloom.add(h); perDoc.update(docId, (s0, n0 + 1)) }
      }
      state.update(bloom.toState)
      perDoc.iterator.map { case (docId, (s0, n0)) =>
        NoveltyPartial(shard, docId, s0, n0)
      }
    }
  }

  /** Front door: input frame needs `doc_id` (long) and `text` (string).
    * Emits per-(doc, shard) partials each micro-batch (Update mode);
    * aggregate `sum(nSeen)/sum(nNew)` by `docId` downstream for the
    * document novelty. Requires the RocksDB state-store provider. */
  def noveltyPartials(docs: DataFrame, w: Int = 16, d: Int = 64,
      bloomBits: Int = 1 << 22, nShards: Int = 8): Dataset[NoveltyPartial] = {
    require(nShards >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    graft.text.TextAnalysis.cdcChunks(docs, "doc_id", "text", w, d, emitText = true)
      .select(col("doc_id").cast("long"), xxhash64(col("chunk_text")).as("h"))
      .select(pmod(col("h"), lit(nShards)).cast("int").as("shard"),
        col("doc_id"), col("h"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new NoveltyProcessor(bloomBits),
        TimeMode.None(), OutputMode.Update())
  }
}
