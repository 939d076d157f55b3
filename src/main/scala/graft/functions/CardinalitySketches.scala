package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** md5-derived 60-bit hash shared by the sketch aggregators below and
  * their DuckDB oracle twins.
  *
  * `hash60(s)` = the first 15 hex digits of `md5(utf8(s))` read as an
  * integer — exactly `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB
  * and `conv(substr(md5(s), 1, 15), 16, 10)` in Spark SQL. 60 bits keeps
  * the value strictly inside a signed 64-bit long (no UBIGINT needed on
  * either engine) while staying uniform, which is what makes every
  * sketch in this file *bit-reproducible by any SQL engine with an md5
  * builtin* — the same graduation trick the simhash/winnowing oracles
  * use (see `q_dedup_simhash`).
  */
object Md5Hash60 {
  val Range: Double = 1.152921504606846976e18 // 2^60 (exact in a double)

  def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 bytes big-endian = first 16 hex digits; >>> 4 drops the
    // 16th digit, leaving the first 15 (a non-negative 60-bit value)
    val x = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    x >>> 4
  }
}

/** Count-Min sketch (Cormode/Muthukrishnan, J.Algorithms 2005) as a
  * partial-mergeable typed `Aggregator`.
  *
  * State is a fixed `depth × width` long matrix (flattened row-major), so
  * aggregation is ONE streaming pass with map-side partials of constant
  * size — at 100 TB the only shuffled bytes are `depth·width·8` per
  * partition, never the keys. Merge is element-wise addition:
  * commutative, associative, deterministic ⇒ `merge(shard sketches) ≡
  * single-pass sketch` EXACTLY, bit-stable under any partitioning.
  *
  * With `md5Hash = true` (default, the ORACLE path) row j hashes with
  * `Md5Hash60.hash60(j + ":" + key) % width`, so a SQL oracle can
  * rebuild the identical matrix (group keys by `(j, bucket)`) and the
  * identical point estimates (`min_j counts[j][h_j(key)]`) — every
  * estimate satisfies `est >= true count` with equality unless the key
  * collides in all `depth` rows. `md5Hash = false` is the SCALE path:
  * XXH64 seeded by the row index (~5-10× cheaper per token — this
  * sketch hashes every token `depth` times, so the hash IS the hot
  * loop at 100 TB), same guarantees, spec-verified instead of
  * oracle-verified (same split as simhash's `md5TokenHash` dial).
  *
  * Input is one token ARRAY per row (e.g. a document's token list) so
  * the sketch consumes documents without a pre-explode shuffle; null
  * arrays and null elements are ignored.
  */
class CountMinSketchAgg(depth: Int, width: Int, md5Hash: Boolean = true)
    extends Aggregator[Option[Seq[String]], Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 1)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], in: Option[Seq[String]]): Array[Long] = {
    in match {
      case Some(toks) if toks != null =>
        toks.foreach { tok =>
          if (tok != null) CmsAlgebra.update(b, tok, depth, width, md5Hash)
        }
      case _ =>
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CmsAlgebra.mergeInto(a, b)

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object CountMinSketchAgg {
  /** `cms(tokenArrayCol)` → `array<long>` of `depth*width` counters. */
  def columnFn(depth: Int, width: Int, md5Hash: Boolean = true)(toks: Column): Column = {
    implicit val inEnc: Encoder[Option[Seq[String]]] =
      ExpressionEncoder[Option[Seq[String]]]()
    udaf(new CountMinSketchAgg(depth, width, md5Hash)).apply(toks)
  }
}

/** The counter algebra shared by [[CountMinSketchAgg]] and the streaming
  * processor ([[graft.streaming.StreamingHeavyHitters.runningCmsRegisters]]).
  * CMS is LINEAR — counters add — so shard sketches built from any
  * partition of the stream sum to exactly the single-pass batch sketch:
  * batch and streaming registers over the same tokens are BIT-IDENTICAL
  * under any sharding and any micro-batch split (spec-asserted). */
object CmsAlgebra {
  /** Row-`j` bucket of `tok`. md5 path = the oracle-reproducible
    * `hash60("j:tok") % width`; scale path = EXACTLY what the Column
    * expression `xxhash64(lit(j.toLong), key)` computes (seed 42, then the
    * long row index, then the key bytes), so JVM-built counters and
    * Column-space estimate lookups always agree — CmsSpec's est>=cnt
    * assertion would catch any divergence as an underestimate. */
  def bucket(j: Int, tok: String, width: Int, md5Hash: Boolean): Int =
    if (md5Hash) (Md5Hash60.hash60(s"$j:$tok") % width).toInt
    else {
      import org.apache.spark.sql.catalyst.expressions.XXH64.{hashLong, hashUnsafeBytes}
      val seedJ = hashLong(j.toLong, 42L)
      val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, seedJ)
      java.lang.Math.floorMod(h, width.toLong).toInt
    }

  /** mutates `regs` (length `depth*width`) in place with one observed token */
  def update(regs: Array[Long], tok: String, depth: Int, width: Int,
      md5Hash: Boolean): Unit = {
    var j = 0
    while (j < depth) {
      regs(j * width + bucket(j, tok, width, md5Hash)) += 1L
      j += 1
    }
  }

  /** element-wise sum into `a` (commutative, associative — CMS linearity);
    * width mismatch fails fast, same contract as [[HllAlgebra.mergeInto]] */
  def mergeInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"CMS register size mismatch: ${a.length} vs ${b.length} (different depth*width)")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** point estimate: min over the depth rows (the CM upper bound) */
  def estimate(regs: Array[Long], tok: String, depth: Int, width: Int,
      md5Hash: Boolean): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = regs(j * width + bucket(j, tok, width, md5Hash))
      if (c < best) best = c
      j += 1
    }
    best
  }
}

/** KMV (k minimum values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM 2002; Beyer et al., SIGMOD 2007) as a typed `Aggregator`.
  *
  * State is the sorted array of the k smallest DISTINCT `hash60` values
  * seen — bounded at `k` longs regardless of input size. Merge is
  * sorted-merge + dedup + truncate-to-k: commutative, associative,
  * deterministic (hash values are totally ordered, no ties to break), so
  * shard merge order never changes the sketch.
  *
  * `finish` returns the sketch itself (not just the estimate) because
  * KMV composes: the union sketch of two groups is `k`-truncated merged
  * sketches, which gives set-overlap estimates (Jaccard via the
  * intersection rate inside the union sketch) with plain array algebra —
  * see [[graft.operators.Sketches.kmvOverlap]]. The estimate off a
  * sketch `h(1..k)`: exact `|sketch|` when `|sketch| < k` (every
  * distinct value is present), else `(k-1) · 2^60 / h(k)` — all integer
  * inputs, one exactly-rounded double division, reproducible in SQL.
  */
class KmvSketchAgg(k: Int)
    extends Aggregator[Option[String], Array[Long], Array[Long]] {
  require(k >= 2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], in: Option[String]): Array[Long] = in match {
    case Some(s) if s != null =>
      val h = Md5Hash60.hash60(s)
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // already present
      else {
        val ins = -pos - 1
        if (b.length >= k && ins >= k) b // larger than current kth min
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    case _ => b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last) { out(n) = v; n += 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvSketchAgg {
  /** `kmv(keyCol)` → `array<long>`: the k smallest distinct hash60 values. */
  def columnFn(k: Int)(key: Column): Column = {
    implicit val inEnc: Encoder[Option[String]] = ExpressionEncoder[Option[String]]()
    udaf(new KmvSketchAgg(k)).apply(key)
  }
}

/** HyperLogLog (Flajolet et al., AofA 2007) as a typed `Aggregator`,
  * built for BIT-REPRODUCIBILITY by a SQL oracle rather than raw speed
  * (Spark's own `approx_count_distinct` HLL++ hashes with xxhash64
  * internals no other engine reproduces; this one a DuckDB query can).
  *
  * m = 2^p byte registers; for each key, `h = hash60(key)`; register
  * index = `h % m` (low bits), and the rank is counted on the remaining
  * `60-p` high bits `w = h >> p`: `rho = (60-p) - bitlen(w) + 1` (the
  * 1-based position of the leftmost 1 in a `60-p`-bit window, `61-p`
  * when `w = 0`), `bitlen(w) = length(bin(w))` on both engines. Merge is
  * element-wise register MAX — commutative, associative, idempotent ⇒
  * deterministic under any shard order AND under input duplication
  * (re-processing a key is a no-op, which is also why the estimate needs
  * no distinct pre-pass).
  *
  * `finish` keeps the float algebra exactly-reproducible: the harmonic
  * sum `S = Σ_j 2^(53 - M_j)` is computed in LONG arithmetic (M_j ≤ 53,
  * 2^p · 2^53 ≤ 2^61 < 2^63: exact), so the only float ops are one cast
  * and one division — identical in IEEE754 on any engine. Output is
  * `(S, zeros)` plus the standard estimate with small-range correction
  * (`m·ln(m/zeros)` when `E ≤ 2.5m` and zeros exist); callers round the
  * estimate (2dp) to absorb libm-vs-JVM last-ulp differences in `ln`.
  */
final case class HllEstimate(est: Double, harmonicSumScaled: Long, zeros: Int)

/** The register algebra shared by the batch Aggregator and the streaming
  * processor ([[graft.streaming.StreamingDistinct]]) — max-merge means
  * batch and streaming sketches over the same keys are BIT-IDENTICAL
  * under any sharding and any micro-batch split. */
object HllAlgebra {
  /** mutates `regs` in place with one observed key */
  def update(regs: Array[Byte], key: String, p: Int): Unit = {
    val m = 1 << p
    val h = Md5Hash60.hash60(key)
    val idx = (h % m).toInt
    val w = h >>> p
    val bits = 60 - p
    val rho = if (w == 0L) bits + 1 else bits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  /** element-wise max into `a` (commutative, associative, idempotent).
    * Register arrays built with different `p` have different widths, and a
    * silent partial merge would yield a wrong estimate with no error — so
    * width mismatch fails fast here, covering every caller (the streaming
    * processors and direct users, not just the Aggregator's own guard). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"HLL register width mismatch: ${a.length} vs ${b.length} (different p)")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def estimate(regs: Array[Byte], p: Int): HllEstimate = {
    val m = 1 << p
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      s += 1L << (53 - regs(i)) // M_j in [0, 53] given p >= 8
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m * 9007199254740992.0 / s.toDouble // 2^53 exact
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    HllEstimate(est, s, zeros) // caller rounds; see class scaladoc
  }
}

/** Rollup output: the merged registers (for further levels) plus the
  * estimate read off them. */
final case class HllRolled(est: Double, harmonicSumScaled: Long, zeros: Int,
    regs: Array[Byte])

/** Second-level HLL aggregation: merges ALREADY-BUILT register arrays
  * (element-wise max). This is the re-aggregation half of the sketch
  * lifecycle at scale — persist per-(group, day) registers as a binary
  * column, then roll up months/segments later WITHOUT reprocessing raw
  * keys. Because max-merge is associative, rollup-of-dailies is
  * BIT-IDENTICAL to a direct sketch over the raw keys (`q_hll_rollup`
  * hash-matches the same oracle as the direct path). */
class HllMergeAgg(p: Int)
    extends Aggregator[Option[Array[Byte]], Array[Byte], HllRolled] {
  require(p >= 8 && p <= 16)

  override def zero: Array[Byte] = new Array[Byte](1 << p)

  override def reduce(b: Array[Byte], in: Option[Array[Byte]]): Array[Byte] = in match {
    case Some(regs) if regs != null =>
      require(regs.length == b.length, s"register width mismatch: ${regs.length}")
      HllAlgebra.mergeInto(b, regs)
    case _ => b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAlgebra.mergeInto(a, b)

  override def finish(b: Array[Byte]): HllRolled = {
    val e = HllAlgebra.estimate(b, p)
    HllRolled(e.est, e.harmonicSumScaled, e.zeros, b)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[HllRolled] = ExpressionEncoder[HllRolled]()
}

object HllMergeAgg {
  def columnFn(p: Int)(regs: Column): Column = {
    implicit val inEnc: Encoder[Option[Array[Byte]]] =
      ExpressionEncoder[Option[Array[Byte]]]()
    udaf(new HllMergeAgg(p)).apply(regs)
  }
}

class HllSketchAgg(p: Int)
    extends Aggregator[Option[String], Array[Byte], HllEstimate] {
  // p >= 8 keeps rho <= 61-p <= 53, so 2^(53-M_j) stays a legal long shift
  require(p >= 8 && p <= 16)

  override def zero: Array[Byte] = new Array[Byte](1 << p)

  override def reduce(b: Array[Byte], in: Option[String]): Array[Byte] = in match {
    case Some(s) if s != null => HllAlgebra.update(b, s, p); b
    case _ => b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAlgebra.mergeInto(a, b)

  override def finish(b: Array[Byte]): HllEstimate = HllAlgebra.estimate(b, p)

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[HllEstimate] = ExpressionEncoder[HllEstimate]()
}

/** First-level variant emitting the raw registers (binary) instead of
  * the estimate — the persistable form consumed by [[HllMergeAgg]]. */
class HllRegistersAgg(p: Int)
    extends Aggregator[Option[String], Array[Byte], Array[Byte]] {
  require(p >= 8 && p <= 16)
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(b: Array[Byte], in: Option[String]): Array[Byte] = in match {
    case Some(s) if s != null => HllAlgebra.update(b, s, p); b
    case _ => b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAlgebra.mergeInto(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

object HllRegistersAgg {
  def columnFn(p: Int)(key: Column): Column = {
    implicit val inEnc: Encoder[Option[String]] = ExpressionEncoder[Option[String]]()
    udaf(new HllRegistersAgg(p)).apply(key)
  }
}

object HllSketchAgg {
  /** `hll(keyCol)` → struct `(est, harmonicSumScaled, zeros)`. */
  def columnFn(p: Int)(key: Column): Column = {
    implicit val inEnc: Encoder[Option[String]] = ExpressionEncoder[Option[String]]()
    udaf(new HllSketchAgg(p)).apply(key)
  }
}
