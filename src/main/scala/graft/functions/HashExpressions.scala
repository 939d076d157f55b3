package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashing kernels over token arrays, shared by eval and codegen.
  *
  * Extension rationale: the MinHash/SimHash dedup operators (SURVEY.md §2c,
  * north-star) need k hash evaluations per token. Doing this with k
  * `xxhash64(...)` expression trees would rescan the array k times and blow
  * up the plan; these kernels do one pass per document and stay inside
  * whole-stage codegen via a single static call.
  *
  * Token hash = XXH64 over the token's UTF-8 bytes (Spark's own `xxhash64`
  * core, `org.apache.spark.sql.catalyst.expressions.XXH64`), seeded per hash
  * function — deterministic across runs/executors.
  */
object HashOps {
  private def tokenHash(t: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), seed)

  /** Per-document repetition counts in ONE row-local pass (see
    * [[graft.functions.RepetitionStats]]): token count, distinct-token
    * count, max token multiplicity, max bigram multiplicity. The
    * distributed twin ([[graft.text.TextAnalysis.repetitionStats]])
    * shuffles every token twice; this kernel is a scan — per-doc hash maps
    * bound memory by the DOCUMENT length, the right trade for bounded docs
    * at corpus scale. Null tokens are skipped (parity with `explode`). */
  def repetitionCounts(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    val tokCounts = new java.util.HashMap[UTF8String, Int]()
    val bgCounts = new java.util.HashMap[UTF8String, Int]()
    var nTok = 0L
    var topTok = 0
    var topBg = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        nTok += 1
        val c = tokCounts.merge(t, 1, (a, b) => a + b)
        if (c > topTok) topTok = c
        if (prev != null) {
          val bg = UTF8String.concat(prev, UTF8String.fromString(" "), t)
          val cb = bgCounts.merge(bg, 1, (a, b) => a + b)
          if (cb > topBg) topBg = cb
        }
        prev = t
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nTok, tokCounts.size.toLong, topTok.toLong, topBg.toLong)
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix (public domain
    * constant set, Steele et al.). */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: sig[i] = min over tokens of h_i(token), where
    * h_i = splitmix64(xxh64(token) + i·φ) — the token's bytes are hashed
    * ONCE and the k per-function values derive from cheap integer mixing
    * (k independent-enough permutations at 1/k of the string-hashing cost;
    * at 100 TB the signature pass dominates MinHash dedup, so this is the
    * hot loop). */
  def minHash(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val base = tokenHash(tokens.getUTF8String(t), seed)
        var i = 0
        var acc = base
        while (i < numHashes) {
          val h = mix64(acc)
          if (h < sig(i)) sig(i) = h
          acc += 0x9e3779b97f4a7c15L // golden-ratio increment per hash fn
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted DISTINCT rolling word-n-gram hashes in one pass: each token's
    * bytes are hashed once, each n-window combines the token hashes with an
    * order-sensitive splitmix fold. Replaces materializing shingle STRINGS
    * (`transform` + `concat_ws` + `slice` = interpreted lambda + 2
    * allocations per shingle) with zero-allocation long arithmetic — at
    * 100 TB the shingling pass is the single hottest loop of MinHash dedup.
    * 64-bit hashes stand in for the shingles themselves downstream
    * (collision odds within any pair's union are ~1e-14). */
  def shingleHashes(tokens: ArrayData, n: Int, seed: Long): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      th(i) = if (tokens.isNullAt(i)) 0L else tokenHash(tokens.getUTF8String(i), seed)
      i += 1
    }
    val out = new Array[Long](nt - n + 1)
    var w = 0
    while (w <= nt - n) {
      var h = seed
      var j = 0
      while (j < n) { h = mix64(h ^ th(w + j)); j += 1 }
      out(w) = h
      w += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var m = 0
    var k = 1
    while (k < out.length) {
      if (out(k) != out(m)) { m += 1; out(m) = out(k) }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m + 1))
  }

  /** POSITIONAL rolling word-n-gram hashes: out(i) = hash of the gram
    * starting at token i (same order-sensitive fold as [[shingleHashes]]
    * but NOT sorted/deduped), so a duplicated gram can be mapped back to
    * its token offset — the input to span-level exact-substring dedup. */
  def positionalShingleHashes(tokens: ArrayData, n: Int, seed: Long): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      th(i) = if (tokens.isNullAt(i)) 0L else tokenHash(tokens.getUTF8String(i), seed)
      i += 1
    }
    val out = new Array[Long](nt - n + 1)
    var w = 0
    while (w <= nt - n) {
      var h = seed
      var j = 0
      while (j < n) { h = mix64(h ^ th(w + j)); j += 1 }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over precomputed shingle hashes (see [[minHash]] for
    * the mixing scheme). */
  def minHashFromHashes(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      var acc = hashes.getLong(t)
      var i = 0
      while (i < numHashes) {
        val h = mix64(acc)
        if (h < sig(i)) sig(i) = h
        acc += 0x9e3779b97f4a7c15L
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
    * algorithm) over a normalized string: hash every k-byte gram (XXH64,
    * one pass), take the min of every w-window via a monotonic deque
    * (O(grams) total, not O(grams·w)), return the SORTED DISTINCT minima.
    * One allocation-bounded pass per document — replaces a HOF formulation
    * whose per-window `slice`+`array_min` lambdas (and re-evaluated
    * branches) were ~100× slower on long docs. Grams are byte-grams: equal
    * to char-grams on ASCII; documented approximation elsewhere. */
  def winnow(s: UTF8String, k: Int, w: Int, seed: Long): ArrayData = {
    val n = s.numBytes()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val g = n - k + 1
    val gh = new Array[Long](g)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < g) { gh(i) = XXH64.hashUnsafeBytes(base, off + i, k, seed); i += 1 }
    val mins =
      if (g <= w) {
        var m = Long.MaxValue; var j = 0
        while (j < g) { if (gh(j) < m) m = gh(j); j += 1 }
        Array(m)
      } else {
        val nw = g - w + 1
        val out = new Array[Long](nw)
        val dq = new Array[Int](g) // deque of indices, increasing gh values
        var head = 0; var tail = 0 // [head, tail)
        var p = 0
        while (p < g) {
          while (tail > head && gh(dq(tail - 1)) >= gh(p)) tail -= 1
          dq(tail) = p; tail += 1
          if (dq(head) <= p - w) head += 1
          if (p >= w - 1) out(p - w + 1) = gh(dq(head))
          p += 1
        }
        out
      }
    java.util.Arrays.sort(mins)
    var m = 0
    var t = 1
    while (t < mins.length) {
      if (mins(t) != mins(m)) { m += 1; mins(m) = mins(t) }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, m + 1))
  }

  /** Content-defined chunking cut positions (public Rabin-style scheme):
    * a polynomial rolling hash (base 257, mod 1e9+7 — a prime, so the
    * closed form `Σ byte·B^j mod M` is SQL-reproducible without
    * overflow) slides a `w`-byte window over the string; a cut falls
    * after every byte position whose window hash ≡ 0 (mod `d`), giving
    * expected chunk length ~`d` bytes. Returns the sorted 1-based cut
    * END positions. Because the rule looks only at local content, an
    * insertion re-synchronizes after ~`w` bytes — the property that
    * makes chunk-level dedup robust to edits, unlike fixed-size
    * chunking. O(n) incremental pass; byte positions equal char
    * positions on ASCII (documented approximation, as with [[winnow]]). */
  def cdcCuts(s: UTF8String, w: Int, d: Int): ArrayData = {
    val M = 1000000007L
    val B = 257L
    val n = s.numBytes()
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    @inline def byteAt(i: Int): Long =
      (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff).toLong
    var bw = 1L // B^(w-1) mod M
    var t = 0
    while (t < w - 1) { bw = bw * B % M; t += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + byteAt(i)) % M; i += 1 }
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    if (h % d == 0L) out += w
    i = w
    while (i < n) {
      h = ((h - byteAt(i - w) * bw % M + M) % M * B + byteAt(i)) % M
      if (h % d == 0L) out += (i + 1)
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** 64-bit SimHash: bit j of the result is 1 iff the sum over tokens of
    * ±1 (sign of bit j of xxh64(token)) is positive. */
  def simHash(tokens: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash(tokens.getUTF8String(t), seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** SimHash with md5 token hashes — the oracle-reproducible twin of
    * [[simHash]]: the per-token hash is the FIRST 8 BYTES of md5(token),
    * big-endian, i.e. exactly `('0x' || substr(md5(tok), 1, 16))::UBIGINT`
    * in any SQL engine with an md5 builtin. Same majority vote per bit.
    * ~5-10× the per-token hash cost of XXH64 — prefer [[simHash]] at scale;
    * this variant is the verification surface. */
  def simHashMd5(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

private[functions] object HashExprChecks {
  def tokenArray(name: String, child: Expression): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string>, got ${other.simpleString}")
  }
}

/** `shingle_hashes(array<string>) -> array<long>` — sorted distinct rolling
  * n-gram hashes (codegen'd via static call). */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.shingleHashes(tokens.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.shingleHashes($c, $n, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `positional_shingle_hashes(array<string>) -> array<long>` — rolling
  * n-gram hashes in token order, element i = gram starting at token i
  * (codegen'd via static call). */
case class PositionalShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_shingle_hashes"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.positionalShingleHashes(tokens.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.positionalShingleHashes($c, $n, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `minhash_from_hashes(array<long>) -> array<long>` (codegen'd). */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_from_hashes"

  protected override def nullSafeEval(hashes: Any): Any =
    HashOps.minHashFromHashes(hashes.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.minHashFromHashes($c, $numHashes);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object SetOps {
  /** Intersection size of two individually SORTED, DISTINCT string arrays
    * via linear merge — no hash-set allocation per pair. The all-pairs
    * Jaccard verify step evaluates this O(pairs) times; `array_intersect` +
    * `array_union` would build two hash maps per pair instead. */
  def sortedIntersectionCount(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long-array variant (for shingle-hash sets). */
  def sortedLongIntersectionCount(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `sorted_intersection_count(array<string>|array<long> ×2) -> long` over
  * pre-sorted distinct arrays (codegen'd; dispatches on element type). */
case class SortedIntersectionCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def isLongs = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(StringType, LongType).exists(et =>
      children.forall(_.dataType match {
        case ArrayType(t, _) => t == et
        case _ => false
      }))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<bigint> arguments")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersection_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isLongs)
      SetOps.sortedLongIntersectionCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SetOps.sortedIntersectionCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLongs) "sortedLongIntersectionCount" else "sortedIntersectionCount"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOps.$m($a, $b);")
  }

  protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `repetition_counts(array<string>) -> struct(n_tokens, n_distinct,
  * top_c, top_bg_c)` — per-doc repetition counters in one row-local pass
  * (codegen'd via static call; no shuffles). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("top_bg_c", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_counts"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.repetitionCounts(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.repetitionCounts($c);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `minhash_signature(array<string>) -> array<long>` — k-permutation MinHash
  * signature in one pass (codegen'd via static call). */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.minHash(tokens.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.minHash($c, $numHashes, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `winnow_fingerprints(string) -> array<long>` — sorted distinct winnowing
  * minima over byte k-grams (codegen'd via static call). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(k > 0 && w > 0)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  protected override def nullSafeEval(s: Any): Any =
    HashOps.winnow(s.asInstanceOf[UTF8String], k, w, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.winnow($c, $k, $w, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `cdc_boundaries(string) -> array<int>` — content-defined chunking cut
  * positions via a Rabin-style rolling hash (codegen'd via static call). */
case class CdcBoundaries(child: Expression, w: Int, d: Int)
    extends UnaryExpression {
  require(w > 0 && d > 0)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_boundaries"

  protected override def nullSafeEval(s: Any): Any =
    HashOps.cdcCuts(s.asInstanceOf[UTF8String], w, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.cdcCuts($c, $w, $d);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `simhash64(array<string>) -> long` (codegen'd via static call). */
case class SimHash64(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.simHash(tokens.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.simHash($c, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `simhash64_md5(array<string>) -> long` — md5-token-hash SimHash (the
  * SQL-reproducible twin; see [[graft.functions.HashOps.simHashMd5]]). */
case class SimHash64Md5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64_md5"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.simHashMd5(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.simHashMd5($c);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Kernels for exact-substring (character-span) dedup — the Lee et al.
  * ("Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499, public) ExactSubstr family, re-expressed for Spark:
  * instead of a corpus-wide suffix array (a single-machine construction),
  * every k-byte gram is hashed positionally in one pass per document; the
  * corpus-wide duplicate-gram set falls out of ONE hash-keyed groupBy
  * (8-byte shuffle keys, map-side partial aggregation), and covered spans
  * are cut back out row-locally. Byte positions equal char positions on
  * ASCII (same documented approximation as [[HashOps.winnow]]/
  * [[HashOps.cdcCuts]]). */
object SpanOps {

  /** POSITIONAL k-byte-gram hashes: out(i) = XXH64 of bytes [i, i+k).
    * One allocation-bounded pass; empty result when the doc is shorter
    * than one gram. */
  def charGramHashes(s: UTF8String, k: Int, seed: Long): ArrayData = {
    val n = s.numBytes()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val g = n - k + 1
    val out = new Array[Long](g)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < g) { out(i) = XXH64.hashUnsafeBytes(base, off + i, k, seed); i += 1 }
    new GenericArrayData(out)
  }

  /** Cut every byte span `[p, p+k)` for the SORTED ascending 0-based
    * `starts` out of `s`; overlapping/adjacent spans merge into maximal
    * intervals first. Returns `struct(clean_text, n_spans, n_removed)` —
    * the kept bytes in order, the number of maximal removed intervals,
    * and the number of bytes removed. Row-local, O(n + |starts|). */
  def cutSpans(s: UTF8String, starts: ArrayData, k: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = s.numBytes()
    val m = starts.numElements()
    if (m == 0)
      return org.apache.spark.sql.catalyst.InternalRow(s, 0, 0)
    val bytes = s.getBytes
    val out = new Array[Byte](n)
    var w = 0          // write cursor into out
    var read = 0       // next uncut byte
    var nSpans = 0
    var removed = 0
    var i = 0
    while (i < m) {
      var lo = starts.getLong(i).toInt
      var hi = math.min(lo + k, n) // exclusive
      // absorb every start overlapping/extending the current interval
      while (i + 1 < m && starts.getLong(i + 1).toInt <= hi) {
        i += 1
        hi = math.min(math.max(hi, starts.getLong(i).toInt + k), n)
      }
      if (lo < read) lo = read // defensive: unsorted input cannot double-cut
      if (lo < hi) {
        val keep = lo - read
        if (keep > 0) { System.arraycopy(bytes, read, out, w, keep); w += keep }
        nSpans += 1
        removed += hi - lo
        read = hi
      }
      i += 1
    }
    if (read < n) { System.arraycopy(bytes, read, out, w, n - read); w += n - read }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, w)), nSpans, removed)
  }
}

/** `char_gram_hashes(string) -> array<long>` — positional k-byte-gram
  * XXH64 hashes (codegen'd via static call). */
case class CharGramHashes(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0, "gram length must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_gram_hashes"

  protected override def nullSafeEval(s: Any): Any =
    SpanOps.charGramHashes(s.asInstanceOf[UTF8String], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanOps.charGramHashes($c, $k, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `cut_spans(string, array<long>) -> struct(clean_text, n_spans,
  * n_removed)` — remove every k-byte span starting at the given sorted
  * 0-based positions, merging overlaps (codegen'd via static call). */
case class CutSpans(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k > 0, "gram length must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<bigint>), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cut_spans"

  protected override def nullSafeEval(s: Any, starts: Any): Any =
    SpanOps.cutSpans(s.asInstanceOf[UTF8String], starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpanOps.cutSpans($a, $b, $k);")

  protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
