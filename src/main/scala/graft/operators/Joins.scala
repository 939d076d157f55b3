package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes the reference has none of (SURVEY.md §2c: "Joins ... absent")
  * but a large-scale analytics/training-data pipeline needs: as-of join,
  * range (interval) join, and a skew-safe salted equi-join.
  *
  * All three are built so the expensive part stays an EQUI-join or a single
  * hash exchange — the shapes that scale on a 1000-executor cluster:
  *  - as-of: union + one window over the key partitioning (one shuffle,
  *    streaming-frame window, no join explosion);
  *  - range: band-bucketing turns point-in-interval into an equi-join on
  *    the bucket id (never a cartesian/BroadcastNestedLoop);
  *  - salted: hot keys spread across `saltFactor` sub-keys so no single
  *    reducer owns a whale key (the manual twin of AQE skew-join, usable
  *    when the small side is replicable).
  */
object Joins {

  /** As-of join: for every left row, attach `valueCols` from the right row
    * with the same `keyCols` and the nearest right `ts` that is `<=` the
    * left `ts` (backward, the default — matches DuckDB/pandas `ASOF JOIN`
    * with `left.ts >= right.ts`) or `>=` it (`forward = true`). Matches are
    * inclusive; left rows with no matching right row keep nulls (LEFT as-of
    * semantics). `tolerance` (same units as the ts columns) additionally
    * requires `|left.ts - right.ts| <= tolerance`.
    *
    * Strategy (scale-first): instead of a range self-join, both sides are
    * unioned and sorted once per key — a single hash exchange on `keyCols`,
    * then a running `last(carry, ignoreNulls)` window with a growing frame,
    * which Spark evaluates incrementally (UnboundedPreceding→CurrentRow is
    * the streaming-friendly frame — no per-partition buffering of the whole
    * group). The carried value is ONE struct `(matched_ts, valueCols...)`
    * per right row — null for left filler rows — so every left row receives
    * all value columns plus the matched timestamp from the SAME right row,
    * and a genuine NULL inside a matched right row is preserved (it never
    * falls through to an older right row, matching DuckDB/pandas ASOF).
    * The forward direction reuses the same machinery on negated
    * timestamps. Right rows that tie on (key, ts) resolve to the row with
    * the largest `tieCol` value when one is given; without a `tieCol` the
    * winner is partition-order dependent (fine only when (key, ts) is
    * unique on the right — else pass `tieCol` or pre-aggregate).
    *
    * `valueCols` must not collide with left column names; ts columns must
    * be numeric (negatable) when `forward = true`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      forward: Boolean = false,
      tolerance: Option[Long] = None,
      /** Optional right-side column ordering ties on (key, ts): the row with
        * the LARGEST `tieCol` value wins, independent of partition order.
        * Without it, ties resolve to an arbitrary (partition-order-dependent)
        * right row — fine when (key, ts) is unique on the right. */
      tieCol: Option[String] = None
  ): DataFrame = {
    require(valueCols.forall(v => !left.columns.contains(v)),
      s"right value columns ${valueCols.mkString(",")} collide with left schema")
    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    def ts(c: org.apache.spark.sql.Column) = if (forward) -c else c
    val carryCol = "__graft_carry"
    val matchedTs = "__mts"
    // One nullable struct per right row: (matched ts, all value cols). Left
    // filler rows carry null, so last(ignoreNulls) skips them but NEVER
    // skips a matched right row whose value fields happen to be null.
    val carrySchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(matchedTs,
        org.apache.spark.sql.types.LongType, nullable = true) +:
        valueCols.map(v => right.schema(v).copy(nullable = true)))
    // Common shape: keys ++ __ts ++ __side ++ left payload ++ carry struct
    val tieName = "__tie"
    val tieType = tieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)
    val l = left.select(
      keyCols.map(col) ++
        Seq(ts(col(leftTs)).as("__ts"), lit(1).as("__side"),
          lit(null).cast(tieType).as(tieName)) ++
        leftPayload.map(col) :+
        lit(null).cast(carrySchema).as(carryCol): _*)
    // a null right ts matches nothing (ASOF comparison semantics); without
    // this filter it would sort first (nulls-first asc) and its values
    // would leak into every left row of the key
    val r = right.filter(col(rightTs).isNotNull).select(
      keyCols.map(col) ++
        Seq(ts(col(rightTs)).as("__ts"), lit(0).as("__side"),
          tieCol.map(col).getOrElse(lit(null).cast(tieType)).as(tieName)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(ts(col(rightTs)).cast("long").as(matchedTs) +:
          valueCols.map(col): _*).as(carryCol): _*)
    // nulls-first on __tie: right rows tying on (key, ts) order so the
    // largest tie value is LAST in frame, which last(ignoreNulls) then picks
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col(tieName).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val projected = l.unionByName(r).select(
      (keyCols ++ leftPayload).map(col) ++ Seq(col("__side"), col("__ts")) :+
        last(col(carryCol), ignoreNulls = true).over(w).as(carryCol): _*)
    val leftRows = projected.filter(col("__side") === 1)
    val bounded = tolerance match {
      case None => leftRows
      case Some(tol) =>
        // stale match -> drop the whole carried struct (row is kept)
        val fresh = col("__ts").cast("long") - col(carryCol)(matchedTs) <= tol
        leftRows.withColumn(carryCol, when(fresh, col(carryCol)))
    }
    valueCols.foldLeft(bounded)((d, v) => d.withColumn(v, col(carryCol)(v)))
      .drop("__side", "__ts", carryCol)
  }

  /** Point-in-interval range join via band bucketing: every interval row is
    * replicated into each width-`bucketWidth` band it overlaps, every point
    * row lands in exactly one band, and the join becomes an EQUI-join on the
    * band id followed by the exact `between` filter. Output: inner-join rows
    * `pointDf.* ++ intervalDf.*` for every (point, interval) containment.
    *
    * Choose `bucketWidth` ≈ the typical interval length: replication factor
    * is `len/width + 1` per interval, and each point-band pair is matched by
    * the equi-join instead of a nested-loop over all intervals. Points fall
    * in exactly one band, so no dedup is needed.
    */
  def rangeJoinBanded(
      pointDf: DataFrame,
      intervalDf: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0)
    val p = pointDf.withColumn("__band", floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervalDf
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__band",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__band")
  }

  /** Interval-OVERLAP join (`a.lo <= b.hi AND b.lo <= a.hi`) via the same
    * band bucketing — the interval×interval case [[rangeJoinBanded]]'s
    * point×interval shape can't express. Both sides replicate into every
    * width-`bucketWidth` band they cover, the join is an EQUI-join on the
    * band id, and each overlapping pair is CLAIMED exactly once, by the
    * first band both intervals share (`floor(max(a.lo, b.lo) / width)`),
    * so no post-join dedup pass (a `distinct` here would shuffle the whole
    * output again). Output: `aDf.* ++ bDf.*` per overlapping pair.
    * Replication per row is `len/width + 1` — pick `bucketWidth` ≈ the
    * typical interval length, as with [[rangeJoinBanded]]. */
  def intervalOverlapJoin(
      aDf: DataFrame,
      bDf: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0)
    def banded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__band", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    val a = banded(aDf, aLo, aHi)
    val b = banded(bDf, bLo, bHi)
    a.join(b, Seq("__band"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__band") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__band")
  }

  /** Skew-safe equi-join: semantically identical to
    * `big.join(small, keyCols)` but hot keys on the big side are spread over
    * `saltFactor` sub-keys while the small side is replicated `saltFactor`×.
    * Use when one/few key values dominate the big side (a "whale" key would
    * otherwise pin a single reducer); the small side must be cheap to
    * replicate. AQE's skew-join handles sort-merge skew automatically —
    * this operator is for when you must force the layout (e.g. the skewed
    * side feeds a downstream keyed op that AQE can't split).
    *
    * The salt is derived from `rand(seed)`; output content does not depend
    * on which salt bucket a row lands in, so nondeterministic assignment is
    * safe (every bucket joins against a full copy of `small`).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltFactor: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    require(saltFactor >= 1)
    val b = big.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    b.join(s, keyCols :+ "__salt").drop("__salt")
  }

  /** Bloom-prefiltered equi-join — the manual form of AQE's runtime bloom
    * filter (InjectRuntimeFilter), for when the pruning must be guaranteed
    * rather than cost-based: build a bloom filter over the small side's
    * join keys (ONE tiny aggregate → a single broadcast row), drop big-side
    * rows that cannot match BEFORE the join's shuffle, then run the exact
    * join (bloom false positives make the prefilter safe but not
    * sufficient). With a 1 % FPR filter, a big side where only a fraction
    * of keys match sheds the rest at scan speed instead of shuffling them.
    */
  def bloomPreFilteredJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long,
      numBits: Long
  ): DataFrame = {
    import graft.functions.{bloom_filter_agg, bloom_might_contain}
    // `might_contain` requires a CONSTANT filter: materialize the one-row
    // aggregate eagerly (numBits/8 bytes to the driver — same payload a
    // broadcast variable would ship) and embed it as a binary literal, so
    // the probe constant-folds into the big side's scan filter.
    val bfBytes = small
      .agg(bloom_filter_agg(xxhash64(col(key)), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pre = big.filter(bloom_might_contain(lit(bfBytes), xxhash64(col(key))))
    pre.join(small, Seq(key))
  }

  /** Blocked sorted-neighborhood candidate pairs (Hernández/Stolfo SNM —
    * the classic entity-resolution blocking method): rows are sorted by
    * `sortCol` WITHIN each `blockCol` block, and every row is paired with
    * its next `window` neighbors in that order. Returns
    * `(block, a, b, rank_dist)` candidate pairs for a downstream verifier
    * (edit distance, similarity, …).
    *
    * `sortCol` values must be unique within a block (distinct them first) —
    * with duplicates the row_number tie order, and hence the candidate set,
    * would be partition-order dependent.
    *
    * Scale shape: blocking keeps every sort LOCAL to a block (one hash
    * exchange + per-block streamed window — never a global single-partition
    * sort), and the neighbor pairing is an EQUI-join on (block, rank):
    * each row explodes to its `window` successor ranks, so candidate count
    * is exactly rows × window, independent of block size skew. */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      sortCol: String,
      blockCol: org.apache.spark.sql.Column,
      window: Int
  ): DataFrame = {
    require(window >= 1)
    val w = Window.partitionBy(col("__block")).orderBy(col("a"))
    val ranked = df.select(col(sortCol).as("a"), blockCol.as("__block"))
      .withColumn("__rn", row_number().over(w))
    val probes = ranked.select(col("__block"), col("a"), col("__rn"),
      explode(sequence(col("__rn") + 1, col("__rn") + window)).as("__rn2"))
    probes.join(
        ranked.select(col("__block"), col("__rn").as("__rn2"), col("a").as("b")),
        Seq("__block", "__rn2"))
      .select(col("__block").as("block"), col("a"), col("b"),
        (col("__rn2") - col("__rn")).as("rank_dist"))
  }

  /** Segment-blocked fuzzy self-join: distinct string pairs within edit
    * distance `maxDist`, without the O(n²) cross join. Pigeonhole blocking:
    * each string is cut into `maxDist + 1` positional segments; two
    * equal-length strings within `maxDist` *substitutions* must agree on at
    * least one segment, so candidates are found by `maxDist + 1` equi-joins
    * on `(length, segment_index, segment)` — each a plain shuffled hash
    * join on a short key — and verified with `levenshtein`. For
    * `maxDist = 1` this is EXACT for equal-length strings (levenshtein 1
    * between equal lengths is necessarily one substitution); for larger
    * distances it is substitution-complete but can miss shift-style
    * edits (the PassJoin shifted-segment scheme would close that gap).
    * Cross-length matches are out of scope by design — blocking includes
    * the length.
    *
    * Output: (name_a, name_b, dist) with name_a < name_b. */
  def fuzzySelfJoin(df: DataFrame, textCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1)
    val nSeg = maxDist + 1
    val names = df.select(col(textCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))
    // segment i spans [i*len/nSeg, (i+1)*len/nSeg) (0-based; substring is 1-based)
    val seg = names.select(col("name"), col("len"),
      posexplode(array((0 until nSeg).map { i =>
        col("name").substr(col("len") * i / nSeg + 1,
          col("len") * (i + 1) / nSeg - col("len") * i / nSeg)
      }: _*)).as(Seq("seg_idx", "seg")))
    val a = seg.select(col("name").as("name_a"), col("len"), col("seg_idx"), col("seg"))
    val b = seg.select(col("name").as("name_b"), col("len"), col("seg_idx"), col("seg"))
    a.join(b, Seq("len", "seg_idx", "seg"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
