package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled-evaluation estimators for generate-and-check benchmarks. */
object EvalMetrics {

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language Models
    * Trained on Code", eq. 1): for a task with `n` sampled attempts of
    * which `c` are correct,
    * `pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)` —
    * the unbiased estimator of the probability that at least one of k
    * fresh samples passes (NOT the biased empirical `1 − (1−c/n)^k`).
    *
    * Determinism discipline: trials per task are capped at `maxN` (the
    * first `maxN` by `trialCol` order — a pinned frame), the survival
    * product folds LEFT over i = 0..k−1 in double (each factor one IEEE
    * division; a left fold starting at 1.0 is bit-identical to the
    * oracle's written-out left-associated product), the per-task value
    * is micro-quantized to a long, and the cross-task mean sums longs.
    * Tasks with `n < k` are undefined and excluded. One row per k:
    * `(k, n_tasks, mean_pass_at_k)`.
    *
    * Scale shape: one window rank per task (bounded by task group size),
    * one count aggregation, then task-frame-sized row-local math —
    * nothing beyond the grouped rank touches the corpus twice. */
  def passAtK(df: DataFrame, taskCol: String, trialCol: String,
      correctCol: org.apache.spark.sql.Column, ks: Seq[Int],
      maxN: Int = 20): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= maxN), s"ks=$ks")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(taskCol).orderBy(trialCol)
    val perTask = df
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxN)
      .groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correctCol, 1L).otherwise(0L)).as("c"))
    val spark = df.sparkSession
    import spark.implicits._
    val kFrame = ks.toDF("k")
    // survival product Π (n−c−i)/(n−i), left fold; n−c < k short-circuits
    val prod = aggregate(sequence(lit(0), col("k") - 1), lit(1.0),
      (acc, i) => acc * ((col("n") - col("c") - i).cast("double")
        / (col("n") - i).cast("double")))
    val passQ = when(col("n") < col("k"), lit(null).cast("long")) // undefined
      .when(col("n") - col("c") < col("k"), lit(1000000L))
      .otherwise(lit(1000000L) - floor(prod * lit(1e6) + lit(0.5)).cast("long"))
    perTask.crossJoin(broadcast(kFrame))
      .withColumn("__pq", passQ)
      .filter(col("__pq").isNotNull)
      .groupBy("k")
      .agg(count(lit(1)).as("n_tasks"), sum("__pq").as("__s"))
      .select(col("k"), col("n_tasks"),
        (col("__s").cast("double") / lit(1e6) / col("n_tasks"))
          .as("mean_pass_at_k"))
  }

  /** Bradley–Terry strength ranking from pairwise outcomes (the
    * arena-leaderboard model: `P(i beats j) = σ_i/(σ_i + σ_j)`), fitted
    * with Hunter's MM iteration (Hunter 2004, eq. 2):
    * `σ_i ← W_i / Σ_j n_ij/(σ_i + σ_j)`, renormalized to mean 1 each
    * round.
    *
    * `matches(winnerCol, loserCol)` is corpus-sized; everything after the
    * two aggregations (per-player wins, per-unordered-pair game counts)
    * lives on the PLAYER frame — bounded at ≤ `maxPlayers`, so the MM
    * loop runs on the driver in EXACT integer arithmetic: scores are
    * micro-quantized longs, every `floor(x + ½)` is the BigInt identity
    * `(2a + b) div 2b`, zero-score pair denominators clamp to 1, and the
    * oracle replays the identical algebra with HUGEINT CTEs. Ties in the
    * data are the caller's to resolve (a match has exactly one winner).
    * Returns `(player, games, wins, bt_score)` with `bt_score` =
    * micro-score / 1e6. */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 5, maxPlayers: Int = 10000): DataFrame = {
    val m = matches.select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val winRows = m.groupBy("w").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairRows = m
      .select(least(col("w"), col("l")).as("a"), greatest(col("w"), col("l")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    m.unpersist()
    val players = pairRows.flatMap(p => Seq(p._1._1, p._1._2)).distinct.sorted
    require(players.length >= 2 && players.length <= maxPlayers,
      s"bradleyTerry: ${players.length} players (bound $maxPlayers)")
    val wins = players.map(p => winRows.getOrElse(p, 0L)).toArray
    val games = players.map(p => pairRows.collect {
      case ((a, b), n) if a == p || b == p => n
    }.sum).toArray
    val idx = players.zipWithIndex.toMap
    val T = BigInt(1000000000000L) // 1e12
    var s: Array[BigInt] = Array.fill(players.length)(BigInt(1000000L))
    def halfUp(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    (1 to iters).foreach { _ =>
      val denom = Array.fill(players.length)(BigInt(0))
      pairRows.foreach { case ((a, b), n) =>
        val (i, j) = (idx(a), idx(b))
        val sij = (s(i) + s(j)).max(BigInt(1))
        val t = halfUp(BigInt(n) * T, sij)
        denom(i) += t; denom(j) += t
      }
      val s1 = Array.tabulate(players.length) { i =>
        if (denom(i) == 0) BigInt(0) else halfUp(BigInt(wins(i)) * T, denom(i))
      }
      val z = s1.foldLeft(BigInt(0))(_ + _).max(BigInt(1))
      val scale = BigInt(players.length) * 1000000L
      s = s1.map(v => v * scale / z)
    }
    val spark = matches.sparkSession
    import spark.implicits._
    players.indices.map { i =>
      (players(i), games(i), wins(i), s(i).toLong.toDouble / 1e6)
    }.toDF("player", "games", "wins", "bt_score")
  }

  /** Inverse-propensity off-policy evaluation (Horvitz–Thompson applied
    * to logged bandit feedback — Li et al., WSDM'11): estimate the value
    * of a DETERMINISTIC target policy from logs collected under another
    * policy, without deploying it.
    *
    * Split discipline: propensities `p̂(a|c)` AND the greedy target
    * policy `π(c) = argmax_a avgReward_A(c, a)` (ties to the smaller
    * action) are fitted on the LOGGING split (`splitCol = true`); the
    * estimate is computed on the EVAL split only — so IPS and the direct
    * method genuinely disagree (with propensities fitted on the eval
    * data itself they collapse to the same number).
    *
    *  - `ips = (1/N_B) Σ_{t∈B} r_t·1[a_t = π(c_t)] / p̂_A(a_t|c_t)`
    *  - `dm  = Σ_c (n^B_c/N_B) · avgReward_A(c, π(c))`
    *  - `match_rate` = share of eval rows whose logged action is π.
    *
    * All counts are exact longs; the per-(context, action) ratios are
    * pinned double ops micro-quantized BEFORE the cross-group sums.
    * Returns one row `(n_eval, ips, dm, match_rate)`. */
  def ipsOffPolicy(df: DataFrame, contextCol: org.apache.spark.sql.Column,
      actionCol: org.apache.spark.sql.Column,
      rewardCol: org.apache.spark.sql.Column,
      splitCol: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(contextCol.cast("long").as("c"),
        actionCol.cast("string").as("a"),
        when(rewardCol, 1L).otherwise(0L).as("r"), splitCol.as("in_log"))
      .filter(col("c").isNotNull && col("a").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aGrp = base.filter(col("in_log"))
      .groupBy("c", "a").agg(count(lit(1)).as("n_a"), sum("r").as("r_a"))
    val wPi = org.apache.spark.sql.expressions.Window.partitionBy("c")
      .orderBy((col("r_a").cast("double") / col("n_a")).desc, col("a").asc)
    val target = aGrp.withColumn("__rk", row_number().over(wPi))
      .filter(col("__rk") === 1)
      .select(col("c"), col("a"), col("n_a"), col("r_a"),
        (col("r_a").cast("double") / col("n_a")).as("q_a"))
    val nCa = aGrp.groupBy("c").agg(sum("n_a").as("n_c_log"))
    val pol = target.join(nCa, "c") // (c, a=π(c), n_a, q_a, n_c_log)
    val evalGrp = base.filter(!col("in_log"))
      .groupBy("c", "a").agg(count(lit(1)).as("n_b"), sum("r").as("r_b"))
    val nB = evalGrp.agg(sum("n_b").as("n_eval"))
    // matched eval groups: logged action equals the target action
    val matched = evalGrp.join(pol, Seq("c", "a"))
    val ipsQ = floor(col("r_b").cast("double")
      * col("n_c_log").cast("double") / col("n_a") * lit(1e6) + lit(0.5))
    val perCtxB = evalGrp.groupBy("c").agg(sum("n_b").as("n_c_eval"))
    val dmQ = floor(col("n_c_eval").cast("double") * col("q_a") * lit(1e6) + lit(0.5))
    val ipsAgg = matched.agg(sum(ipsQ).as("__ips_q"), sum("n_b").as("__n_match"))
    val dmAgg = perCtxB.join(pol.select("c", "q_a"), "c").agg(sum(dmQ).as("__dm_q"))
    val out = nB.crossJoin(ipsAgg).crossJoin(dmAgg).select(
      col("n_eval"),
      (col("__ips_q").cast("double") / lit(1e6) / col("n_eval")).as("ips"),
      (col("__dm_q").cast("double") / lit(1e6) / col("n_eval")).as("dm"),
      (col("__n_match").cast("double") / col("n_eval")).as("match_rate"))
    val res = out.transform(graft.core.Checkpoints.truncate)
    base.unpersist()
    res
  }

  /** Padding-waste audit for length-bucketed batching: bucket each
    * document's token count up to the next multiple of `bucketSize` and
    * report, per bucket, how many pad tokens that batch shape wastes —
    * the number a packing strategy (`q_pack`) is judged against.
    * Returns `(bucket_len, n_docs, real_tokens, pad_tokens, pad_ratio)`. */
  def paddingWaste(df: DataFrame, textCol: String, bucketSize: Int): DataFrame = {
    require(bucketSize >= 1)
    val n = graft.text.TextAnalysis.tokenCount(col(textCol)).cast("long")
    df.filter(col(textCol).isNotNull)
      .select(n.as("__n"))
      .filter(col("__n") > 0)
      .withColumn("bucket_len",
        expr(s"((__n + ${bucketSize - 1}L) div ${bucketSize}L) * ${bucketSize}L"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("real_tokens"),
        sum(col("bucket_len") - col("__n")).as("pad_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("real_tokens"),
        col("pad_tokens"),
        (col("pad_tokens").cast("double")
          / (col("real_tokens") + col("pad_tokens"))).as("pad_ratio"))
  }

  /** Deterministic binary log loss over a DYADIC probability grid — for
    * scores living on the exact `k / 2^bits` lattice (hash-derived
    * scores, quantized model outputs), `ln p = lnPosInt(k) − bits·ln 2`
    * with the engine-pinned series ln, so cross-entropy needs no libm
    * anywhere. Terms are nano-quantized longs summed exactly; k is
    * clamped to `[1, 2^bits − 1]` so both ln arguments stay in domain.
    * One aggregation. Returns one row `(n, log_loss)` in nats. */
  def logLossOnGrid(df: DataFrame, kCol: String, yCol: String,
      bits: Int = 16): DataFrame = {
    import graft.functions.DetMath.lnPosInt
    require(bits >= 1 && bits <= 62, "logLossOnGrid: bits in [1, 62]")
    val grid = 1L << bits
    val k = least(greatest(col(kCol).cast("long"), lit(1L)), lit(grid - 1))
    val y = col(yCol).cast("int")
    val lnGrid = lnPosInt(lit(grid))
    val term = when(y === 1, lnPosInt(k) - lnGrid)
      .otherwise(lnPosInt(lit(grid) - k) - lnGrid)
    df.filter(col(kCol).isNotNull && y.isNotNull)
      .select(floor(term * lit(1e9) + lit(0.5)).cast("long").as("__q"))
      .agg(count(lit(1)).as("n"), sum("__q").as("__s"))
      .select(col("n"),
        (-(col("__s").cast("double") / lit(1e9) / col("n"))).as("log_loss"))
  }

  /** Qini uplift curve over score buckets — the standard readout for an
    * uplift / targeting model: walking buckets best-first, how many extra
    * conversions did the treated group produce beyond the control group's
    * rate-scaled expectation? `qini(d) = cumConvT(d) − cumConvC(d) ·
    * (cumNT(d)/cumNC(d))` (Radcliffe 2007). One row per unit in, ONE
    * bucket-keyed corpus aggregation, then cumulative algebra on the
    * bounded bucket frame (the unpartitioned window sees ≤ #buckets
    * rows). All counts exact longs; the per-bucket close is one pinned
    * double expression; buckets with no control mass yet yield null.
    * Returns `(bucket, n_t, n_c, conv_t, conv_c, qini)`. */
  def qiniByBucket(df: DataFrame, bucketCol: String, treatedCol: String,
      convertedCol: String): DataFrame = {
    val t = col(treatedCol).cast("boolean")
    val y = col(convertedCol).cast("boolean")
    val g = df.groupBy(col(bucketCol).as("bucket"))
      .agg(sum(when(t, 1L).otherwise(0L)).as("n_t"),
        sum(when(!t, 1L).otherwise(0L)).as("n_c"),
        sum(when(t && y, 1L).otherwise(0L)).as("conv_t"),
        sum(when(!t && y, 1L).otherwise(0L)).as("conv_c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    g.withColumn("__ct", sum("conv_t").over(w))
      .withColumn("__cc", sum("conv_c").over(w))
      .withColumn("__nt", sum("n_t").over(w))
      .withColumn("__nc", sum("n_c").over(w))
      .select(col("bucket"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"),
        when(col("__nc") > 0,
          col("__ct").cast("double") - col("__cc").cast("double") *
            (col("__nt").cast("double") / col("__nc").cast("double")))
          .as("qini"))
  }
}
