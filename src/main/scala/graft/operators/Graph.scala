package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics over an edge list — no graph library, just
  * joins shaped the way a 1000-executor cluster wants them.
  *
  * Triangle counting uses the degree-ordered node-iterator (the MapReduce
  * classic from Suri & Vassilvitskii, "Counting Triangles and the Curse of
  * the Last Reducer", WWW'11): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one, build wedges only from
  * each node's OUT-edges, and close them against the oriented edge list.
  * Orientation bounds every out-degree by O(√E), so the wedge join — the
  * quadratic step — generates O(E^1.5) candidates instead of
  * Σ deg(v)² (which a hub node turns into the "last reducer" straggler).
  * Each triangle is produced exactly once, so the total equals the naive
  * id-ordered count an oracle computes.
  */
object Graph {

  /** Canonicalize an edge list: drop self-loops and nulls, undirect, and
    * dedup to one `(a, b)` row with `a < b`. */
  def canonicalEdges(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .distinct()

  /** Per-node degree from a canonical edge list (one explode + one keyed
    * aggregation with map-side combine). */
  def degrees(canonical: DataFrame): DataFrame =
    canonical.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** One-row graph summary: node/edge/triangle counts plus the global
    * clustering coefficient `3·T / wedges`
    * (wedges = Σ deg·(deg−1)/2 — computed from the degree frame, no join).
    *
    * Input need not be canonical; it is canonicalized first. */
  def triangleStats(edges: DataFrame, src: String, dst: String,
      assumeCanonical: Boolean = false,
      broadcastAdjacency: Boolean = true): DataFrame = {
    // canon feeds degrees + orientation + the edge/summary aggregates, and
    // oriented feeds both the adjacency build and the per-edge intersect —
    // without caching, the (often expensive) upstream edge derivation
    // re-executes once per consumer. `assumeCanonical` skips the distinct
    // shuffle when the caller guarantees a<b dedup'd edges already.
    val canon =
      (if (assumeCanonical) edges.select(col(src).as("a"), col(dst).as("b"))
       else canonicalEdges(edges, src, dst))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = degrees(canon)
    // rank = (degree, id): a total order, so orientation is acyclic
    val ranked = deg.select(col("node"), struct(col("degree"), col("node")).as("rank"))
    // orient a->b where rank(a) < rank(b); carry ranks for the wedge order
    val oriented = canon
      .join(ranked.withColumnRenamed("node", "a").withColumnRenamed("rank", "ra"), "a")
      .join(ranked.withColumnRenamed("node", "b").withColumnRenamed("rank", "rb"), "b")
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"),
        when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Count per oriented edge (u,v): |N+(u) ∩ N+(v)| — every triangle is
    // found exactly once at the edge between its two lowest-rank vertices.
    // The adjacency frame is O(E) total entries and arrives with accurate
    // post-shuffle stats, so AQE broadcasts it when it fits; the
    // intersection itself is a row-local linear merge over sorted arrays
    // (codegen kernel), so the O(Σ outdeg²) wedge set is never
    // materialized as join rows (measured 12.8 s → sub-second on the
    // 1.2 M-edge co-purchase graph vs the wedge-join formulation).
    // adjacency totals O(E) longs (~10 MB per 1.2 M edges) — above the
    // default auto-broadcast threshold yet far below executor memory, so
    // hint the broadcast: the alternative is TWO sort-merge passes over
    // the edge list. For graphs whose adjacency outgrows memory, pass
    // `broadcastAdjacency = false` to skip the hint and take the
    // sort-merge shuffles instead of an executor OOM.
    val adjBase = oriented.groupBy(col("u").as("node"))
      .agg(array_sort(collect_list(col("v").cast("long"))).as("nbrs"))
    val adj = if (broadcastAdjacency) broadcast(adjBase) else adjBase
    val empty = array().cast("array<long>")
    val tri = oriented
      .join(adj.select(col("node").as("u"), col("nbrs").as("nu")), Seq("u"), "left")
      .join(adj.select(col("node").as("v"), col("nbrs").as("nv")), Seq("v"), "left")
      .select(graft.functions.sorted_intersection_count(
        coalesce(col("nu"), empty), coalesce(col("nv"), empty)).as("t"))
      .agg(sum("t").cast("long").as("n_triangles"))
    // coalesce the empty-graph case: sums over zero rows are null, and a
    // "0 nodes, null wedges" summary row would poison downstream arithmetic
    val summary = canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("degree") * (col("degree") - 1) / 2), lit(0L)).as("n_wedges")))
    val result = summary.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges").cast("long").as("n_wedges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("n_wedges") > 0,
          col("n_triangles") * 3.0 / col("n_wedges")).otherwise(lit(0.0))
          .as("global_clustering"))
      // one-row summary: materialize eagerly so the caches can be released
      .transform(graft.core.Checkpoints.truncate)
    canon.unpersist(); oriented.unpersist()
    result
  }

  /** Fixed-iteration PageRank in EXACT integer arithmetic: ranks are
    * maintained as longs scaled by `scale` (default 1e12), every split and
    * damping step is an integer floor-division, so the result is bit-exact
    * and engine-independent — no floating-point partial-sum order effects,
    * which is what lets an external SQL oracle reproduce it row-for-row.
    *
    * Update rule (all ops integer; `//` = floor div, positive operands):
    * {{{
    *   init       = scale // N
    *   base       = (100 - dampingPct) * init // 100
    *   r_{k+1}(v) = base + dampingPct * (Σ_{u→v} r_k(u) // outdeg(u)) // 100
    * }}}
    * Floor losses leak a little mass (bounded by N·iters ulps of `scale`)
    * — irrelevant for ranking, essential for determinism.
    *
    * Scale shape per iteration: ranks (≤ N rows) join the cached
    * degree-annotated edge list pre-partitioned on the destination key,
    * then one keyed aggregation of the contribution rows (O(E)); the
    * per-iteration [[graft.core.Checkpoints.truncate]] cuts lineage
    * (conf-switchable to reliable checkpoints) so the plan never
    * re-derives earlier rounds. Pass a symmetric edge list for an
    * undirected graph.
    *
    * BROADCAST THRESHOLD — what the zero-O(E)-exchange claim scales to:
    * with `broadcastRanks = true` (default) the N-row share frame is
    * force-broadcast each iteration, so the claim holds while that frame
    * fits comfortably in executor AND driver memory — ~16 bytes/node,
    * i.e. up to roughly 10⁷–10⁸ nodes on typical 8–64 GiB executors.
    * Past that the hint does not gracefully degrade, it OOMs. For larger
    * graphs pass `broadcastRanks = false`: edges are cached partitioned
    * on the SOURCE key instead, so the share join is co-partitioned (the
    * O(E) side never re-exchanges — spec-asserted on the forced plan;
    * only the O(N) share frame shuffles into place) and the per-iteration
    * cost becomes that one O(N) exchange plus the unavoidable O(E)
    * contribution shuffle into `groupBy(v)` — the standard Pregel
    * superstep cost, linear and skew-tolerant, not an OOM. */
  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int = 5,
      dampingPct: Int = 85, scale: Long = 1000000000000L,
      broadcastRanks: Boolean = true): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges
      .filter(col(src).isNotNull && col(dst).isNotNull)
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // N-row frames used every iteration: materialize once
    val out = e.groupBy(col("u").as("src")).agg(count(lit(1)).as("outdeg"))
      .transform(graft.core.Checkpoints.truncate)
    val nodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val init = scale / n
    val base = (100L - dampingPct) * init / 100L
    // Cached degree-annotated edges. Broadcast path: pre-partitioned on
    // the DESTINATION — the per-iteration join streams cached edges
    // against the broadcast share frame, preserving the v-partitioning,
    // so the contribution groupBy(v) runs with NO per-iteration Exchange
    // of the O(E) side and the only repeated shuffles touch O(N)-row
    // frames. No-broadcast path: pre-partitioned on the SOURCE so the
    // shuffle join on u is co-partitioned (edges never re-exchange; the
    // O(N) share frame shuffles to meet them), and groupBy(v) pays the
    // one O(E) contribution shuffle — the Pregel superstep shape.
    val eo = e.repartition(if (broadcastRanks) col("v") else col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(init))
    (1 to iters).foreach { _ =>
      // per-source share computed on the N-row side (one tiny join), so
      // the O(E) pass carries a pre-divided long instead of re-dividing
      // per edge row
      val shares = ranks.join(out, ranks("node") === out("src"))
        .select(col("src"), expr("rank div outdeg").as("share"))
      val sharesSide = if (broadcastRanks) broadcast(shares) else shares
      val contribs = eo.join(sharesSide, eo("u") === shares("src"))
        .select(col("v").as("node"), col("share").as("c"))
      val updated = contribs.groupBy("node").agg(sum("c").as("cs"))
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * cs) div 100")).as("rank"))
      // in-degree-0 nodes get no contributions: restore them at base rank
      // (N-row join, cheap)
      ranks = nodes.join(updated, Seq("node"), "left")
        .select(col("node"), coalesce(col("rank"), lit(base)).as("rank"))
        .transform(graft.core.Checkpoints.truncate)
    }
    e.unpersist(); eo.unpersist(); nodes.unpersist()
    ranks
  }

  /** Bounded-round k-core peeling: `rounds` synchronized sweeps of the
    * textbook fixpoint — drop every node whose degree in the surviving
    * subgraph is < `k`, shrink the edge set to surviving endpoints,
    * repeat. Returns the nodes remaining after the last sweep with their
    * subgraph degrees (the k-core once converged; peeling converges
    * rapidly, and a truncated run is still deterministic — the oracle
    * unrolls the SAME round count, so both engines agree converged or
    * not). Per round: one degree aggregation + two semi-joins on a
    * monotonically shrinking edge frame; each round's frame is
    * lineage-truncated so the plan doesn't grow with rounds (same
    * pattern as [[pageRank]]).
    *
    * EARLY EXIT: peeling only ever removes edges, so an unchanged edge
    * count after a sweep IS the fixpoint — every surviving node already
    * has degree ≥ k. The O(1)-row driver probe (the same Pregel
    * termination shape as [[bfsHops]]') stops the loop there; the count
    * scans the round's eagerly-truncated blocks, not recomputed lineage.
    * A truncated (`rounds` too small) run remains deterministic for the
    * oracle: the SQL twin unrolls the same round count, and once both
    * have converged extra unrolled rounds are no-ops. */
  def kCorePeel(edges: DataFrame, src: String, dst: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = canonicalEdges(edges, src, dst).transform(graft.core.Checkpoints.truncate)
    var prevEdges = e.count()
    var round = 0
    var converged = prevEdges == 0
    while (round < rounds && !converged) {
      round += 1
      val keep = degrees(e).filter(col("degree") >= k).select("node")
      e = e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .transform(graft.core.Checkpoints.truncate)
      val nEdges = e.count()
      converged = nEdges == prevEdges
      prevEdges = nEdges
    }
    degrees(e)
  }

  /** Synchronous label-propagation communities (Raghavan, Albert &
    * Kumara 2007, "Near linear time algorithm to detect community
    * structures in large-scale networks"), made DETERMINISTIC: every node
    * starts labeled with its own id; each sweep every node simultaneously
    * adopts the label held by the largest number of its neighbors, ties
    * broken by the SMALLEST label (the paper's random tie-break is what
    * makes vanilla LPA non-reproducible — min-label ties and synchronous
    * sweeps pin a unique fixed-`rounds` output, which is what lets a SQL
    * twin unroll the exact same sweeps). Synchronous LPA can 2-cycle on
    * bipartite structures; a fixed `rounds` makes the result well-defined
    * regardless (spec pins the oscillation semantics on a path graph).
    *
    * Scale shape per sweep: one equi-join of the symmetric adjacency
    * (cached, pre-partitioned on the propagation key `u` — the join with
    * the label frame reuses that layout every round) against the O(V)
    * label frame, then two map-side-combined aggregations — the
    * (node, label) count and the per-node argmax via a single
    * `max(struct(count, -label))` (no window, no sort). Lineage is cut
    * per round by [[graft.core.Checkpoints.truncate]] like every other
    * iterative op here. Returns `(node, label)`. */
  def labelPropagation(edges: DataFrame, src: String, dst: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = canonicalEdges(edges, src, dst)
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u")).cache()
    var labels = adj.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(graft.core.Checkpoints.truncate)
    for (_ <- 1 to rounds) {
      labels = adj.join(labels, adj("v") === labels("node"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("__c"))
        .groupBy(col("u"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("u").as("node"), (-col("__m.__nl")).as("label"))
        .transform(graft.core.Checkpoints.truncate)
    }
    adj.unpersist()
    labels
  }

  /** Personalized PageRank from a single `source` node — the
    * random-walk-with-restart similarity ranking behind
    * recommendation / related-item queries. Same INTEGER-EXACT algebra
    * as [[pageRank]] (scaled longs, floor-div shares, so results are
    * bit-stable under any partitioning and the oracle unrolls the exact
    * iterations in SQL): rank(source) gets the full restart mass
    * `(100-dampingPct)% · scale` each round, everything else only
    * propagated mass.
    *
    * Scale shape: the rank frontier is SPARSE — nodes keep exact rank 0
    * until a walk reaches them, and integer floor-div keeps far nodes at
    * exact 0 — so each iteration joins only the nonzero-rank frontier
    * (broadcast; bounded by the k-hop neighborhood) against edges cached
    * pre-partitioned on the source key. The zero-rank filter is EXACT
    * sparsity, not an approximation: dropped nodes contribute
    * `0 div od = 0`. A one-row zero contribution for `source` flows
    * through the same aggregation so the restart mass survives even when
    * no walk returns to the source; the source row is additionally kept
    * through the sparsity filter unconditionally, so even the degenerate
    * `dampingPct = 100` case (restart base 0) stays anchored instead of
    * decaying to an empty frame.
    *
    * BROADCAST THRESHOLD — same contract as [[pageRank]]'s
    * `broadcastRanks`: with `broadcastFrontier = true` (default) the
    * nonzero-rank frontier is force-broadcast each iteration. The
    * scaladoc bound — the k-hop neighborhood — is O(V) by hop 3-4 on a
    * power-law graph, so at 100× scale a forced broadcast is a
    * driver/executor OOM, not a slowdown. For such graphs pass
    * `broadcastFrontier = false`: edges stay cached pre-partitioned on
    * the SOURCE key, the share join is co-partitioned (the O(E) side
    * never re-exchanges — spec-asserted on the forced plan; only the
    * O(F) frontier shuffles into place), and each iteration costs that
    * one O(F) exchange plus the O(E) contribution shuffle — the Pregel
    * superstep shape, linear and OOM-free. */
  def personalizedPageRank(edges: DataFrame, src: String, dst: String,
      source: Long, iters: Int = 4, dampingPct: Int = 85,
      scale: Long = 1000000000000L,
      broadcastFrontier: Boolean = true): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.filter(col(src).isNotNull && col(dst).isNotNull)
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = e.groupBy(col("u").as("srcn")).agg(count(lit(1)).as("outdeg"))
      .transform(graft.core.Checkpoints.truncate)
    val eo = e.repartition(col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = (100L - dampingPct) * scale / 100L
    val srcZero = Seq((source, 0L)).toDF("node", "c")
    var ranks = Seq((source, scale)).toDF("node", "rank")
    (1 to iters).foreach { _ =>
      val shares = ranks.join(out, ranks("node") === out("srcn"))
        .select(col("srcn"), expr("rank div outdeg").as("share"))
      val sharesSide = if (broadcastFrontier) broadcast(shares) else shares
      val contribs = eo.join(sharesSide, eo("u") === shares("srcn"))
        .select(col("v").as("node"), col("share").as("c"))
        .unionByName(srcZero)
      ranks = contribs.groupBy("node").agg(sum("c").as("cs"))
        .select(col("node"),
          (when(col("node") === source, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampingPct * cs) div 100")).as("rank"))
        .filter(col("rank") =!= 0L || col("node") === lit(source))
        .transform(graft.core.Checkpoints.truncate)
    }
    e.unpersist(); eo.unpersist()
    ranks
  }

  /** Level-synchronous single-source BFS: `(node, hop)` for every node
    * reachable from `source` within `maxHops` (min-hop distance — level
    * order IS minimality, so the result is deterministic with no
    * tie-breaking). Per hop: the O(F)-row frontier joins the cached edge
    * list pre-partitioned on the SOURCE key (the O(E) side never
    * re-exchanges — only the frontier shuffles into place), one
    * distinct, one anti-join against the visited set; each round is
    * lineage-truncated like [[pageRank]]'s, and the loop exits early on
    * an empty frontier (the driver-side count is the standard Pregel
    * termination probe, O(1) rows). `q_bfs_hops` checks the result
    * against a DuckDB recursive-CTE min-distance twin. */
  def bfsHops(edges: DataFrame, src: String, dst: String, source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.filter(col(src).isNotNull && col(dst).isNotNull)
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .distinct()
      .repartition(col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = Seq((source, 0)).toDF("node", "hop")
    var frontier = visited
    var hop = 0
    var frontierSize = 1L
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val next = e.join(frontier.select(col("node").as("u")), Seq("u"))
        .select(col("v").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .transform(graft.core.Checkpoints.truncate)
      frontierSize = next.count()
      visited = visited.unionByName(next).transform(graft.core.Checkpoints.truncate)
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** Harmonic centrality from a pinned seed set, via MULTI-SOURCE
    * level-synchronous BFS with a bitmask frontier: all `sources` (≤ 64)
    * explore in ONE propagation loop — per node the visited state is a
    * single long whose bit `i` is set once seed `i` has reached it, so the
    * per-hop work is one frontier⋈edges join + one `bit_or` aggregate
    * regardless of seed count (64× cheaper than per-seed BFS). Newly set
    * bits at hop `h` contribute `popcount / h` to the node's harmonic sum
    * `h(v) = Σ_{seeds s ≠ v} 1 / d(s, v)` (unreachable seeds contribute
    * 0 — the property harmonic centrality has and closeness lacks).
    *
    * Scale shape mirrors [[bfsHops]]: edges cached pre-partitioned on the
    * source key, O(F) frontier shuffles into place, O(1)-row driver
    * termination probe, lineage truncated per round. Returns the top-`k`
    * nodes: `(node, n_seeds, harmonic)`, ranked `(harmonic desc, node)` on
    * the 6-dp-rounded sum so the cut is engine-reproducible. */
  def harmonicCentrality(edges: DataFrame, src: String, dst: String,
      sources: Seq[Long], maxHops: Int, k: Int): DataFrame = {
    require(sources.nonEmpty && sources.size <= 64, "at most 64 seeds per mask")
    require(sources.distinct.size == sources.size, "seeds must be distinct")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.filter(col(src).isNotNull && col(dst).isNotNull)
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .distinct()
      .repartition(col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = sources.zipWithIndex
      .map { case (s, i) => (s, 1L << i) }
      .toDF("node", "mask")
    var frontier = visited
    val contribs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var hop = 0
    var frontierSize = sources.size.toLong
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val prop = e
        .join(frontier.select(col("node").as("u"), col("mask").as("fm")), Seq("u"))
        .groupBy(col("v").as("node"))
        .agg(expr("bit_or(fm)").as("pm"))
      val merged = visited.join(prop, Seq("node"), "full_outer")
        .select(col("node"),
          coalesce(col("mask"), lit(0L)).as("old"),
          coalesce(col("pm"), lit(0L)).as("pm"))
        .withColumn("nw", expr("pm & ~old"))
        .transform(graft.core.Checkpoints.truncate)
      contribs += merged.filter(col("nw") =!= 0L)
        .select(col("node"),
          (expr("bit_count(nw)").cast("double") / hop).as("inv"),
          expr("bit_count(nw)").cast("long").as("cnt"))
      frontier = merged.filter(col("nw") =!= 0L)
        .select(col("node"), col("nw").as("mask"))
      frontierSize = frontier.count()
      visited = merged.select(col("node"), expr("old | pm").as("mask"))
    }
    e.unpersist()
    if (contribs.isEmpty) return Seq.empty[(Long, Long, Double)]
      .toDF("node", "n_seeds", "harmonic")
    contribs.reduce(_ unionByName _)
      .groupBy("node")
      .agg(sum(col("cnt")).as("n_seeds"), round(sum(col("inv")), 6).as("harmonic"))
      .orderBy(col("harmonic").desc, col("node").asc)
      .limit(k)
  }

  /** Co-occurrence edge list: items sharing a basket become edges (a<b,
    * distinct). The standard projection of a bipartite basket-item table
    * onto items; one self-join per basket key.
    *
    * Skew guard: the self-join's output is quadratic in basket size, so a
    * single mega-basket (one viral order, one catch-all session key) at
    * 100× scale becomes one quadratic straggler task. `maxBasketSize > 0`
    * caps each basket to its `maxBasketSize` smallest items BEFORE the
    * join — a deterministic truncation (ascending item order) costing one
    * row_number over the same key partitioning the distinct already
    * shuffled on, bounding every task at O(cap²). 0 (the default) keeps
    * the exact projection — TPC-H baskets are ≤ 7 items, so the shipped
    * graph queries are unchanged. */
  def cooccurrenceEdges(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 0): DataFrame = {
    require(maxBasketSize >= 0, "maxBasketSize must be >= 0 (0 = unlimited)")
    val distinctBase = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__k"), col(itemCol).as("__i")).distinct()
    val base =
      if (maxBasketSize == 0) distinctBase
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__k").orderBy("__i")
        distinctBase.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= maxBasketSize).drop("__rn")
      }
    base.join(base.withColumnRenamed("__i", "__j"), "__k")
      .filter(col("__i") < col("__j"))
      .select(col("__i").as("a"), col("__j").as("b")).distinct()
  }

  /** Adamic-Adar link prediction over an undirected `a < b` edge list:
    * for every NON-adjacent pair `(u, v)` with at least `minCommon` common
    * neighbors, `score = Σ_z 1/ln(deg z)` over the common neighbors z —
    * the classic "low-degree mutual friends predict a future edge" score.
    *
    * Shape: two-hop wedge join through the midpoint z (Σ deg(z)² pairs —
    * bounded by the same degree profile the triangle/k-core family
    * handles; feed [[cooccurrenceEdges]] with a basket cap if a hub would
    * dominate), minus existing edges via left-anti. Determinism: `ln` is
    * [[graft.functions.DetMath.lnPosInt]] over the exact integer degree,
    * the per-pair sum quantizes `1/ln` to exact nano-longs, and the top-k
    * cut orders by the EXACT long score (desc, then u, v). Returns
    * `(u, v, n_common, aa_score)`.
    *
    * `maxDegree` (0 = unlimited) is the 100 TB dial on the deg² blow-up:
    * midpoints with more than `maxDegree` neighbors are EXCLUDED from
    * wedge generation entirely (the [[cooccurrenceEdges]] basket-cap
    * discipline). The bias is documented and one-sided: capped output is
    * a subset of the uncapped pair set with scores ≤ the uncapped scores
    * — and it is the principled subset, because a hub contributes only
    * `1/ln(deg)` → 0 per pair while costing deg² wedges. Deterministic:
    * the cap is a pure degree threshold, not a sample. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 2, k: Int = 20, maxDegree: Int = 0): DataFrame = {
    import graft.functions.DetMath.lnPosInt
    require(maxDegree >= 0, "maxDegree must be >= 0 (0 = unlimited)")
    val e = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    // Midpoint weight floor(1/ln(deg)·1e9 + 0.5) attaches BEFORE the wedge
    // join (the weighted side is Σdeg rows, so the weight never joins
    // against the Σdeg² wedge set), and the wedge join itself distributes
    // by midpoint key — a row-local per-midpoint pair explosion was tried
    // and REGRESSED (22.5 s → 33 s): it concentrates each hub's deg² pair
    // generation in one task, where the join spreads it. deg >= 2 for any
    // midpoint, so ln(deg) >= ln 2 > 0.
    val withW = sym.groupBy(col("a").as("__z")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= 2)
      .filter(if (maxDegree == 0) lit(true) else col("__d") <= maxDegree)
      .select(col("__z"),
        floor(lit(1.0) / lnPosInt(col("__d")) * lit(1e9) + lit(0.5)).as("__w"))
    val symW = sym.select(col("a").as("__z"), col("b").as("__u"))
      .join(withW, "__z")
    val wedges = symW
      .join(sym.select(col("a").as("__z"), col("b").as("__v")), "__z")
      .filter(col("__u") < col("__v"))
    val scored = wedges
      .groupBy(col("__u"), col("__v"))
      .agg(count(lit(1)).as("n_common"), sum("__w").as("__q"))
      .filter(col("n_common") >= minCommon)
      .join(e, col("__u") === col("a") && col("__v") === col("b"), "left_anti")
    scored
      .orderBy(col("__q").desc, col("__u").asc, col("__v").asc)
      .limit(k)
      .select(col("__u").as("u"), col("__v").as("v"), col("n_common"),
        (col("__q").cast("double") / lit(1e9)).as("aa_score"))
  }

  /** Newman modularity of a GIVEN node partition over an undirected graph
    * (Newman & Girvan 2004): `Q = Σ_c [ m_c/m − (D_c/2m)² ]` with `m` the
    * edge count, `m_c` the intra-community edge count and `D_c` the total
    * degree of community `c`. Rewritten over exact integers as
    * `Q = (4m·Σm_c − ΣD_c²) / 4m²` — every sum is an integer aggregated
    * in `decimal(38,0)` (merge-order-proof), and only the final single
    * division is floating point, so the value is bit-stable across
    * engines and partitionings.
    *
    * `labels(nodeCol, labelCol)` assigns communities; edges keep counting
    * toward `m` even if an endpoint is unlabeled (the classic definition
    * over the full graph — an unlabeled node just belongs to no
    * community). Shape: canonicalize, two keyed joins of the edge list
    * against the label frame (both shuffle joins at scale; AQE broadcasts
    * when the label frame fits), one degree aggregation, two label-keyed
    * aggregations — no step exceeds O(E) rows. Returns one row
    * `(n_edges, n_communities, modularity)`. */
  def modularity(edges: DataFrame, src: String, dst: String,
      labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lab = labels.select(col(nodeCol).as("__n"), col(labelCol).as("__c"))
      .filter(col("__n").isNotNull && col("__c").isNotNull).distinct()
    val dec = "decimal(38,0)"
    // intra-community edges per label: both endpoints in the same community
    val intra = canon
      .join(lab.select(col("__n").as("a"), col("__c").as("__ca")), "a")
      .join(lab.select(col("__n").as("b"), col("__c").as("__cb")), "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__mc"))
    // community degree totals from the degree frame (never the edge list)
    val degC = degrees(canon)
      .join(lab.withColumnRenamed("__n", "node"), "node")
      .groupBy("__c").agg(sum("degree").as("__dc"))
    val per = degC.join(intra, Seq("__c"), "left")
      .select(col("__c"), coalesce(col("__mc"), lit(0L)).as("__mc"), col("__dc"))
    val m = canon.agg(count(lit(1)).as("n_edges"))
    val agg = per.agg(
      count(lit(1)).as("n_communities"),
      sum(col("__mc").cast(dec)).as("__sm"),
      sum((col("__dc").cast(dec) * col("__dc").cast(dec))).as("__sd2"))
    val out = m.crossJoin(agg).select(
      col("n_edges"), col("n_communities"),
      ((lit(4).cast(dec) * col("n_edges").cast(dec) * col("__sm") - col("__sd2"))
        .cast("double")
        / (lit(4.0) * col("n_edges").cast("double") * col("n_edges").cast("double")))
        .as("modularity"))
    // eager one-row truncation so canon can be released immediately
    val res = out.transform(graft.core.Checkpoints.truncate)
    canon.unpersist()
    res
  }

  /** Triangle corner enumeration via degree-ordered orientation: every
    * triangle appears EXACTLY once as `(u, v, w)` where `(u, v)` is the
    * edge between its two lowest-rank corners and `w` their common
    * out-neighbor (found by a row-local `array_intersect` against the
    * broadcast oriented adjacency — the same O(Σ outdeg·log) shape that
    * took [[triangleStats]] from 12.8 s to sub-second; no wedge join is
    * ever materialized). Input must be canonical `a < b` distinct edges
    * with long ids.
    *
    * `broadcastAdjacency = false` drops the broadcast HINT (it does not
    * forbid broadcasting): the adjacency side becomes an ordinary keyed
    * join input, so Spark shuffle-joins it when its post-shuffle stats
    * exceed the auto-broadcast threshold — two keyed exchanges instead of
    * an executor OOM on a graph whose O(E) adjacency outgrows memory —
    * while AQE still upgrades to broadcast when it genuinely fits. */
  private def triangleCorners(canon: DataFrame,
      broadcastAdjacency: Boolean = true,
      rankedOpt: Option[DataFrame] = None): DataFrame = {
    // any total order keeps the orientation acyclic, so iterative callers
    // (k-truss) pass the INITIAL degree ranking once instead of re-ranking
    // every shrinking round
    val ranked = rankedOpt.getOrElse {
      val deg = degrees(canon)
      deg.select(col("node"), struct(col("degree"), col("node")).as("rank"))
    }
    val oriented = canon
      .join(ranked.withColumnRenamed("node", "a").withColumnRenamed("rank", "ra"), "a")
      .join(ranked.withColumnRenamed("node", "b").withColumnRenamed("rank", "rb"), "b")
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"))
    val adjBase = oriented.groupBy(col("u").as("node"))
      .agg(collect_list(col("v").cast("long")).as("nbrs"))
    val adj = if (broadcastAdjacency) broadcast(adjBase) else adjBase
    val empty = array().cast("array<long>")
    oriented
      .join(adj.select(col("node").as("u"), col("nbrs").as("nu")), Seq("u"), "left")
      .join(adj.select(col("node").as("v"), col("nbrs").as("nv")), Seq("v"), "left")
      .select(col("u"), col("v"),
        explode(array_intersect(coalesce(col("nu"), empty), coalesce(col("nv"), empty)))
          .as("w"))
  }

  /** The three canonical undirected edges of each triangle from
    * [[triangleCorners]], as `(a, b)` rows with `a < b`. */
  private def triangleEdgeIncidence(canon: DataFrame,
      rankedOpt: Option[DataFrame] = None,
      broadcastAdjacency: Boolean = true): DataFrame =
    triangleCorners(canon, broadcastAdjacency, rankedOpt)
      .select(explode(array(
        struct(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"), greatest(col("v"), col("w")).as("b"))))
        .as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))

  /** Local clustering coefficient per node: `2·T(v) / (d(v)·(d(v)−1))`
    * with T(v) = triangles through v — "how clique-like is this node's
    * neighborhood". Triangles enumerate once each via the `a<b<c` wedge
    * join (edges (a,b),(a,c) with b<c, closed by (b,c)), then explode to
    * the three corners; the quadratic term is Σ deg², the same bound as
    * [[adamicAdar]]. cc derives from exact integer counts in one pinned
    * division. Returns the top-`k` rows `(node, degree, n_triangles,
    * clustering_coeff)` among nodes with `degree >= minDegree`, ordered
    * by (cc desc, node asc) — cc is one pinned division of exact integers,
    * so the ordering replays identically in any engine.
    * `broadcastAdjacency = false` takes the shuffle-join adjacency path of
    * [[triangleCorners]] for graphs whose adjacency outgrows memory. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String,
      minDegree: Int = 2, k: Int = 20,
      broadcastAdjacency: Boolean = true): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
    val perNode = triangleCorners(e, broadcastAdjacency)
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.filter(col("degree") >= minDegree)
      .join(perNode, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering_coeff",
        (col("n_triangles") * 2).cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double"))
      .orderBy(col("clustering_coeff").desc, col("node").asc)
      .limit(k)
      .select(col("node"), col("degree"), col("n_triangles"), col("clustering_coeff"))
  }

  /** k-truss decomposition: iteratively drop edges supported by fewer than
    * `k − 2` triangles until a fixpoint — the standard "community core
    * stricter than k-core" (every surviving edge closes ≥ k−2 triangles
    * with surviving edges). Each round is one oriented wedge enumeration
    * (`a<b<c`, closed by a semi-join — the same Σ deg² shape as
    * [[clusteringCoefficient]]) plus a support count; rounds needed is the
    * peeling depth (small on co-occurrence graphs — near-clique overlap
    * collapses in 1–3 sweeps). Lineage truncates per round; monotone edge
    * count gives the convergence test (edges only ever leave). Returns the
    * surviving `(a, b, support)` edges.
    * `broadcastAdjacency = false` takes the shuffle-join adjacency path of
    * [[triangleCorners]] in every peeling round. */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 20, broadcastAdjacency: Boolean = true): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .distinct()
      .transform(graft.core.Checkpoints.truncate)
    var nEdges = e.count()
    // rank once on the initial graph (a total order stays acyclic on every
    // peeled subgraph) and keep it cached across rounds
    val ranked = degrees(e)
      .select(col("node"), struct(col("degree"), col("node")).as("rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = nEdges == 0L
    while (iter < maxIter && !converged) {
      val support = triangleEdgeIncidence(e, Some(ranked), broadcastAdjacency)
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
      val next = e.join(support, Seq("a", "b"))
        .filter(col("support") >= k - 2)
        .transform(graft.core.Checkpoints.truncate)
      val nNext = next.count()
      converged = nNext == nEdges
      e = next.select(col("a"), col("b"))
      nEdges = nNext
      iter += 1
    }
    val out =
      if (nEdges == 0L)
        Seq.empty[(Long, Long, Long)].toDF("a", "b", "support")
      else
        // one final support pass on the converged edge set, materialized
        // so the rank cache can be released before returning
        triangleEdgeIncidence(e, Some(ranked), broadcastAdjacency)
          .groupBy("a", "b").agg(count(lit(1)).as("support"))
          .transform(graft.core.Checkpoints.truncate)
    ranked.unpersist()
    out
  }

  /** HITS (Kleinberg hubs & authorities) on a directed/bipartite edge list,
    * integer-exact so the fixed-iteration scores reproduce bit-for-bit in
    * any engine (the same contract as [[pageRank]]).
    *
    * Per iteration: `auth'(v) = Σ_{u→v} hub(u)` then L1-normalize to total
    * `scale`, then `hub'(u) = Σ_{u→v} auth(v)` normalized likewise. Sums
    * are exact BIGINT; each normalization is one `DECIMAL(38,0)` multiply
    * followed by integral `div` (floor for the non-negative operands here),
    * so no float enters the loop and addition order cannot matter. L1
    * (not the textbook L2) keeps the arithmetic closed over integers; the
    * ranking it induces is identical because normalization is a positive
    * per-side constant.
    *
    * Scale shape: the O(E) edge frame is cached once, pre-partitioned on
    * the side each aggregation groups by; per iteration the O(N) score
    * frame broadcasts into it (scores are ≤ |nodes| rows — the same
    * broadcast-threshold reasoning as [[pageRank]]'s scaladoc), the
    * normalizer is a one-row aggregate, and lineage truncates per round.
    * Nodes with no in-edges (resp. out-edges) hold authority (resp. hub)
    * score 0, matching the algebra.
    *
    * `broadcastScores = false` is the beyond-the-threshold fallback (the
    * [[pageRank]] Pregel-twin discipline): the per-iteration score joins
    * drop the broadcast hint and become ordinary keyed joins — the O(N)
    * score frame shuffles on its node key instead of materializing on
    * every executor, so a graph whose score frame outgrows the broadcast
    * limit degrades to two exchanges per iteration instead of dying. */
  def hits(edges: DataFrame, src: String, dst: String, iters: Int = 3,
      scale: Long = 1000000000000L,
      broadcastScores: Boolean = true): DataFrame = {
    require(iters >= 1)
    val e = edges
      .filter(col(src).isNotNull && col(dst).isNotNull)
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hubs = e.select(col("u")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHubs = hubs.count()
    require(nHubs > 0, "empty graph")
    // L1-normalize a (node, s) frame to total `scale`: exact decimal
    // product, integral div (both engines floor non-negatives identically)
    def normalized(scores: DataFrame): DataFrame = {
      val total = scores.agg(sum(col("s")).cast("decimal(38,0)").as("t"))
      scores.crossJoin(broadcast(total))
        .select(col("node"),
          expr(s"cast(cast(s as decimal(38,0)) * $scale as decimal(38,0)) div t")
            .as("s"))
        .transform(graft.core.Checkpoints.truncate)
    }
    val maybeBc = (d: DataFrame) => if (broadcastScores) broadcast(d) else d
    var hub = hubs.select(col("u").as("node"), lit(scale / nHubs).as("s"))
    var auth: DataFrame = null
    (1 to iters).foreach { _ =>
      auth = normalized(
        e.join(maybeBc(hub), e("u") === hub("node"))
          .groupBy(col("v").as("node")).agg(sum(col("s")).as("s")))
      hub = normalized(
        e.join(maybeBc(auth), e("v") === auth("node"))
          .groupBy(col("u").as("node")).agg(sum(col("s")).as("s")))
    }
    val out = hub.select(lit("hub").as("role"), col("node"), col("s").as("score"))
      .unionByName(auth.select(lit("authority").as("role"), col("node"),
        col("s").as("score")))
      .transform(graft.core.Checkpoints.truncate) // eager: safe to unpersist
    e.unpersist(); hubs.unpersist()
    out
  }
}
