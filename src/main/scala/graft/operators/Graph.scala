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
  def triangleStats(edges: DataFrame, src: String, dst: String): DataFrame = {
    val canon = canonicalEdges(edges, src, dst)
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
    // wedges from each pivot's out-edges (out-degree ≤ O(sqrt(E)) by
    // orientation); rv-order on the pair avoids double-building (v,w)/(w,v)
    val e1 = oriented.select(col("u"), col("v").as("x"), col("rv").as("rx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("rv").as("ry"))
    val wedges = e1.join(e2, "u").filter(col("rx") < col("ry"))
      .select(col("x").as("u"), col("y").as("v"))
    val closing = oriented.select("u", "v")
    val tri = wedges.join(closing, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val summary = canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        sum(col("degree") * (col("degree") - 1) / 2).as("n_wedges")))
    summary.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges").cast("long").as("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          col("n_triangles") * 3.0 / col("n_wedges")).otherwise(lit(0.0))
          .as("global_clustering"))
  }

  /** Co-occurrence edge list: items sharing a basket become edges (a<b,
    * distinct). The standard projection of a bipartite basket-item table
    * onto items; one self-join per basket key. */
  def cooccurrenceEdges(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val base = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__k"), col(itemCol).as("__i")).distinct()
    base.join(base.withColumnRenamed("__i", "__j"), "__k")
      .filter(col("__i") < col("__j"))
      .select(col("__i").as("a"), col("__j").as("b")).distinct()
  }
}
