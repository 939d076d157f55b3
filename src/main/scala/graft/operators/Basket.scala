package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining (support / confidence / lift for item
  * pairs co-occurring in a basket) — the A-Priori 2-itemset pass, shaped
  * for a fact table that is the biggest thing in the warehouse.
  *
  * The naive formulation self-joins the (basket, item) relation on the
  * basket key — at 100 TB that join's output is quadratic in basket size
  * and its shuffle dwarfs the input. This implementation instead rolls
  * each basket up to its sorted distinct item array (one shuffle, map-side
  * combinable) and generates the `i < j` pairs ROW-LOCALLY from the array
  * — output bounded by Σ|basket|²/2 with |basket| small and bounded in
  * practice, never by |baskets|² — then counts pairs with a second
  * hash aggregation. Per-item basket counts ride the same rolled-up frame.
  */
object Basket {

  /** All unordered `a < b` pairs of a sorted-distinct array, row-locally:
    * for element i, pair it with every later element. */
  private def pairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), greatest(size(arr) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))

  /** Top-`k` item pairs by co-occurrence count with support, confidence
    * (P(b|a)), and lift. `df` is the (basketCol, itemCol) relation; items
    * of a basket are deduplicated. Ranking is fully deterministic:
    * `(n_ab desc, item_a, item_b)`. Returns
    * `(item_a, item_b, n_ab, n_a, n_b, support, confidence, lift)`. */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String, k: Int): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(array_sort(collect_set(col(itemCol))).as("__items"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = baskets.agg(count(lit(1)).as("__n"))
    val itemCounts = baskets
      .select(explode(col("__items")).as("__item"))
      .groupBy("__item").agg(count(lit(1)).as("__ni"))
    val pairCounts = baskets
      .select(explode(pairs(col("__items"))).as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    // TakeOrderedAndProject, not a global window: every partition keeps its
    // own k candidates and only those move — no single-reducer sort of the
    // full distinct-pair space
    val top = pairCounts
      .orderBy(col("n_ab").desc, col("item_a").asc, col("item_b").asc)
      .limit(k)
    // joins after the top-k cut: k rows against the (small) item-count and
    // one-row basket-count frames
    val out = top
      .join(itemCounts.select(col("__item").as("item_a"), col("__ni").as("n_a")), "item_a")
      .join(itemCounts.select(col("__item").as("item_b"), col("__ni").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("__n"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("__n") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
      // k rows: eagerly materialize (severing the lineage onto the cached
      // baskets) so the MEMORY_AND_DISK block can be released before
      // returning — a long session running many queries must not
      // accumulate operator-private caches (ADVICE r06)
      .localCheckpoint(true)
    baskets.unpersist()
    out
  }

  /** All ordered `a < b < c` triples of a sorted-distinct array,
    * row-locally — the 3-itemset analogue of [[pairs]]. Output per basket
    * is C(|basket|, 3); baskets are small and bounded in practice (cap
    * upstream if a degenerate mega-basket is possible — the same skew
    * argument as [[graft.operators.Graph.cooccurrenceEdges]]). */
  private def triples(arr: Column): Column =
    flatten(flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), greatest(size(arr) - i - 1, lit(0))), (y, j) =>
        transform(slice(arr, i + j + lit(3), greatest(size(arr) - i - j - 2, lit(0))),
          z => struct(x.as("a"), y.as("b"), z.as("c")))))))

  /** Top-`k` item triples by co-occurrence count — the A-Priori 3-itemset
    * pass, same scale shape as [[pairLift]]: one basket rollup, row-local
    * triple generation, one keyed count, TakeOrderedAndProject cut.
    * Deterministic ranking `(n_abc desc, item_a, item_b, item_c)`.
    * Returns `(item_a, item_b, item_c, n_abc, support)`. */
  def tripleCounts(df: DataFrame, basketCol: String, itemCol: String, k: Int): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(array_sort(collect_set(col(itemCol))).as("__items"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = baskets.agg(count(lit(1)).as("__n"))
    val counts = baskets
      .select(explode(triples(col("__items"))).as("__t"))
      .groupBy(col("__t.a").as("item_a"), col("__t.b").as("item_b"),
        col("__t.c").as("item_c"))
      .agg(count(lit(1)).as("n_abc"))
    val out = counts
      .orderBy(col("n_abc").desc, col("item_a").asc, col("item_b").asc, col("item_c").asc)
      .limit(k)
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("item_c"), col("n_abc"),
        round(col("n_abc").cast("double") / col("__n"), 6).as("support"))
      .localCheckpoint(true)
    baskets.unpersist()
    out
  }
}
