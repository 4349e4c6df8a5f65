package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket association mining: frequent item PAIRS and the
 * support / confidence / lift rules they induce, over (basket, item)
 * rows. Extension beyond the reference's aggregations (SURVEY §2.4) —
 * co-occurrence lift is the classic OLAP companion to the corpus
 * collocation PMI already in [[TextOps]], here over relational baskets
 * (orders × brands) instead of token windows.
 *
 * Scale design:
 *  - The pair generation is a SELF-JOIN on the basket key, never a
 *    per-basket `collect_list` + explode of the quadratic pair set
 *    through one row: with B baskets of ≤ m items the shuffle is
 *    O(B·m) rows keyed by basket, and each basket's pairs materialize
 *    inside its own join task.
 *  - The apriori downward-closure prune runs FIRST: an item below
 *    `minItemSupport` baskets can't be in a frequent pair, so the
 *    (small) frequent-item set broadcast-semi-joins both self-join
 *    sides before any pair exists. On a skewed catalog this is the
 *    difference between m² on the long tail and m² on the head only.
 *  - Item supports and the basket total ride along as broadcast
 *    1-row / small frames — no second scan of the input.
 *
 * Determinism: all counts are exact integers; support/confidence/lift
 * are single divisions of BIGINTs, rounded by the caller.
 */
object Association {

  /**
   * Association rules over every frequent unordered item pair
   * `(item_a < item_b)`:
   *
   *  - `n_ab` — baskets containing both,
   *  - `support` — n_ab / n_baskets,
   *  - `conf_a_b` — P(b | a) = n_ab / n_a (and `conf_b_a` symmetric),
   *  - `lift` — P(a,b) / (P(a)·P(b)) = n_ab·n_baskets / (n_a·n_b).
   *
   * Input rows may repeat (a basket listing an item twice counts once:
   * the first step is a distinct on (basket, item)). Pairs below
   * `minPairSupport` baskets are dropped after counting; items below
   * `minItemSupport` are pruned before pairing (downward closure).
   */
  def pairRules(df: DataFrame, basket: String, item: String,
                minItemSupport: Long = 2, minPairSupport: Long = 2): DataFrame = {
    // the item prune is a pure optimization ONLY under downward closure
    // (pair support ≤ item support): with minItemSupport >
    // minPairSupport it would silently drop pairs that meet the pair
    // threshold, so that configuration is rejected rather than lied about
    require(minItemSupport <= minPairSupport,
      s"minItemSupport ($minItemSupport) must be <= minPairSupport " +
        s"($minPairSupport): pruning items above the pair threshold drops " +
        "qualifying pairs")
    // the deduped basket frame feeds FIVE branches (total, item counts,
    // both self-join sides via the prune); persist it or every branch
    // re-scans and re-distincts the input
    val items = graft.core.CacheRegistry.persistTracked(
      df.select(col(basket).as("__basket"), col(item).as("__item"))
        .distinct())
    val nBaskets = items.select(countDistinct(col("__basket")).as("n_baskets"))
    val itemCounts = graft.core.CacheRegistry.persistTracked(
      items.groupBy("__item")
        .agg(count(lit(1)).as("n_item"))
        .filter(col("n_item") >= minItemSupport))
    val frequent = items.join(
      broadcast(itemCounts.select("__item")), Seq("__item"))
    val a = frequent.select(col("__basket"), col("__item").as("item_a"))
    val b = frequent.select(col("__basket"), col("__item").as("item_b"))
    val pairs = a.join(b, Seq("__basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs
      .join(broadcast(itemCounts.select(col("__item").as("item_a"),
        col("n_item").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("__item").as("item_b"),
        col("n_item").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        (col("n_ab").cast("double") / col("n_baskets")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_b_a"),
        (col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a") * col("n_b"))).as("lift"))
  }
}
