package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — "customers who bought X also
  * bought Y", the e-commerce analytics head the reference's product mart
  * feeds (README Looker layer). Emits item pairs with their joint basket
  * count and lift (observed co-occurrence vs independence).
  *
  * Scale shape: the self-join key is the BASKET id, so the fan-out per
  * basket is bounded by basket size squared (TPC-H orders cap at 7–13
  * items), never by catalog or order count — the join shuffles both sides
  * on the basket key and emits ≤ s·(s−1)/2 pairs per basket. Item
  * marginals are a separate partial agg, broadcast back onto the
  * (much smaller) pair frame. Degenerate mega-baskets (a "basket" that is
  * really a feed) must be capped upstream; `maxBasketSize` guards that
  * contract with a loud per-basket filter, not silent quadratic blowup.
  *
  * Lift = (n_ab · N) / (n_a · n_b): exact long products (≤ ~2^60 for any
  * realistic count frame), ONE double division — deterministic everywhere.
  */
object Affinity {

  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   maxBasketSize: Int = 1000): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val bi = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    // over-cap baskets via groupBy partial-agg + anti-join, NOT a window:
    // a window count on the basket key would single-reduce exactly the
    // degenerate basket the cap exists to contain (same reasoning as
    // NGramJaccard's doc-frequency cap)
    val big = OpCache.cache(bi.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBasketSize)
      .select(col("__b")))
    // cached: feeds the item marginals, the basket count AND both pair-
    // join sides — uncached, each consumer re-runs the distinct shuffle
    // and the anti-join (same multi-consumer reasoning as WinnowDedup)
    val sized = OpCache.cache(bi.join(big, Seq("__b"), "left_anti"))
    val itemCounts = OpCache.cache(
      sized.groupBy(col("__i")).agg(count(lit(1)).as("__cnt")))
    val nBaskets = sized.select(countDistinct(col("__b")).as("__nb"))
    val pairs = sized.alias("a").join(sized.alias("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(itemCounts.select(col("__i").as("item_a"), col("__cnt").as("__ca")), "item_a")
      .join(itemCounts.select(col("__i").as("item_b"), col("__cnt").as("__cb")), "item_b")
      .join(broadcast(nBaskets), lit(true))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        col("__ca").as("n_a"), col("__cb").as("n_b"),
        ((col("n_baskets") * col("__nb")).cast("double") /
          (col("__ca") * col("__cb")).cast("double")).as("lift"))
  }
}
