package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining — frequent item PAIRS with
  * support / confidence / lift, the first (and in practice dominant)
  * level of an FP-growth rule miner, as one declarative plan.
  *
  * Scale shape (100 TB of baskets): nothing joins the basket relation
  * to itself. Items collapse to the per-basket DISTINCT item set (one
  * keyed agg; the set is bounded by the item-domain cardinality, not
  * the basket's row count), pairs are generated IN-TASK from each
  * basket's sorted item array (an O(k²) nested transform inside the
  * scan stage — k = items per basket, the quantity a retailer
  * controls), and pair support is one partial-aggregable keyed count.
  * Item supports and the basket total are item-domain-sized /
  * 1-row relations broadcast into the final projection.
  *
  * Confidence and lift are emitted as exact integer fixed-point
  * (×1e6, floor division) so every engine computes identical rows:
  * conf(a→b) = ⌊supp_ab·1e6 / supp_a⌋,
  * lift = ⌊supp_ab·n·1e6 / (supp_a·supp_b)⌋. The lift numerator is
  * long arithmetic — fine through supp ≈ 1e6·√(1e6) scale; past
  * that, pre-divide or move the constant (documented contract, same
  * family as the other 1e6 fixed-point disciplines).
  */
object Association {

  /** Frequent unordered item pairs of co-occurrence support >=
    * `minSupport`. One row per pair (item_a < item_b):
    * (item_a, item_b, supp_a, supp_b, supp_ab, n_baskets,
    * conf_ab_fp, conf_ba_fp, lift_fp).
    */
  def pairRules(baskets: DataFrame, basket: String, item: String,
                minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport $minSupport must be >= 1")
    val bi = baskets.select(col(basket).as("__b"), col(item).as("__i")).distinct()
    val itemSupp = bi.groupBy(col("__i")).agg(count(lit(1)).as("__s"))
    val nBaskets = bi.agg(countDistinct(col("__b")).as("n_baskets"))
    val sets = bi.groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__items"))
    val pairs = sets
      .select(explode(flatten(transform(col("__items"), (a, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))),
          b => struct(a.as("ia"), b.as("ib")))))).as("__p"))
      .groupBy(col("__p.ia").as("item_a"), col("__p.ib").as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
    pairs
      .join(broadcast(itemSupp.select(col("__i").as("item_a"), col("__s").as("supp_a"))), "item_a")
      .join(broadcast(itemSupp.select(col("__i").as("item_b"), col("__s").as("supp_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("supp_a"), col("supp_b"),
        col("supp_ab"), col("n_baskets"),
        expr("supp_ab * 1000000L div supp_a").as("conf_ab_fp"),
        expr("supp_ab * 1000000L div supp_b").as("conf_ba_fp"),
        expr("supp_ab * n_baskets * 1000000L div (supp_a * supp_b)").as("lift_fp"))
  }
}
