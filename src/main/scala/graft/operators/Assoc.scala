package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the co-purchase / co-occurrence
  * rule extractor (Agrawal & Srikant's Apriori setting, restricted to
  * the pairwise rules that dominate practical use: "baskets with A
  * also contain B").
  *
  * Everything reduces to exact integer supports before the three
  * fixed-shape ratio columns, so results are engine-exact; the pair
  * fan-out is bounded by the per-basket DISTINCT item count — a
  * CHECKED contract, because one pathological basket (a crawler cart
  * with 10⁵ items) would otherwise explode C(n,2) quietly inside a
  * self-join.
  */
object Assoc {

  /** Pairwise association rules over (basket, item) rows:
    *
    *   support_ab = |{baskets ⊇ {a,b}}|          (≥ minSupport)
    *   conf_a_b   = support_ab / support_a       (P(b | a))
    *   conf_b_a   = support_ab / support_b
    *   lift       = n·support_ab / (support_a·support_b)
    *
    * Shape: ONE distinct projection collapses multi-quantity lines
    * (a basket holding item twice is still one co-occurrence), the
    * per-basket distinct-item bound is CHECKED against
    * `maxItemsPerBasket` (the [[Contracts]] fail-before-execute
    * discipline — C(n,2) lives inside the self-join below), pairs come
    * from a basket-keyed self-equi-join with `itemA < itemB` (each
    * unordered pair exactly once; candidates bounded by Σ C(basket,2),
    * never |items|²), and item/pair supports are two map-side-combining
    * hash aggregations. The basket total rides a one-row cross join
    * (the trailingActives discipline, no eager collect). All three
    * ratios are single divisions of exact int64 operands — DuckDB
    * replays them bit-for-bit.
    * Output: (item_a, item_b, support_ab, support_a, support_b,
    * conf_a_b, conf_b_a, lift). */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long,
                maxItemsPerBasket: Long = 100000L): DataFrame = {
    require(minSupport >= 1, s"pairRules needs minSupport >= 1, got $minSupport")
    // basket-partitioned dedup in ONE exchange (subset-key clustering),
    // checkpointed so the pair self-join on __b below runs co-partitioned
    // and exchange-free over two reads of the same RDD (guide §2.4)
    val d = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__i").isNotNull && col("__b").isNotNull)
      .repartition(col("__b")).dropDuplicates("__b", "__i")
      .localCheckpoint()
    Contracts.boundedPerKey(d, "__b", maxItemsPerBasket, "pairRules",
      "distinct items", "Split or cap pathological baskets before mining " +
        "— the pair join is C(n,2) per basket.",
      contract = "per-basket pair fan-out")
    val itemSupport = d.groupBy(col("__i"))
      .agg(count(lit(1)).as("__s"))
    val nBaskets = d.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val pairs = pairCounts(d).where(col("support_ab") >= minSupport)
    assemble(itemSupport, pairs, nBaskets)
  }

  /** INCREMENTAL [[pairRules]] for an APPEND-ONLY basket stream: fold a
    * batch of NEW baskets into previously persisted supports in
    * O(delta), provably equal to the full rebuild (the ppJoinDelta /
    * q157 discipline). Sound because every statistic is ADDITIVE over
    * disjoint basket sets — item supports, pair supports and the
    * basket total all just sum — which is exactly what a mutable
    * corpus would break (the caller contract: `newBaskets` basket ids
    * are UNSEEN; an updated old basket needs the rebuild path).
    * `minSupport` applies AFTER the fold, so a pair that crossed the
    * threshold only with the new batch's help appears — persist the
    * UNFILTERED pair supports between runs for that reason.
    * Inputs: `prevItems` (item, support), `prevPairs`
    * (item_a, item_b, support_ab) both UNFILTERED, `prevNBaskets`.
    * Output: the [[pairRules]] shape over the union corpus. */
  def pairRulesDelta(prevItems: DataFrame, prevPairs: DataFrame,
                     prevNBaskets: Long, newBaskets: DataFrame,
                     basketCol: String, itemCol: String,
                     minSupport: Long,
                     maxItemsPerBasket: Long = 100000L): DataFrame = {
    require(minSupport >= 1 && prevNBaskets >= 0,
      s"pairRulesDelta needs minSupport >= 1 and prevNBaskets >= 0")
    val d = newBaskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__i").isNotNull && col("__b").isNotNull)
      .repartition(col("__b")).dropDuplicates("__b", "__i")
      .localCheckpoint()
    Contracts.boundedPerKey(d, "__b", maxItemsPerBasket, "pairRulesDelta",
      "distinct items", "Split or cap pathological baskets before mining " +
        "— the pair join is C(n,2) per basket.",
      contract = "per-basket pair fan-out")
    val items = prevItems.toDF("__i", "__s")
      .unionByName(d.groupBy(col("__i")).agg(count(lit(1)).as("__s")))
      .groupBy(col("__i")).agg(sum(col("__s")).as("__s"))
    val pairs = prevPairs.toDF("item_a", "item_b", "support_ab")
      .unionByName(pairCounts(d))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("support_ab")).as("support_ab"))
      .where(col("support_ab") >= minSupport)
    val nb = d.select(col("__b")).distinct()
      .agg((count(lit(1)) + lit(prevNBaskets)).as("__n"))
    assemble(items, pairs, nb)
  }

  /** Serve the [[pairRules]] readout directly from persisted
    * UNFILTERED supports (the [[pairRulesDelta]] state — item
    * supports, pair supports, basket total) without touching a single
    * basket row: the support tables already hold every exact integer
    * the three ratio columns need, so a live co-purchase monitor
    * answers from state in one pair-sized join pass. `minSupport`
    * applies here, at read time — the state stays unfiltered so a
    * pair can cross the threshold later (the [[pairRulesDelta]]
    * persistence contract). */
  def rulesFromSupports(items: DataFrame, pairs: DataFrame,
                        nBaskets: Long, minSupport: Long): DataFrame = {
    require(minSupport >= 1 && nBaskets >= 0,
      s"rulesFromSupports needs minSupport >= 1 and nBaskets >= 0")
    val nb = items.sparkSession.range(1)
      .select(lit(nBaskets).as("__n"))
    assemble(items.toDF("__i", "__s"),
      pairs.toDF("item_a", "item_b", "support_ab")
        .where(col("support_ab") >= minSupport), nb)
  }

  /** Unfiltered (item, support) / (item_a, item_b, support_ab) tables
    * of a basket set — what [[pairRulesDelta]] persists between runs. */
  def itemSupports(df: DataFrame, basketCol: String,
                   itemCol: String): DataFrame =
    df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__i").isNotNull && col("__b").isNotNull)
      .distinct()
      .groupBy(col("__i")).agg(count(lit(1)).as("__s"))

  def pairSupports(df: DataFrame, basketCol: String,
                   itemCol: String): DataFrame =
    // callers that also need item supports pass a basket-partitioned
    // checkpointed distinct (the q214 shape) — the inner distinct and
    // the self-join then reuse that layout exchange-free; an internal
    // checkpoint here would double-materialize those callers
    pairCounts(df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__i").isNotNull && col("__b").isNotNull)
      .distinct())

  private def pairCounts(d: DataFrame): DataFrame =
    d.as("l").join(d.as("r"),
        col("l.__b") === col("r.__b") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("support_ab"))

  private def assemble(itemSupport: DataFrame, pairs: DataFrame,
                       nBaskets: DataFrame): DataFrame =
    pairs
      .join(itemSupport.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__s", "support_a"), Seq("item_a"))
      .join(itemSupport.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__s", "support_b"), Seq("item_b"))
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("support_ab"),
        col("support_a"), col("support_b"),
        (col("support_ab").cast("double") / col("support_a").cast("double"))
          .as("conf_a_b"),
        (col("support_ab").cast("double") / col("support_b").cast("double"))
          .as("conf_b_a"),
        ((col("__n") * col("support_ab")).cast("double")
          / (col("support_a") * col("support_b")).cast("double")).as("lift"))
}
