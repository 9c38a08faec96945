package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — support / confidence / lift over
  * item pairs, the counting core of apriori (Agrawal & Srikant, VLDB
  * '94). The reference's analytics stack answers "which products sell
  * together" from its order-items table (vivek-neenopal/shopify-etl
  * order_items merge, sql/order_items.sql); this is that analysis as a
  * scale-safe operator.
  *
  * All rule metrics are exact integers (parts-per-million, floor
  * division), so results hash identically across engines and cluster
  * sizes:
  * {{{
  *   lift_ppm    = (10^6 · c_ab · N) div (c_a · c_b)
  *   conf_ab_ppm = (10^6 · c_ab) div c_a        (a ⇒ b)
  *   conf_ba_ppm = (10^6 · c_ab) div c_b        (b ⇒ a)
  * }}}
  * Intermediates are DECIMAL(38,0): exact up to 10³⁸, far past any
  * real corpus (c ≤ N ≤ 10¹⁵ keeps 10⁶·c_ab·N below 10³⁶).
  *
  * 100 TB shape (apriori's frequent-item prune, then ONE pair
  * shuffle):
  *  1. distinct (basket, item) — one shuffle, map-side combined;
  *  2. item counts c_a — an aggregate of (1);
  *  3. items below `minSupport` are pruned BEFORE pair generation via
  *     a broadcast semi-join (c_ab ≤ min(c_a, c_b), so no surviving
  *     pair is lost — the apriori monotonicity argument). The frequent
  *     set is broadcast-sized by construction: at most N/minSupport
  *     items can be frequent.
  *  4. per-basket sorted item arrays, pairs generated ARRAY-SIDE
  *     (transform+slice+flatten, one explode — no basket self-join),
  *     then the single (a, b) count shuffle;
  *  5. marginals re-attach by broadcast — from the FREQUENT-filtered
  *     count table only, never the full item domain: c_ab ≤
  *     min(c_a, c_b) means no pair surviving the support filter can
  *     reference an infrequent item, and the unfiltered table is
  *     unbounded (a web-scale item domain would OOM under a forced
  *     broadcast hint). Top-k is TakeOrderedAndProject (per-partition
  *     heaps, never a global sort).
  * The explode in (4) is quadratic in BASKET size, not corpus size —
  * cap pathological baskets upstream (a 10⁴-item basket is 5·10⁷
  * pairs).
  */
object Association {

  /** Association rules over unordered item pairs (a < b lexically).
    *
    * @param baskets    rows of (basket id, item) — need not be distinct
    * @param basketCol  basket / transaction id column
    * @param itemCol    item column (string-comparable)
    * @param minSupport minimum pair co-occurrence count c_ab (also
    *                   applied as the item-level apriori prune)
    * @param topK       rules kept, by (lift_ppm desc, item_a, item_b)
    * @return (item_a, item_b, cab, ca, cb, n_baskets, lift_ppm,
    *         conf_ab_ppm, conf_ba_ppm)
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, topK: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val b = baskets
      .select(col(basketCol).as("__basket"), col(itemCol).cast("string").as("__item"))
      .where(col("__basket").isNotNull && col("__item").isNotNull)
      .distinct()
      .transform(Materialize.once)

    // N and the item marginals: aggregates of the deduped pair base
    val n = b.agg(count_distinct(col("__basket")).as("n_baskets"))
    val ci = b.groupBy("__item").agg(count(lit(1)).as("__c"))
      .transform(Materialize.once)
    // broadcast-sized by construction (≤ N/minSupport rows) — the
    // ONLY count table that may carry an explicit broadcast hint
    val cif = ci.filter(col("__c") >= minSupport)
    val frequent = cif.select("__item")

    // apriori prune, then per-basket sorted arrays and array-side pairs
    val arrs = b.join(broadcast(frequent), Seq("__item"))
      .groupBy("__basket")
      .agg(sort_array(collect_set(col("__item"))).as("__items"))
    val pairs = arrs
      .select(explode(flatten(expr(
        "transform(__items, (x, i) -> transform(slice(__items, i + 2, size(__items)), y -> struct(x AS a, y AS b)))")))
        .as("__p"))
      .select(col("__p.a").as("item_a"), col("__p.b").as("item_b"))

    // `div` (IntegralDivide) over DECIMAL(38,0): exact integer floor
    // for these all-positive operands in Spark and DuckDB alike
    pairs.groupBy("item_a", "item_b").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minSupport)
      .join(broadcast(cif.select(col("__item").as("item_a"), col("__c").as("ca"))), Seq("item_a"))
      .join(broadcast(cif.select(col("__item").as("item_b"), col("__c").as("cb"))), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("cab"), col("ca"), col("cb"),
        col("n_baskets"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * cab * n_baskets) div (CAST(ca AS DECIMAL(38,0)) * cb)").as("lift_ppm"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * cab) div ca").as("conf_ab_ppm"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * cab) div cb").as("conf_ba_ppm"))
      .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Item–item Jaccard similarity from co-occurrence counts — the
    * "customers who bought X also bought Y" primitive:
    * {{{
    *   jaccard(a,b) = c_ab / (c_a + c_b − c_ab)      (in ppm, floor)
    * }}}
    * Same pipeline as [[rules]] (apriori prune → array-side pairs →
    * one pair shuffle → broadcast marginals), same magnitude story;
    * top-k per LEFT item via the bounded-heap TopKPerKey plan node, so
    * no per-item window sort. Pairs emit symmetrically (a→b and b→a)
    * so every item gets its neighbor list.
    *
    * @return (item, neighbor, cab, ca, cb, jaccard_ppm), the top-k
    *         neighbors per item by (jaccard_ppm desc, neighbor),
    *         totally ordered
    */
  def itemNeighbors(baskets: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1 && k >= 1, s"bad args: $minSupport, $k")
    val b = baskets
      .select(col(basketCol).as("__basket"), col(itemCol).cast("string").as("__item"))
      .where(col("__basket").isNotNull && col("__item").isNotNull)
      .distinct()
      .transform(Materialize.once)
    val ci = b.groupBy("__item").agg(count(lit(1)).as("__c"))
      .transform(Materialize.once)
    // frequent-filtered marginals: the only broadcast-safe count table
    val cif = ci.filter(col("__c") >= minSupport)
    val frequent = cif.select("__item")
    val arrs = b.join(broadcast(frequent), Seq("__item"))
      .groupBy("__basket")
      .agg(sort_array(collect_set(col("__item"))).as("__items"))
    val pairs = arrs
      .select(explode(flatten(expr(
        "transform(__items, (x, i) -> transform(slice(__items, i + 2, size(__items)), y -> struct(x AS a, y AS b)))")))
        .as("__p"))
      .select(col("__p.a").as("item"), col("__p.b").as("neighbor"))
    val sym = pairs.union(pairs.select(col("neighbor").as("item"), col("item").as("neighbor")))
    val scored = sym.groupBy("item", "neighbor").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minSupport)
      .join(broadcast(cif.select(col("__item").as("item"), col("__c").as("ca"))), Seq("item"))
      .join(broadcast(cif.select(col("__item").as("neighbor"), col("__c").as("cb"))), Seq("neighbor"))
      .withColumn("jaccard_ppm", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * cab) div (ca + cb - cab)"))
    ScaleOps.topKPerKey(
        scored.select(col("item"), col("neighbor"), col("cab"), col("ca"),
          col("cb"), col("jaccard_ppm")),
        Seq("item"), Seq(col("jaccard_ppm").desc, col("neighbor").asc), k)
      .orderBy(col("item"), col("jaccard_ppm").desc, col("neighbor"))
  }
}
