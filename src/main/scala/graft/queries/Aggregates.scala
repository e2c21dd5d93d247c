package graft.queries

import graft.Tables
import graft.functions.Aggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2.B.4): hash aggregates, distinct aggs,
  * percentiles, order-sensitive aggs, rollup/cube/grouping sets,
  * typed UDAF. All partial+final (map-side combine) via
  * HashAggregateExec — no driver-side loops.
  */
object Aggregates {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the flagship scan+hash-agg.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Distinct aggregates.
    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Exact interpolated percentiles (DuckDB quantile_cont twin).
    "q_agg_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"))
        .orderBy("l_returnflag")
    }),

    // Approx aggregates with a DERIVED oracle: the sketch values
    // themselves have no DuckDB twin, so the output carries the exact
    // counterparts (oracle-recomputable) plus tolerance-band booleans
    // the oracle predicts as TRUE — HLL and t-digest are deterministic
    // on a given dataset, so the bands hash-match reproducibly while
    // still failing the gate if either sketch drifts out of tolerance.
    "q_agg_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // two scans joined on the 3-row key, NOT one agg: mixing the
      // DISTINCT aggregate with the object-buffer aggregates (HLL,
      // digest) triggers the Expand-based distinct rewrite, which at
      // sf0.1 is ~10× slower than both plans run separately
      val exactDistinct = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      val sketches = li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          median(col("l_quantity")).cast("double").as("exact_med_qty"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .cast("double").as("approx_med"))
      exactDistinct.join(sketches, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"), col("exact_med_qty"),
          (abs(col("approx_orders") - col("exact_orders"))
            <= col("exact_orders") * lit(0.05)).as("cnt_in_band"),
          (abs(col("approx_med") - col("exact_med_qty")) <= lit(1.0)).as("med_in_band"))
        .orderBy("l_returnflag")
    }),

    // Mergeable HLL sketches (DataSketches): per-event-type user
    // sketches merged with hll_union_agg — the partial-aggregation
    // pattern for distinct counts at 100 TB: every shard sketches
    // locally and the merge is a tiny associative union, no re-scan.
    // A user active in several event types makes the union genuinely
    // non-additive. Sketching is deterministic, so the tolerance
    // booleans the oracle predicts TRUE are stable; exact distincts
    // ride along for the oracle to recompute. Same two-scan split as
    // q_agg_approx (countDistinct + object-buffer agg in one agg
    // triggers the Expand distinct rewrite).
    "q_agg_hll_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      val sk = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val perType = exact.join(sk, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_users"))
            <= col("exact_users") * lit(0.05)).as("hll_ok"))
      val total = ev.agg(countDistinct(col("user_id")).as("exact_users"))
        .crossJoin(sk.agg(hll_union_agg(col("sk")).as("sku")))
        .select(lit("ALL").as("event_type"), col("exact_users"),
          (abs(hll_sketch_estimate(col("sku")) - col("exact_users"))
            <= col("exact_users") * lit(0.05)).as("hll_ok"))
      perType.unionByName(total).orderBy("event_type")
    }),

    // Frequent-items sketch (Karp-Papadimitriou-Shenker via
    // df.stat.freqItems): single-pass, fixed memory, mergeable — the
    // heavy-hitters primitive for 100 TB streams. The sketch may
    // return false positives but NEVER misses an item above the
    // support threshold, so the oracle checks exactly that guarantee:
    // every value with true frequency > 10% must appear. The required
    // set is tiny (5 priorities) — the driver-side pull is O(1).
    "q_agg_freq_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val found = ord.stat.freqItems(Array("o_orderpriority"), 0.1)
        .first().getSeq[String](0).toSet
      val n = ord.count()
      ord.groupBy("o_orderpriority").count()
        .filter(col("count") > lit(n) * 0.1)
        .select(col("o_orderpriority").as("required_item"),
          lit(found.size <= 10).as("sketch_bounded"))
        .withColumn("found_by_sketch",
          col("required_item").isin(found.toSeq.map(lit): _*))
        .select("required_item", "found_by_sketch", "sketch_bounded")
        .orderBy("required_item")
    }),

    // Seeded Bernoulli sampling: same seed → identical sample
    // (re-run determinism, checked with a symmetric exceptAll), rate
    // lands inside a 5-sigma binomial band the oracle predicts TRUE.
    // The exact sampled COUNT is engine-private (depends on the RNG
    // stream), which is why the contract is determinism + tolerance,
    // not a value — the cross-engine-exact alternative is
    // q_sample_hash's md5-nibble filter.
    "q_sample_seeded" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val s1 = ord.sample(withReplacement = false, 0.2, seed = 42L)
      val s2 = ord.sample(withReplacement = false, 0.2, seed = 42L)
      val deterministic = s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty
      val subset = s1.join(ord, Seq("o_orderkey"), "left_anti").isEmpty
      val n = ord.count()
      val sigma = math.sqrt(0.2 * 0.8 * n)
      s1.agg(count(lit(1)).as("n_sample")).select(
        lit(n).as("n_total"),
        (abs(col("n_sample") - lit(0.2) * n) <= lit(5 * sigma)).as("rate_in_band"),
        lit(deterministic).as("deterministic"),
        lit(subset).as("is_subset"))
    }),

    // Order-sensitive: min_by/max_by with unique tiebreak. The
    // (l_extendedprice, l_orderkey) ordering packs into one decimal
    // (VectorExpressions.pack_ord over the price's order-preserving
    // bits; orderkeys are non-negative), so both picks stay inside a
    // HashAggregate — the former struct ordering demoted the whole
    // aggregate to a SortAggregate, a per-task sort of all of lineitem.
    // The struct's third component (l_linenumber) only disambiguated
    // rows already tied on (price, orderkey), which return the same
    // orderkey either way — the result is unchanged.
    "q_agg_minmax_by" -> ((s, dir) => {
      import graft.functions.VectorExpressions.{double_sort_bits, pack_ord}
      val ord = pack_ord(double_sort_bits(col("l_extendedprice")), col("l_orderkey"))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          max_by(col("l_orderkey"), ord).as("top_price_order"),
          min_by(col("l_orderkey"), ord).as("bot_price_order"))
        .orderBy("l_returnflag")
    }),

    // collect_list canonicalized with array_sort; collect_set distinct.
    // Output scalar-canonicalized (array_join) so the driver's pandas
    // checker can sort/hash it — array cells are unhashable there.
    "q_agg_collect" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), "|").as("nations"),
          size(collect_set(col("n_name"))).as("n_distinct"))
        .orderBy("r_name")
    }),

    // Rollup with grouping_id.
    "q_agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Cube.
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // GROUPING SETS via SQL surface.
    "q_agg_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, grouping_id() AS gid
          |FROM lineitem
          |GROUP BY l_returnflag, l_linestatus
          |GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
          |ORDER BY gid, l_returnflag, l_linestatus NULLS FIRST""".stripMargin)
    }),

    // Pivot: status values → columns (explicit value list keeps the
    // plan a single pass; no distinct-values pre-query).
    "q_agg_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    }),

    // Unpivot/melt: measure columns → rows, then re-aggregate.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "v")
        .groupBy("measure")
        .agg(sum("v").as("total"), count(lit(1)).as("n"))
        .orderBy("measure")
    }),

    // Typed UDAF: qty-weighted average price per return flag.
    // Typed Dataset API (KeyValueGroupedDataset.mapGroups): per-user
    // ordered scan computing the maximum gap between consecutive
    // events — genuine per-group imperative logic. mapGroups forfeits
    // partial aggregation (every row shuffles to its group), which is
    // exactly why the rest of the engine prefers groupBy.agg; this
    // declares the typed surface where an ordered iterator is the
    // honest formulation. Timestamps ride as unix micros (java.sql
    // .Timestamp.getTime would truncate to ms).
    "q_typed_max_gap" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("user_id").cast("long"), unix_micros(col("ts")))
        .as[(Long, Long)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val ts = it.map(_._2).toArray
          java.util.Arrays.sort(ts)
          var maxGap = 0L
          var i = 1
          while (i < ts.length) {
            if (ts(i) - ts(i - 1) > maxGap) maxGap = ts(i) - ts(i - 1)
            i += 1
          }
          (uid, ts.length.toLong, maxGap)
        }
        .toDF("user_id", "n_events", "max_gap_us")
        .orderBy("user_id")
    }),

    "q_udaf_weighted_avg" -> ((s, dir) => {
      val wavg = udaf(Aggregators.WeightedAvg)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_approx" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  CAST(median(l_quantity) AS DOUBLE) AS exact_med_qty,
        |  TRUE AS cnt_in_band,
        |  TRUE AS med_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_typed_max_gap" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts) AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  coalesce(max(gap), 0) AS max_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the sketch's no-false-negative guarantee over the true >10% set
    "q_agg_freq_items" ->
      """SELECT o_orderpriority AS required_item,
        |  TRUE AS found_by_sketch, TRUE AS sketch_bounded
        |FROM orders
        |GROUP BY o_orderpriority
        |HAVING count(*) > 0.1 * (SELECT count(*) FROM orders)
        |ORDER BY required_item""".stripMargin,

    "q_sample_seeded" ->
      """SELECT count(*) AS n_total, TRUE AS rate_in_band,
        |  TRUE AS deterministic, TRUE AS is_subset
        |FROM orders""".stripMargin,

    "q_agg_hll_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       TRUE AS hll_ok
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT user_id), TRUE FROM events
        |ORDER BY event_type""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT l_returnflag,
        |  (SELECT l2.l_orderkey FROM lineitem l2 WHERE l2.l_returnflag = l.l_returnflag
        |   ORDER BY l2.l_extendedprice DESC, l2.l_orderkey DESC, l2.l_linenumber DESC LIMIT 1) AS top_price_order,
        |  (SELECT l2.l_orderkey FROM lineitem l2 WHERE l2.l_returnflag = l.l_returnflag
        |   ORDER BY l2.l_extendedprice ASC, l2.l_orderkey ASC, l2.l_linenumber ASC LIMIT 1) AS bot_price_order
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) l
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_collect" ->
      """SELECT r_name,
        |  array_to_string(list_sort(list(n_name)), '|') AS nations,
        |  count(DISTINCT n_name) AS n_distinct
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
        |ORDER BY gid, l_returnflag, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT measure, sum(v) AS total, count(*) AS n FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin,

    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
