package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.B.5): ranking, analytic, aggregate-over-
  * window frames, top-k per group. Every window's ORDER BY includes a
  * unique tiebreak so results are deterministic.
  */
object Windows {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("c_nationkey", "rn")
    }),

    // Distribution family: percent_rank / cume_dist; first/last value
    // over an explicit full frame (last_value needs it — the default
    // frame ends at CURRENT ROW).
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_nationkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("c_custkey")).over(w).as("poorest"),
          last(col("c_custkey")).over(wFull).as("richest"))
        .orderBy("c_custkey")
    }),

    // Analytic: lag/lead.
    "q_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Running sum + moving average frames.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("run_sum"),
          avg("o_totalprice").over(w.rowsBetween(-2, 0)).as("mov_avg3"),
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("n_orders"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE frame on a numeric order key: peers within a value band.
    //
    // NOT the naive window over the raw rows — that form is a scale
    // trap on both axes: l_returnflag has 3 values, so each window
    // partition is n/3 rows sorted and scanned by ONE task, and the
    // frame's aggregation state is O(rows-in-frame) where
    // rows-in-frame grows with the corpus (every quantity's tie group
    // is corpus-sized/|domain|) — the round-18 sf1 sweep clocked it at
    // 4.8x for 10x data. The saving fact: a RANGE frame's membership
    // depends only on the row's ORDER-KEY VALUE, so when every frame
    // aggregate is a function of the order key alone (count(*),
    // sum(order key) here), all rows sharing (flag, quantity) share
    // one identical frame and one identical answer. So: pre-aggregate
    // to that granularity (parallel hash agg), run the window over the
    // DISTINCT values — ≤ |value domain| rows per flag (50 here),
    // bounded by the domain, NOT by data size — and broadcast-join the
    // per-value answers back. Identical output (the per-value partials
    // re-sum to the same exact doubles: quantities are integers, sums
    // stay < 2^53), and the only window left is domain-sized. The
    // rewrite requires a bounded order-key domain to pay off; on a
    // continuous key, bucket the key first or accept the naive form's
    // per-key bound. Control pair: the naive window (Baseline).
    "q_window_range_frame" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val perVal = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("__cnt"), sum("l_quantity").as("__qty"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").asc)
        .rangeBetween(-5L, 0L)
      val frames = perVal.select(col("l_returnflag"), col("l_quantity"),
        sum("__cnt").over(w).as("n_within_5"),
        sum("__qty").over(w).as("qty_within_5"))
      li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .join(broadcast(frames), Seq("l_returnflag", "l_quantity"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          col("n_within_5"), col("qty_within_5"))
        // (l_orderkey, l_linenumber) is NOT unique in this data — order
        // by every projected dimension so ties are identical rows
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    // ntile / percent_rank / cume_dist.
    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // first/last/nth value over explicit frames.
    "q_window_analytic" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("first_ok"),
          last("o_orderkey").over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Top-3 orders per customer (row_number + filter).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // Ordered-sequence funnel: per user, first view → first click
    // AFTER that view → first purchase AFTER that click (strict event-
    // time order, the product-analytics conversion shape). Three
    // unbounded windows over the SAME partitioning — Catalyst plans
    // ONE user_id exchange and stacks the Window operators on it, so
    // the funnel costs a single shuffle regardless of depth. Each
    // stage's predicate references the previous stage's column, which
    // a groupBy can't express in one pass. Conversion latency is
    // summed in exact integer micros (order-proof), one final cast.
    // Session windows in BATCH: the same session_window operator the
    // streaming queries use, run as a plain aggregation — one shuffle
    // on user_id, per-partition sort, linear merge of overlapping
    // windows. The batch/stream twin pair (q_stream_session shares
    // this oracle) demonstrates the operator is mode-independent.
    "q_window_session_batch" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    }),

    // Gaps-and-islands: contiguous per-user activity runs, where a
    // >10-minute silence starts a new island (the batch twin of
    // session windows, entirely in window functions — lag → gap flag →
    // running-sum island id → two ordinary aggregations). The three
    // windows and both groupBys all key on user_id, so the whole
    // pipeline rides ONE hash exchange; island ids are per-user dense
    // integers, never a global sequence (which would serialize at
    // scale).
    "q_window_islands" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val isl = t(s, dir, "events").select("user_id", "ts", "event_id")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_i", when(col("gap_us") > 600000000L, 1L).otherwise(0L))
        .withColumn("island", sum("new_i")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      isl.groupBy("user_id", "island")
        .agg(count(lit(1)).as("n_ev"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("dur_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          max("n_ev").as("longest_events"),
          max("dur_us").as("longest_dur_us"))
        .orderBy("user_id")
    }),

    "q_funnel_conversion" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      val ev = t(s, dir, "events").select("user_id", "event_type", "ts")
        .withColumn("first_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("first_click",
          min(when(col("event_type") === "click" &&
            col("ts") > col("first_view"), col("ts"))).over(w))
        .withColumn("first_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("first_click"), col("ts"))).over(w))
      ev.groupBy("user_id")
        .agg(max("first_view").as("fv"), max("first_click").as("fc"),
          max("first_purchase").as("fp"))
        .agg(
          count(when(col("fv").isNotNull, 1)).as("n_view"),
          count(when(col("fc").isNotNull, 1)).as("n_click_after_view"),
          count(when(col("fp").isNotNull, 1)).as("n_full_funnel"),
          sum(when(col("fp").isNotNull,
            unix_micros(col("fp")) - unix_micros(col("fv"))))
            .as("total_convert_us"))
    }),

    // Retention cohorts — the product-analytics rollup: users grouped
    // by first-seen week; for each (cohort, week-offset) the count of
    // cohort members active that week and the retention rate. Shapes:
    // one user-keyed groupBy (first week), a user-keyed join, one
    // (cohort, offset)-keyed aggregate — |users| and |cohorts×weeks|
    // keys, no window, no collect; both week fields are Monday-
    // truncated so the day diff is an exact multiple of 7.
    "q_events_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          // DATE-typed week (DuckDB's date_trunc('week') convention)
          date_trunc("week", col("ts")).cast("date").as("wk"))
      val first = ev.groupBy("user_id").agg(min("wk").as("cohort"))
      val act = ev.distinct()
      val m = act.join(first, Seq("user_id"))
        .withColumn("offset",
          (datediff(col("wk"), col("cohort")) / 7).cast("long"))
        .groupBy("cohort", "offset")
        .agg(countDistinct("user_id").as("n_active"))
      val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
      m.join(sizes, Seq("cohort"))
        .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort")).as("rate"))
        .orderBy("cohort", "offset")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, rn""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
        |  avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg3,
        |  count(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  count(*) OVER w AS n_within_5,
        |  sum(l_quantity) OVER w AS qty_within_5
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin,

    "q_window_dist" ->
      """SELECT c_custkey, c_nationkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(c_custkey) OVER w AS poorest,
        |  last_value(c_custkey) OVER wf AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC),
        |       wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS prk,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_session_batch" ->
      (StreamingQueries.sessionSql + " ORDER BY user_id, s_start"),

    "q_window_islands" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
        |         THEN 1 ELSE 0 END AS new_i
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (
        |  SELECT user_id, ts,
        |    sum(new_i) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS island
        |  FROM o),
        |p AS (
        |  SELECT user_id, island, count(*) AS n_ev,
        |    max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(max(n_ev) AS BIGINT) AS longest_events,
        |  CAST(max(dur_us) AS BIGINT) AS longest_dur_us
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the three funnel stages as sequential per-user window mins,
    // mirroring the Spark formulation stage for stage
    "q_funnel_conversion" ->
      """WITH staged AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS first_view_pre,
        |    event_type, ts
        |  FROM events),
        |staged2 AS (
        |  SELECT user_id, first_view_pre,
        |    min(CASE WHEN event_type = 'click' AND ts > first_view_pre
        |        THEN ts END) OVER (PARTITION BY user_id) AS first_click_pre,
        |    event_type, ts
        |  FROM staged),
        |staged3 AS (
        |  SELECT user_id, first_view_pre, first_click_pre,
        |    min(CASE WHEN event_type = 'purchase' AND ts > first_click_pre
        |        THEN ts END) OVER (PARTITION BY user_id) AS first_purchase_pre
        |  FROM staged2),
        |per_user AS (
        |  SELECT user_id, max(first_view_pre) AS fv,
        |    max(first_click_pre) AS fc, max(first_purchase_pre) AS fp
        |  FROM staged3 GROUP BY user_id)
        |SELECT
        |  count(CASE WHEN fv IS NOT NULL THEN 1 END) AS n_view,
        |  count(CASE WHEN fc IS NOT NULL THEN 1 END) AS n_click_after_view,
        |  count(CASE WHEN fp IS NOT NULL THEN 1 END) AS n_full_funnel,
        |  CAST(sum(CASE WHEN fp IS NOT NULL
        |    THEN epoch_us(fp) - epoch_us(fv) END) AS BIGINT)
        |    AS total_convert_us
        |FROM per_user""".stripMargin,

    // date_diff('week', ...) on Monday-truncated weeks equals the
    // engine's day-diff / 7 exactly
    "q_events_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, wk FROM e),
        |m AS (SELECT cohort, CAST(date_diff('week', cohort, wk) AS BIGINT) AS "offset",
        |        count(DISTINCT a.user_id) AS n_active
        |      FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1)
        |SELECT m.cohort, m."offset", m.n_active, c.n_cohort,
        |  CAST(m.n_active AS DOUBLE) / c.n_cohort AS rate
        |FROM m JOIN c USING (cohort) ORDER BY cohort, "offset"""".stripMargin
  )
}
