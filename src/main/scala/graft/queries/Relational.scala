package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core: scans, projection, filters, conditionals, casts,
  * distinct, sorts, limits, set ops (SURVEY §2.B.1, B.2, B.6).
  *
  * Every query ends with an explicit ORDER BY over a unique key set and
  * aliases every computed column identically to its oracle SQL twin
  * (driver compares column-name-sorted hashed rows).
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Projection + computed column; filter pushed to parquet scan.
    "q_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 40)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        // (l_orderkey, l_linenumber) has duplicates in this data — add
        // revenue so tied rows are identical
        .orderBy("l_orderkey", "l_linenumber", "revenue")
    }),

    // Predicate zoo: BETWEEN, IN, LIKE, boolean algebra, null test.
    "q_filter_predicates" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(10000, 200000) &&
          col("o_orderpriority").like("%URGENT%") &&
          col("o_custkey").isNotNull &&
          !(col("o_orderkey") % 10 === 7))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // when/otherwise, coalesce, nullif, greatest/least.
    "q_conditional" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
          least(col("c_acctbal"), lit(1000.0)).as("capped_bal"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"))
        .orderBy("c_custkey")
    }),

    // Decimal money math: exact, deterministic aggregation anchor.
    // Tie-free formulation: the source doubles carry <= 2 decimal digits,
    // so round(x*100) lands within 1e-9 of an integer — no .5 ties for
    // Spark (HALF_UP) vs DuckDB (HALF_EVEN) to round apart. Everything
    // after that is exact integer/decimal arithmetic: long sums, then a
    // scale shift via exact decimal multiplication (never a re-round).
    // The FINAL projection casts to DOUBLE so the comparison is
    // representation-proof: the values (scale ≤ 4, magnitude ≤ ~1e9)
    // round-trip through a double exactly, and a DOUBLE column hashes
    // identically regardless of how the harness formats DECIMALs.
    "q_cast_decimal" -> ((s, dir) => {
      val cents  = round(col("l_extendedprice") * 100).cast(LongType)
      val discBp = round(col("l_discount") * 100).cast(LongType)
      t(s, dir, "lineitem")
        .select(
          col("l_returnflag"),
          cents.as("price_cents"),
          (cents * discBp).as("disc_e4"))
        .groupBy("l_returnflag")
        .agg(
          (sum("price_cents").cast(DecimalType(24, 0)) *
            lit(new java.math.BigDecimal("0.01")))
            .cast(DecimalType(18, 2)).cast(DoubleType).as("sum_price"),
          (sum("disc_e4").cast(DecimalType(28, 0)) *
            lit(new java.math.BigDecimal("0.0001")))
            .cast(DecimalType(30, 4)).cast(DoubleType).as("sum_disc"))
        .orderBy("l_returnflag")
    }),

    // distinct / dropDuplicates on keys.
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Declarative data-quality gates: the rule set compiles to one
    // projection pass tagging rows with their violations; metrics and
    // the good/quarantine split share that subplan (one scan total).
    // Rules deliberately chosen so the fixture yields non-zero
    // violation counts — a gate that never fires verifies nothing.
    "q_quality_expectations" -> ((s, dir) => {
      import graft.operators.Expectations
      import graft.operators.Expectations.Rule
      val rules = Seq(
        Rule("qty_in_range", col("l_quantity") >= 1 && col("l_quantity") <= 45),
        Rule("discount_sane", col("l_discount") >= 0 && col("l_discount") <= 0.05),
        Rule("price_positive", col("l_extendedprice") > 0),
        Rule("flag_known", col("l_returnflag").isin("A", "N", "R")))
      val li = t(s, dir, "lineitem")
      val (good, bad) = Expectations.split(li, rules)
      // cross-check row: the quarantine split must agree with the
      // metrics rollup (two O(1) scalar pulls, then both predicted by
      // the oracle from lineitem alone)
      Expectations.metrics(li, rules)
        .withColumn("n_good", lit(null: java.lang.Long))
        .unionByName(s.range(1).select(
          lit("__split_check").as("rule"),
          lit(bad.count()).as("n_violations"),
          lit(li.count()).as("n_total"),
          lit(good.count()).as("n_good")))
        .orderBy("rule")
    }),

    // Multi-key global sort, mixed direction.
    "q_sort_multi" -> ((s, dir) => {
      t(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(col("c_nationkey").asc, col("c_acctbal").desc, col("c_custkey").asc)
    }),

    // Top-k via orderBy+limit → TakeOrderedAndProjectExec.
    "q_limit_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // union all then aggregate.
    "q_union" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.unionAll(sup).groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    }),

    // intersect (nations having both customers and suppliers).
    "q_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(sup).orderBy("nk")
    }),

    // except (nations with customers but no suppliers).
    "q_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.except(sup).orderBy("nk")
    }),

    // null ordering: computed nullable key, explicit NULLS FIRST/LAST.
    "q_sort_nulls" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("band",
          when(col("c_acctbal") < 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")))
        .select("c_custkey", "band", "c_acctbal")
        .orderBy(col("band").desc_nulls_last, col("c_custkey").asc)
    }),

    // multiset variants: INTERSECT ALL / EXCEPT ALL keep duplicates.
    "q_intersect_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("k"))
      a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    }),
    "q_except_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("k"))
      a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    }),

    // union by name with reordered columns.
    "q_union_by_name" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("id"), col("c_nationkey").as("nk"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nk"), col("s_suppkey").as("id"))
      a.unionByName(b).groupBy("nk").agg(sum("id").as("sum_ids"), count(lit(1)).as("n"))
        .orderBy("nk")
    }),

    // partition-local sort: values sorted within range partitions —
    // verified structurally (each partition sorted) via monotonic check
    // per partition id; output is per-partition min/max/count.
    "q_sort_partition_local" -> ((s, dir) => {
      val df = t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .select(col("o_orderkey"))
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"), count(lit(1)).as("n"))
        .select(sum("n").as("total_rows"), countDistinct(col("pid")).as("n_parts"))
    })
  )

  val oracle: Map[String, String] = Map(
    // per-rule violation counts + the all-pass and split cross-check
    // rows, every number derived from lineitem in one aggregate
    "q_quality_expectations" ->
      """WITH v AS (
        |  SELECT count(*) AS total,
        |    CAST(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 45)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS qty,
        |    CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.05)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        |    CAST(sum(CASE WHEN NOT (l_extendedprice > 0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS price,
        |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS flag,
        |    CAST(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 45
        |        AND l_discount >= 0 AND l_discount <= 0.05
        |        AND l_extendedprice > 0
        |        AND l_returnflag IN ('A','N','R'))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS anybad
        |  FROM lineitem)
        |SELECT rule, n_violations, n_total, n_good FROM (
        |  SELECT '__all_pass' AS rule, anybad AS n_violations,
        |    total AS n_total, CAST(NULL AS BIGINT) AS n_good FROM v
        |  UNION ALL SELECT '__split_check', anybad, total, total - anybad FROM v
        |  UNION ALL SELECT 'qty_in_range', qty, total, NULL FROM v
        |  UNION ALL SELECT 'discount_sane', disc, total, NULL FROM v
        |  UNION ALL SELECT 'price_positive', price, total, NULL FROM v
        |  UNION ALL SELECT 'flag_known', flag, total, NULL FROM v)
        |ORDER BY rule""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem WHERE l_quantity > 40
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,

    "q_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_totalprice BETWEEN 10000 AND 200000
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_custkey IS NOT NULL
        |  AND NOT (o_orderkey % 10 = 7)
        |ORDER BY o_orderkey""".stripMargin,

    "q_conditional" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bal_band,
        |       greatest(c_acctbal, 0.0) AS pos_bal,
        |       least(c_acctbal, 1000.0) AS capped_bal,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_cast_decimal" ->
      """SELECT l_returnflag,
        |       CAST(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DECIMAL(24,0)) * 0.01 AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
        |       CAST(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DECIMAL(28,0)) * 0.0001 AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_sort_multi" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC""".stripMargin,

    "q_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_union" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_sort_nulls" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS band,
        |  c_acctbal
        |FROM customer
        |ORDER BY band DESC NULLS LAST, c_custkey ASC""".stripMargin,

    "q_intersect_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT ALL
        |  SELECT c_custkey AS k FROM customer)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_except_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS k FROM customer)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_union_by_name" ->
      """SELECT nk, CAST(sum(id) AS BIGINT) AS sum_ids, count(*) AS n FROM (
        |  SELECT c_custkey AS id, c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_sort_partition_local" ->
      """SELECT count(*) AS total_rows, 8 AS n_parts FROM orders""".stripMargin
  )
}
