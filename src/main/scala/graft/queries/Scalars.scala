package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function library (SURVEY §2.B.7): string, date/time, math,
  * array (incl. higher-order), map, JSON, generators, hash. All
  * whole-stage-codegen built-ins — no UDFs.
  */
object Scalars {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String family.
    "q_str_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        instr(col("p_name"), "a").as("a_pos"),
        translate(col("p_brand"), "#", "N").as("brand_tr"))
        .orderBy("p_partkey")
    }),

    // Date/time family on orders + events.
    "q_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        hour(col("o_orderdate")).as("hr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("plus_week"),
        last_day(col("o_orderdate")).as("eom"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        col("o_orderdate").cast("date").as("odate"))
        .orderBy("o_orderkey")
    }),

    // Math family.
    "q_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("sq"),
        exp(col("l_discount")).as("ex"),
        log(col("l_extendedprice")).as("ln_p"),
        log10(col("l_extendedprice")).as("log10_p"),
        signum(col("l_discount") - 0.05).as("sg"),
        pmod(col("l_orderkey") - lit(3L), lit(7L)).as("pm"))
        // dup (l_orderkey, l_linenumber) pairs exist: extend the sort so
        // ties are identical rows (sq/qty_sq/ab pin price/qty/discount)
        .orderBy("l_orderkey", "l_linenumber", "sq", "qty_sq", "ab")
    }),

    // Array family over split strings.
    "q_array_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("words", split(col("p_type"), " "))
        .select(
          col("p_partkey"),
          size(col("words")).as("n_words"),
          array_contains(col("words"), "brushed").as("has_brushed"),
          array_sort(col("words")).as("sorted_words"),
          array_distinct(col("words")).as("dwords"),
          slice(col("words"), 1, 2).as("first2"),
          array_join(col("words"), "_").as("joined"),
          reverse(col("words")).as("rwords"))
        .orderBy("p_partkey")
    }),

    // Higher-order array functions over embeddings (computed in double).
    "q_array_higher_order" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("sumsq"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        expr("exists(embedding, x -> x > 3.0)").as("any_big"),
        expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("sum_all"))
        .orderBy("vec_id")
    }),

    // Map functions over parsed JSON props.
    "q_map_funcs" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
        .select(
          col("event_id"),
          map_keys(col("m")).as("ks"),
          map_values(col("m")).as("vs"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("m_size"))
        .orderBy("event_id")
    }),

    // Map construction/transform family: map_concat, transform_values,
    // map_from_entries, map_keys — scalar outputs for oracle parity.
    "q_map_transform" -> ((s, dir) => {
      val mc = map_concat(
        map(lit("a"), col("value")),
        map(lit("b"), col("value") * 2))
      val tv = transform_values(mc, (_, v) => v + 1)
      val mfe = map_from_entries(array(struct(lit("x").as("k"), col("value").as("v"))))
      t(s, dir, "events").select(
        col("event_id"),
        element_at(tv, "a").as("a_plus"),
        element_at(tv, "b").as("b_plus"),
        array_join(array_sort(map_keys(tv)), ",").as("keys_cat"),
        element_at(mfe, "x").as("x_val"))
        .orderBy("event_id")
    }),

    // JSON functions on the raw props string.
    "q_json_funcs" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_val"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("t"))).as("as_json"))
        .orderBy("event_id")
    }),

    // Generator: explode word tokens, global top-40 by frequency.
    "q_explode_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(40)
    }),

    // Generator with position: posexplode.
    "q_posexplode" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
        .orderBy("p_partkey", "pos")
    }),

    // explode_outer: rows with empty arrays survive as nulls.
    "q_explode_outer" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("swords", filter(split(col("p_type"), " "), w => w.startsWith("S")))
        .select(col("p_partkey"), explode_outer(col("swords")).as("sword"))
        .groupBy("p_partkey")
        .agg(count(col("sword")).as("n_s"), count(lit(1)).as("n_rows"))
        .orderBy("p_partkey")
    }),

    // stack generator: pivot literal column groups into rows.
    "q_stack" -> ((s, dir) => {
      t(s, dir, "region")
        .select(col("r_regionkey"),
          expr("stack(2, 'name', r_name, 'key', CAST(r_regionkey AS STRING))")
            .as(Seq("attr", "val")))
        .orderBy("r_regionkey", "attr")
    }),

    // inline generator: explode an array of structs into columns.
    "q_inline" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          inline(array(
            struct(lit("name").as("attr"), col("n_name").as("v")),
            struct(lit("region").as("attr"), col("n_regionkey").cast("string").as("v")))))
        .orderBy("n_nationkey", "attr")
    }),

    // Hash functions with DuckDB twins.
    "q_hash_funcs" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        sha2(col("c_name").cast("binary"), 256).as("name_sha256"))
        .orderBy("c_custkey")
    }),

    // Date/string functions with Spark-specific semantics (no clean
    // DuckDB twin — rows-only; values asserted in scalatest).
    "q_scalar_misc" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        initcap(lower(col("o_orderpriority"))).as("pri_title"),
        months_between(lit("1998-01-01").cast("timestamp"), col("o_orderdate")).as("mb"),
        next_day(col("o_orderdate").cast("date"), "Mon").as("next_mon"),
        weekofyear(col("o_orderdate")).as("woy"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        sequence(lit(1), col("o_orderkey") % 4 + 1).as("seq"))
        .orderBy("o_orderkey")
    }),

    // Spark-only hashes — deterministic but no DuckDB twin (rows-only).
    "q_hash_spark" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        xxhash64(col("c_name")).as("name_xx64"),
        crc32(col("c_name").cast("binary")).as("name_crc32"),
        hash(col("c_name"), col("c_custkey")).as("murmur"))
        .orderBy("c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_brand) AS lo_brand,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 8) AS name_pfx,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  trim('  pad  ') AS trimmed,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  strpos(p_name, 'a') AS a_pos,
        |  translate(p_brand, '#', 'N') AS brand_tr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  hour(o_orderdate) AS hr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 7 DAY AS plus_week,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  abs(l_discount - 0.05) AS ab,
        |  pow(l_quantity, 2) AS qty_sq,
        |  sqrt(l_extendedprice) AS sq,
        |  exp(l_discount) AS ex,
        |  ln(l_extendedprice) AS ln_p,
        |  log10(l_extendedprice) AS log10_p,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        |  ((l_orderkey - 3) % 7 + 7) % 7 AS pm
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, qty_sq, ab""".stripMargin,

    "q_array_funcs" ->
      """SELECT p_partkey,
        |  len(words) AS n_words,
        |  list_contains(words, 'brushed') AS has_brushed,
        |  list_sort(words) AS sorted_words,
        |  list_distinct(words) AS dwords,
        |  words[1:2] AS first2,
        |  array_to_string(words, '_') AS joined,
        |  list_reverse(words) AS rwords
        |FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q_array_higher_order" ->
      """SELECT vec_id,
        |  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS sumsq,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  len(list_filter(embedding, x -> x > 3.0)) > 0 AS any_big,
        |  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') AS sum_all
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id,
        |  json_keys(props) AS ks,
        |  [json_extract_string(props, '$.' || k) FOR k IN json_keys(props)] AS vs,
        |  json_extract_string(props, '$.k') AS k_val,
        |  len(json_keys(props)) AS m_size
        |FROM events ORDER BY event_id""".stripMargin,

    "q_map_transform" ->
      """SELECT event_id,
        |  value + 1 AS a_plus,
        |  value * 2 + 1 AS b_plus,
        |  'a,b' AS keys_cat,
        |  value AS x_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_val,
        |  to_json(struct_pack(id := event_id, t := event_type)) AS as_json
        |FROM events ORDER BY event_id""".stripMargin,

    "q_explode_tokens" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 40""".stripMargin,

    "q_posexplode" ->
      """SELECT p_partkey, unnest(range(len(words))) AS pos, unnest(words) AS word
        |FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part)
        |ORDER BY p_partkey, pos""".stripMargin,

    "q_explode_outer" ->
      """SELECT p_partkey,
        |  len(list_filter(string_split(p_type, ' '), w -> w LIKE 'S%')) AS n_s,
        |  greatest(len(list_filter(string_split(p_type, ' '), w -> w LIKE 'S%')), 1) AS n_rows
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_stack" ->
      """SELECT r_regionkey, attr, val FROM (
        |  SELECT r_regionkey, 'name' AS attr, r_name AS val FROM region
        |  UNION ALL
        |  SELECT r_regionkey, 'key' AS attr, CAST(r_regionkey AS VARCHAR) AS val FROM region)
        |ORDER BY r_regionkey, attr""".stripMargin,

    "q_inline" ->
      """SELECT n_nationkey, attr, v FROM (
        |  SELECT n_nationkey, 'name' AS attr, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'region' AS attr, CAST(n_regionkey AS VARCHAR) AS v FROM nation)
        |ORDER BY n_nationkey, attr""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
