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

    // Advanced string family: edit distance, base64, left/right,
    // repeat, ascii/chr, split_part.
    "q_str_advanced" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(substring(col("p_name"), 1, 12), col("p_brand")).as("lev"),
        base64(col("p_brand").cast("binary")).as("b64"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_name, 4)").as("r4"),
        repeat(col("p_brand"), 2).as("rep2"),
        ascii(col("p_name")).as("first_code"),
        expr("chr(65 + p_partkey % 26)").as("cyc"),
        expr("split_part(p_type, ' ', 2)").as("type2"))
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

    // Array family over split strings. Array-typed outputs are
    // scalar-canonicalized (array_join) — the driver's pandas checker
    // cannot sort/hash array cells; semantics unchanged.
    "q_array_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("words", split(col("p_type"), " "))
        .select(
          col("p_partkey"),
          size(col("words")).as("n_words"),
          array_contains(col("words"), "brushed").as("has_brushed"),
          array_join(array_sort(col("words")), "_").as("sorted_words"),
          array_join(array_distinct(col("words")), "_").as("dwords"),
          array_join(slice(col("words"), 1, 2), "_").as("first2"),
          array_join(col("words"), "_").as("joined"),
          array_join(reverse(col("words")), "_").as("rwords"))
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

    // Map functions over parsed JSON props. Key/value arrays are
    // key-sorted then array_join'd so the driver checker sees scalars.
    "q_map_funcs" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
        .withColumn("sks", array_sort(map_keys(col("m"))))
        .select(
          col("event_id"),
          array_join(col("sks"), ",").as("ks"),
          array_join(transform(col("sks"), k => element_at(col("m"), k)), ",").as("vs"),
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

    // json_tuple generator: multi-field extraction in one pass over a
    // constructed JSON document (props itself has a single key).
    "q_json_tuple" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("j", to_json(struct(
          col("event_id").as("id"), col("event_type").as("t"), col("value").as("v"))))
        .select(col("event_id"), json_tuple(col("j"), "id", "t", "v").as(Seq("jid", "jt", "jv")))
        .orderBy("event_id")
    }),

    // from_json with an explicit StructType schema + schema_of_json.
    "q_json_schema" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", LongType)))
      t(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), schema).getField("k").as("k_num"),
          schema_of_json(lit("""{"k": 42}""")).as("inferred"))
        .orderBy("event_id")
    }),

    // arrays_zip / zip_with / flatten / sort_array over embeddings.
    // e and er are materialized columns (select barrier) so lambdas
    // don't re-evaluate them per element; scalar fold outputs keep the
    // driver checker happy.
    "q_array_zip" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .withColumn("e", transform(col("embedding"), x => x.cast("double")))
        .withColumn("er", reverse(col("e")))
        .select(
          col("vec_id"),
          expr("aggregate(zip_with(e, er, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("dot_rev"),
          expr("aggregate(transform(arrays_zip(e, er), s -> s.e * s.er), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("dot_zip"),
          expr("aggregate(flatten(array(slice(e, 1, 2), slice(e, 3, 2))), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("sum_head4"),
          expr("aggregate(slice(sort_array(e, false), 1, 3), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("top3_sum"))
        .orderBy("vec_id")
    }),

    // ANSI-mode safety valves: Spark 4 runs with ANSI ON, so try_*
    // functions are the user-facing null-instead-of-error forms.
    // NOTE a FAILING try_cast pays a full per-row exception (message +
    // query context) inside codegen — ~60µs/row; at scale, pre-screen
    // with RLIKE before casting dirty columns. The 20% slice here keeps
    // the bench honest while still exercising every failure path.
    "q_try_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(
        col("o_orderkey"),
        try_divide(col("o_totalprice"), (col("o_orderkey") % 10).cast("double")).as("td"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pri_num"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
        try_add(col("o_orderkey"), lit(Long.MaxValue)).as("ta"),
        try_element_at(split(col("o_orderpriority"), "-"), lit(5)).as("te"))
        .orderBy("o_orderkey")
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

    // Bitwise family: per-row operators (& | ^ << >> bit_count) and
    // the bit_and/bit_or/bit_xor aggregates — all integer-exact, so
    // the oracle is the same arithmetic verbatim.
    "q_bitwise_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          bit_and(col("l_orderkey")).as("band"),
          bit_or(col("l_orderkey")).as("bor"),
          bit_xor(col("l_orderkey")).as("bxor"),
          sum(bit_count(col("l_orderkey")).cast("long")).as("sum_pop"),
          sum(when(col("l_orderkey").bitwiseAND(lit(7L)) === 0, 1L)
            .otherwise(0L)).as("n_mult8"),
          min(shiftleft(col("l_orderkey"), 2)).as("min_shl"),
          max(shiftright(col("l_orderkey"), 3)).as("max_shr"),
          sum(col("l_orderkey").bitwiseXOR(col("l_suppkey"))).as("sum_rowxor"))
        .orderBy("l_returnflag")
    }),

    // Hash functions with DuckDB twins.
    "q_hash_funcs" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        sha2(col("c_name").cast("binary"), 256).as("name_sha256"))
        .orderBy("c_custkey")
    }),

    // Date/string functions with Spark-specific semantics, each
    // re-derived in the DuckDB oracle (initcap word-splitting,
    // months_between's 31-day convention, next_day via isodow).
    "q_scalar_misc" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        initcap(lower(col("o_orderpriority"))).as("pri_title"),
        months_between(lit("1998-01-01").cast("timestamp"), col("o_orderdate")).as("mb"),
        next_day(col("o_orderdate").cast("date"), "Mon").as("next_mon"),
        weekofyear(col("o_orderdate")).as("woy"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        array_join(sequence(lit(1), col("o_orderkey") % 4 + 1), ",").as("seq"))
        .orderBy("o_orderkey")
    }),

    // Spark-only hashes (xxhash64 / murmur3 / crc32) have no DuckDB
    // twin, so the oracle checks their INVARIANTS instead of values:
    // injectivity on this corpus (distinct-hash counts equal the
    // distinct-input counts; xx64 is 64-bit so exact equality, the
    // 32-bit families get a 99.9% tolerance bound against birthday
    // collisions at larger sf), plus bit-stability through a parquet
    // round-trip (write hashes, read back, count mismatches). The
    // oracle predicts every boolean TRUE and re-derives the input
    // cardinalities; raw hash VALUES stay value-checked in scalatest
    // against reference vectors (ScalarsSpec).
    "q_hash_spark" -> ((s, dir) => {
      val hashed = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"),
        xxhash64(col("c_name")).as("name_xx64"),
        crc32(col("c_name").cast("binary")).as("name_crc32"),
        hash(col("c_name"), col("c_custkey")).as("murmur"))
      val out = graft.Tables.scratch("hash_spark_roundtrip")
      hashed.write.mode("overwrite").parquet(out)
      val back = s.read.parquet(out)
      val stability = hashed.as("a")
        .join(back.as("b"), Seq("c_custkey"))
        .agg(
          count(lit(1)).as("n_joined"),
          sum(when(col("a.name_xx64") === col("b.name_xx64") &&
                   col("a.name_crc32") === col("b.name_crc32") &&
                   col("a.murmur") === col("b.murmur"), 0L).otherwise(1L))
            .as("n_mismatch"))
      val invariants = hashed.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("c_name")).as("n_names"),
        (countDistinct(col("name_xx64")) === countDistinct(col("c_name")))
          .as("xx64_injective"),
        (countDistinct(col("name_crc32")).cast("double") >=
          countDistinct(col("c_name")).cast("double") * 0.999)
          .as("crc32_ok"),
        (countDistinct(col("murmur")).cast("double") >=
          countDistinct(col("c_name"), col("c_custkey")).cast("double") * 0.999)
          .as("murmur_ok"))
      invariants.crossJoin(stability)
        .select(col("n_rows"), col("n_names"),
          col("xx64_injective"), col("crc32_ok"), col("murmur_ok"),
          (col("n_joined") === col("n_rows") && col("n_mismatch") === 0L)
            .as("roundtrip_stable"))
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

    "q_str_advanced" ->
      """SELECT p_partkey,
        |  levenshtein(substring(p_name, 1, 12), p_brand) AS lev,
        |  to_base64(encode(p_brand)) AS b64,
        |  left(p_name, 5) AS l5,
        |  right(p_name, 4) AS r4,
        |  repeat(p_brand, 2) AS rep2,
        |  ascii(p_name) AS first_code,
        |  chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS cyc,
        |  split_part(p_type, ' ', 2) AS type2
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
        |  array_to_string(list_sort(words), '_') AS sorted_words,
        |  array_to_string(list_distinct(words), '_') AS dwords,
        |  array_to_string(words[1:2], '_') AS first2,
        |  array_to_string(words, '_') AS joined,
        |  array_to_string(list_reverse(words), '_') AS rwords
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
        |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  array_to_string([json_extract_string(props, '$.' || k) FOR k IN list_sort(json_keys(props))], ',') AS vs,
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

    "q_json_tuple" ->
      """SELECT event_id,
        |  json_extract_string(j, '$.id') AS jid,
        |  json_extract_string(j, '$.t') AS jt,
        |  json_extract_string(j, '$.v') AS jv
        |FROM (SELECT event_id,
        |        to_json(struct_pack(id := event_id, t := event_type, v := value)) AS j
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_json_schema" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
        |  'STRUCT<k: BIGINT>' AS inferred
        |FROM events ORDER BY event_id""".stripMargin,

    "q_array_zip" ->
      """WITH t AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |           FROM embeddings)
        |SELECT vec_id,
        |  list_aggregate(list_transform(list_zip(e, list_reverse(e)), s -> s[1] * s[2]), 'sum') AS dot_rev,
        |  list_aggregate(list_transform(list_zip(e, list_reverse(e)), s -> s[1] * s[2]), 'sum') AS dot_zip,
        |  list_aggregate(flatten([e[1:2], e[3:4]]), 'sum') AS sum_head4,
        |  list_aggregate(list_sort(e, 'DESC')[1:3], 'sum') AS top3_sum
        |FROM t ORDER BY vec_id""".stripMargin,

    // DuckDB: x/0 is NULL natively; BIGINT overflow errors, so the
    // overflow twin is the value-level CASE (try_add(k, MAX) is MAX for
    // k = 0 and NULL for every k > 0); out-of-bounds list index is NULL.
    "q_try_funcs" ->
      """SELECT o_orderkey,
        |  o_totalprice / CAST(o_orderkey % 10 AS DOUBLE) AS td,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS pri_num,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807 ELSE NULL END AS ta,
        |  string_split(o_orderpriority, '-')[5] AS te
        |FROM orders WHERE o_orderkey % 5 = 0 ORDER BY o_orderkey""".stripMargin,

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

    "q_bitwise_funcs" ->
      """SELECT l_returnflag,
        |  bit_and(l_orderkey) AS band,
        |  bit_or(l_orderkey) AS bor,
        |  bit_xor(l_orderkey) AS bxor,
        |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_pop,
        |  CAST(sum(CASE WHEN (l_orderkey & 7) = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_mult8,
        |  min(l_orderkey << 2) AS min_shl,
        |  max(l_orderkey >> 3) AS max_shr,
        |  CAST(sum(xor(l_orderkey, l_suppkey)) AS BIGINT) AS sum_rowxor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // Spark-specific semantics re-derived: initcap = capitalize each
    // space-separated word; months_between = months + (day delta incl.
    // time-of-day)/31 rounded to 8, integer when days equal; next_day =
    // next strictly-later Monday; Spark dayofweek is 1=Sunday (DuckDB 0).
    "q_scalar_misc" ->
      """SELECT o_orderkey,
        |  array_to_string(list_transform(string_split(lower(o_orderpriority), ' '), w -> upper(w[1]) || w[2:]), ' ') AS pri_title,
        |  round((1998 - year(o_orderdate))*12 + (1 - month(o_orderdate)) +
        |    CASE WHEN day(o_orderdate) = 1 THEN 0
        |         ELSE (1 - day(o_orderdate) - (epoch(o_orderdate) - epoch(date_trunc('day', o_orderdate)))/86400.0)/31.0 END, 8) AS mb,
        |  CAST(o_orderdate + ((CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7 ELSE (8 - isodow(o_orderdate)) % 7 END) * INTERVAL 1 DAY) AS DATE) AS next_mon,
        |  weekofyear(o_orderdate) AS woy,
        |  quarter(o_orderdate) AS q,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  array_to_string(range(1, CAST(o_orderkey % 4 + 2 AS BIGINT)), ',') AS seq
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Derived oracle: the hash values themselves are Spark-native, but
    // the invariants the query emits (injectivity on this corpus +
    // parquet round-trip stability) are engine-independent and the
    // input cardinalities are recomputable.
    "q_hash_spark" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT c_name) AS n_names,
        |  TRUE AS xx64_injective,
        |  TRUE AS crc32_ok,
        |  TRUE AS murmur_ok,
        |  TRUE AS roundtrip_stable
        |FROM customer""".stripMargin
  )
}
