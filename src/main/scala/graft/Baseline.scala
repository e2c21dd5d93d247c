package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plain-Spark control run for the BASELINE.md protocol: the same query
  * shapes expressed with ONLY stock Spark (no graft expressions,
  * operators, UDAFs, or extensions), so BENCH numbers have a measured
  * denominator.
  *
  * Two control classes:
  *  - `stockTwins`: queries whose graft implementation is already pure
  *    declarative Spark — the control is the identical plan (ratio 1.0
  *    by construction; re-measured to capture run-to-run variance).
  *  - `controls`: queries backed by graft custom code, re-expressed with
  *    the closest stock construct (higher-order functions, Spark ML
  *    MinHashLSH, explode+groupBy) — this is where a regression vs
  *    plain Spark would show.
  *
  * Prints one JSON line: {"baseline":{name:sec,...},"graft":{name:sec,...}}
  * where each value is the median of 3 warm runs at the target sf.
  */
object Baseline {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Stock-Spark re-expressions of custom-kernel queries. */
  val controls: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q_sim_topk control: cosine via higher-order functions instead of
    // the codegen'd CosineSim expression.
    "q_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val p = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("neighbor_vec"))
      val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
        .withColumn("cos", expr(
          """aggregate(zip_with(probe_vec, neighbor_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            | / (sqrt(aggregate(probe_vec, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
            |    * sqrt(aggregate(neighbor_vec, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("probe_id", "rank", "neighbor_id", "cos")
    }),

    // q_udaf_weighted_avg control: stock sum(x*w)/sum(w) instead of the
    // typed Aggregator.
    "q_udaf_weighted_avg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg((sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
          .as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // q_embed_centroid control: posexplode + groupBy avg instead of the
    // element-wise partial-agg UDAF.
    "q_embed_centroid" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("v"))
        .orderBy("label", "pos")
    }),

    // q_dedup_minhash control: Spark ML MinHashLSH over hashed shingle
    // vectors (the stock near-dup path a plain-Spark user would reach for).
    "q_dedup_minhash" -> ((s, dir) => {
      import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(filter(split(lower(col("text")), "\\W+"), w => length(w) > 0)).as("words"))
        .withColumn("sz", size(col("words")))
        .withColumn("grams", array_distinct(filter(
          transform(col("words"), (_, i) =>
            when(i <= col("sz") - 2, concat_ws(" ",
              element_at(col("words"), i + 1), element_at(col("words"), i + 2)))),
          g => g.isNotNull)))
        .filter(size(col("grams")) > 0)
      val cv = new CountVectorizer().setInputCol("grams").setOutputCol("features")
        .setBinary(true).fit(docs)
      val vecs = cv.transform(docs).select("doc_id", "features")
      val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(32).setSeed(42L).fit(vecs)
      lsh.approxSimilarityJoin(vecs, vecs, 0.2, "jdist")
        .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"),
          (lit(1.0) - col("jdist")).as("jaccard"))
        .filter(col("doc_a") < col("doc_b"))
    }),

    // q_dedup_embedding control: naive all-pairs HOF cosine (what stock
    // Spark offers without an LSH operator).
    "q_dedup_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val a = emb.select(col("vec_id").as("vid_a"), col("embedding").as("v_a"))
      val b = emb.select(col("vec_id").as("vid_b"), col("embedding").as("v_b"))
      a.crossJoin(b).filter(col("vid_a") < col("vid_b"))
        .withColumn("cos", expr(
          """aggregate(zip_with(v_a, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            | / (sqrt(aggregate(v_a, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
            |    * sqrt(aggregate(v_b, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin))
        .filter(col("cos") >= 0.85)
        .select("vid_a", "vid_b", "cos")
    })
  )

  /** Pure-stock graft queries re-run as their own control (variance
    * measurement; plans are identical by construction).
    */
  val stockTwins: Seq[String] = Seq(
    "q1_agg", "q_sql_tpch_q3", "q_sql_tpch_q5", "q_window_rank",
    "q_window_running", "q_sort_multi", "q_limit_topk", "q_distinct",
    "q_explode_tokens", "q_agg_percentile", "q_str_funcs", "q_math_funcs",
    "q_filter_predicates", "q_text_quality", "q_array_higher_order",
    "q_dedup_exact")

  private def timeMedian3(run: () => Unit): Double = {
    val ts = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Tables.scratch("warehouse"))
      // NO GraftExtensions: the control session is stock Spark
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pairs: Seq[(String, (SparkSession, String) => DataFrame)] =
      (stockTwins.map(n => n -> SparkEntry.queries(n)) ++ controls.toSeq).sortBy(_._1)

    // warm both formulations (JIT + codegen caches)
    pairs.foreach { case (n, fn) =>
      try mat(fn(spark, warmDir)) catch { case e: Throwable =>
        System.err.println(s"[baseline-warm] $n: ${e.getMessage}") }
      try mat(SparkEntry.queries(n)(spark, warmDir)) catch { case _: Throwable => () }
    }
    val base = pairs.map { case (n, fn) =>
      n -> timeMedian3(() => mat(fn(spark, sfDir)))
    }
    val graft = pairs.map { case (n, _) =>
      n -> timeMedian3(() => mat(SparkEntry.queries(n)(spark, sfDir)))
    }
    def js(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"baseline":${js(base)},"graft":${js(graft)},"sf":"$sfDir"}""")
    spark.stop()
    sys.exit(0)
  }
}
