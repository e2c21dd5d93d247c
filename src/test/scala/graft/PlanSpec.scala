package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY §4.2): the optimizations we rely on
  * at 100 TB must actually appear in the plan — pushdown, pruning,
  * broadcast choice, no nested-loop joins on the range-join path,
  * whole-stage codegen around the custom expressions.
  */
class PlanSpec extends SparkSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"no pushed filter in: $scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_extendedprice"),
      "column pruning failed — scan reads unused columns")
  }

  test("small dimension joins broadcast") {
    val plan = planOf(SparkEntry.queries("q_join_broadcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q_join_bucketed's managed tables re-plan ANY later join with zero exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // materializing the query writes the bucketed-and-sorted tables
      SparkEntry.queries("q_join_bucketed")(spark, sf).collect()
      // a FRESH join between the co-bucketed tables — not the query's
      // own — is exchange-free: the shuffle was paid once, at write
      val joined = spark.table("graft_bkt_lineitem")
        .join(spark.table("graft_bkt_orders"), "okey")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
        plan.take(3000))
      assert(!plan.contains("Exchange"),
        s"bucketed join re-shuffled:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range join plans as a shuffled equi-join, not BNLJ") {
    val ev = Tables(spark, sf, "events")
    val a = ev.select(col("event_id").as("eid_a"), col("ts").as("ts_a"))
    val b = ev.select(col("event_id").as("eid_b"), col("ts").as("ts_b"))
    val plan = planOf(RangeJoin.timeWindowExact(a, b, "ts_a", "ts_b", 300L))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("RangeJoinRewrite turns the naive interval join into an equi-join") {
    val ev = Tables(spark, sf, "events")
    val a = ev.select(col("event_id").as("eid_a"), col("ts").as("ts_a"))
    val b = ev.select(col("event_id").as("eid_b"), col("ts").as("ts_b"))
    val naive = a.join(b, col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
    val plan = planOf(naive)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rewrite did not fire:\n${plan.take(3000)}")
    // semantics preserved: same row count as the explicit operator
    val explicit = RangeJoin.timeWindowExact(a, b, "ts_a", "ts_b", 300L).count()
    assert(naive.count() == explicit)
  }

  test("custom expressions stay inside whole-stage codegen") {
    val df = Tables(spark, sf, "embeddings")
      .withColumn("c", graft.functions.VectorExpressions.cosine_sim(
        col("embedding"), col("embedding")))
    val plan = planOf(df)
    // "*(n)" is the WholeStageCodegen marker in plan strings; the
    // cosinesim projection must sit inside a codegen'd stage
    assert(plan.contains("*(1) Project") && plan.contains("cosinesim"), plan.take(2000))
    // and codegen actually produces rows
    assert(df.filter(col("c") > 0.99).count() > 0)
  }

  test("bucketed join plans with no shuffle exchange") {
    import graft.operators.Partitioning
    val left = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_quantity").as("qty"))
    val right = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority").as("pri"))
    // disable broadcast so the planner uses the bucketed SMJ path
    // (at scale both sides exceed the broadcast threshold anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Partitioning.bucketedJoin(spark, left, right, "okey", 4,
        "graft_test_bkt_l", "graft_test_bkt_r")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
        plan.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("similarity/overlap joins are candidate-driven — no cartesian product") {
    for (q <- Seq("q_text_ngram_jaccard", "q_text_decontaminate", "q_dedup_minhash")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join leaked into $q:\n${plan.take(3000)}")
    }
  }

  test("clustered write produces non-overlapping per-file key ranges") {
    import graft.operators.Partitioning
    val out = Tables.scratch("clustered_test")
    Partitioning.clusteredWrite(Tables(spark, sf, "orders"), out, 6, "o_totalprice")
    val ranges = spark.read.parquet(out)
      .groupBy(col("_metadata.file_path").as("f"))
      .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .orderBy("mn")
      .collect()
    assert(ranges.length >= 2, "expected multiple files")
    // disjoint ranges ⇒ parquet min/max stats can prune whole files
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(2) <= b.getDouble(1),
          s"file ranges overlap: [${a.getDouble(1)}, ${a.getDouble(2)}] vs [${b.getDouble(1)}, ${b.getDouble(2)}]")
      case _ =>
    }
  }

  test("AQE splits a skewed sort-merge join (skew=true in the final plan)") {
    // the 100 TB skew story: one hot key that would pin a single
    // reducer gets split by AQE's OptimizeSkewedJoin. Thresholds are
    // lowered so the property is testable at fixture scale.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows share key 0; pad widens the hot partition
      val left = spark.range(0, 100000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 120, "0").as("pad"))
      val right = spark.range(0, 2000).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      joined.collect() // materialize so the adaptive plan finalizes
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("kNN join under hot-list probe skew: AQE splits the cluster-keyed join") {
    // IvfIndex.knnJoin's scaladoc names hot lists (many probes probing
    // one cluster) as AQE skew-join territory; this pins the claim: a
    // probe table whose every row lands in ONE inverted list produces
    // one hot shuffle partition on the cluster key, and the final
    // adaptive plan must show OptimizeSkewedJoin splitting it.
    import graft.operators.IvfIndex
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      // fixture-scale thresholds: the hot list's shuffle partition is
      // ~100s of KB pre-compression; shuffle compression shrinks the
      // near-constant vectors hard, so the detection floor sits low
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // corpus: one dense region (one centroid owns it) + scatter
      val rnd = new scala.util.Random(31)
      val hot = (0L until 4000L).map { i =>
        (i, Array.fill(16)(5.0f + (rnd.nextFloat() - 0.5f) * 0.2f)) }
      val scattered = (4000L until 4300L).map { i =>
        (i, Array.fill(16)(rnd.nextFloat() * 4f - 2f)) }
      val corpus = (hot ++ scattered).toDF("vec_id", "embedding")
      val (assigned, centroids) = IvfIndex.fit(corpus, "vec_id", "embedding",
        nCentroids = 4)
      // every probe sits in the dense region → all probe the SAME list
      val probes = (10000L until 11000L).map { i =>
        (i, Array.fill(16)(5.0f + (rnd.nextFloat() - 0.5f) * 0.2f))
      }.toDF("vec_id", "embedding")
      val knn = IvfIndex.knnJoin(assigned, centroids, probes,
        "vec_id", "embedding", k = 3, nProbes = 1)
      // collect() finalizes THIS frame's adaptive plan (a count() would
      // execute a different QueryExecution and leave this one unplanned)
      val n = knn.collect().length
      assert(n === 3000, s"expected 1000 probes x k=3 rows, got $n")
      val plan = knn.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot-list join:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("ANALYZE column stats drive a CBO join reorder") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    for (tbl <- Seq("nation", "customer", "orders")) {
      spark.sql(s"DROP TABLE IF EXISTS graft_cbo_$tbl")
      Tables(spark, sf, tbl).write.mode("overwrite").saveAsTable(s"graft_cbo_$tbl")
      spark.sql(s"ANALYZE TABLE graft_cbo_$tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // ANALYZE populated catalog stats (read from the catalog directly —
    // plan-level rowCount only surfaces when CBO is already on)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_cbo_orders"))
    assert(meta.stats.flatMap(_.rowCount).isDefined,
      "ANALYZE left no rowCount in the catalog")
    // deliberately bad syntactic order: fact ⋈ fact first, the
    // 1-row-filtered dimension last
    val sqlText =
      """SELECT n_name, count(*) AS n
        |FROM graft_cbo_orders
        |JOIN graft_cbo_customer ON o_custkey = c_custkey
        |JOIN graft_cbo_nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'FRANCE' GROUP BY n_name""".stripMargin
    def innermostJoin(cbo: Boolean): String = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try {
        val joins = spark.sql(sqlText).queryExecution.optimizedPlan
          .collect { case j: Join => j }
        joins.last.toString // pre-order traversal ⇒ last = deepest join
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    }
    val without = innermostJoin(cbo = false)
    assert(!without.contains("graft_cbo_nation"),
      s"baseline already joins the dimension first — test is vacuous:\n$without")
    val withCbo = innermostJoin(cbo = true)
    assert(withCbo.contains("graft_cbo_nation"),
      s"CBO did not reorder the selective dimension into the innermost join:\n$withCbo")
  }

  test("shuffle_hash hint flips sort-merge to shuffled hash join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, sf, "lineitem")
      val ord = Tables(spark, sf, "orders")
      val default = planOf(li.join(ord, col("l_orderkey") === col("o_orderkey")))
      assert(default.contains("SortMergeJoin"),
        s"baseline is not SMJ — hint test vacuous:\n${default.take(1500)}")
      val hinted = planOf(li.join(ord.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey")))
      assert(hinted.contains("ShuffledHashJoin"),
        s"shuffle_hash hint ignored:\n${hinted.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("z-order write bounds per-file ranges in BOTH dimensions") {
    import graft.operators.Partitioning
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    val g = li.agg(
      (max("l_orderkey") - min("l_orderkey")).cast("double"),
      (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
    val (ga, gb) = (g.getDouble(0), g.getDouble(1))
    assert(ga > 0 && gb > 0, "degenerate fixture — ranges empty")
    def meanFileRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("l_orderkey") - min("l_orderkey")).cast("double").as("ra"),
          (max("l_suppkey") - min("l_suppkey")).cast("double").as("rb"))
        .agg(avg("ra"), avg("rb")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // 16 files = 4 Morton bits = each dimension quartered: expect ~25%
    // of the global range per file in BOTH dims (0.45 leaves slack for
    // repartitionByRange's sampled boundaries)
    val zpath = Tables.scratch("zorder_layout")
    Partitioning.zorderWrite(li, zpath, 16, "l_orderkey", "l_suppkey")
    val (za, zb) = meanFileRanges(zpath)
    assert(za / ga < 0.45, s"z-order dim A per-file range $za vs global $ga")
    assert(zb / gb < 0.45, s"z-order dim B per-file range $zb vs global $gb")
    // contrast: single-key clustering leaves the second dimension at
    // nearly the full range in every file — no pruning on that axis
    val cpath = Tables.scratch("cluster_layout")
    Partitioning.clusteredWrite(li, cpath, 16, "l_orderkey")
    val (_, cb) = meanFileRanges(cpath)
    assert(cb / gb > 0.8,
      s"single-key layout unexpectedly bounded dim B ($cb vs $gb) — contrast vacuous")
  }

  test("runtime bloom filter injects might_contain on the fact side") {
    // same conf window as q_join_runtime_filter (which localCheckpoints,
    // hiding its plan): thresholds lowered to fixture scale, broadcast
    // off so the join is the shuffle shape InjectRuntimeFilter targets
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      val plan = planOf(df)
      assert(plan.contains("might_contain"),
        s"InjectRuntimeFilter did not fire:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("range-frame window runs at frame granularity and matches the naive form row for row") {
    val got = SparkEntry.queries("q_window_range_frame")(spark, sf)
    // the per-value frame table joins back as a broadcast — the only
    // window in the plan is domain-sized (≤ |quantity domain| rows per
    // flag), never a corpus-sized single-task partition
    val plan = planOf(got)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // exactness of the rewrite: frame membership depends only on the
    // order-key value, so per-(flag, quantity) answers reproduce the
    // naive window's output exactly (the Baseline control)
    val naive = Baseline.controls("q_window_range_frame")(spark, sf)
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      naive.schema.map(f => (f.name, f.dataType)))
    assert(got.collect().toSeq === naive.collect().toSeq)
  }

  test("q1 aggregation is a two-phase hash aggregate") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sf))
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "expected partial+final")
  }

  test("partitioned sink read-back prunes to one partition directory") {
    val out = Tables.scratch("prune_test")
    Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val df = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("l_returnflag"),
      s"partition filter missing from scan:\n$scan")
    // the filter must land in PartitionFilters (dir pruning), not as a
    // data filter over all dirs
    assert(!scan.contains("PushedFilters: [IsNotNull(l_returnflag)"),
      s"partition column leaked into data filters:\n$scan")
  }

  test("MERGE upsert: matched rows update, unmatched survive, new keys insert") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 90.0)).toDF("k", "name", "v")
    val merged = graft.operators.Upsert.merge(target, updates, "k")
      .as[(Long, String, Double)].collect().toSet
    assert(merged === Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("top-k limit uses TakeOrderedAndProject") {
    val plan = planOf(SparkEntry.queries("q_limit_topk")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q_text_mixture: corpus plan window-free; threshold selection is histogram-windowed") {
    // the percentage-form stratified mix must never row_number over
    // partitionBy(source): ~corpus/|sources| rows would sort in one
    // task at 100 TB. The threshold form's CORPUS-side plan is
    // window-free (broadcast filter + bounded-heap tie band); the
    // threshold selection runs as a separate cumsum-window job over
    // the (source, n_words) HISTOGRAM, whose result — one row per
    // source — is the only thing collected (strictly bounded, unlike
    // a histogram collect whose row count is sources × distinct word
    // counts).
    val df = SparkEntry.queries("q_text_mixture")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "corpus-side mixture plan still plans a Window")
    assert(df.count() > 0)
    // the selection job's shape, asserted directly: its windows run
    // over the reducing histogram Aggregate, never corpus-order rows
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("n_words"))
    val hist = docs.groupBy("source", "n_words").agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_words").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sel = hist.withColumn("cum", coalesce(sum("cnt").over(wCum), lit(0L)))
    sel.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.foreach { w =>
      assert(w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, "selection window runs over un-aggregated input")
    }
  }

  test("q_text_mixture on an EMPTY documents table returns an empty frame, no crash") {
    // the former driver-side threshold walk crashed on .max of an
    // empty per-source list; the distributive form must short-circuit
    // to an empty result like the window form it replaced
    val emptyDir = Tables.scratch("mixture_empty_root")
    Tables(spark, sf, "documents").limit(0)
      .write.mode("overwrite").parquet(Tables.path(emptyDir, "documents"))
    val df = SparkEntry.queries("q_text_mixture")(spark, emptyDir)
    assert(df.count() === 0)
  }

  test("q_text_pack_sharded windows partition by (source, shard), never source alone") {
    // the cumsum window must be shard-bounded (span docs max); the
    // base window runs over the shard list. A window partitioned by
    // source alone is the stratum-sized straggler this form removes.
    val df = SparkEntry.queries("q_text_pack_sharded")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.flatMap(_.references.map(_.name)),
          w.orderSpec.flatMap(_.references.map(_.name)))
    }
    assert(windows.nonEmpty)
    windows.foreach { case (partCols, orderCols) =>
      // doc-granularity cumsum must partition by shard too; the only
      // source-alone window is the per-shard base, whose rows ARE the
      // shard list (it orders by shard, not by doc)
      assert(partCols.contains("shard") || orderCols == Seq("shard"),
        s"stratum-sized window: partitionBy=$partCols orderBy=$orderCols")
    }
    assert(df.count() > 0)
    // the sizing rule made checkable: the base window's input is the
    // SHARD LIST — an Aggregate over (source, shard) must sit below
    // any source-partitioned window, and its row count is bounded by
    // idRange/span (+1 per source), metadata-order by construction
    val baseWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if !w.partitionSpec.flatMap(_.references.map(_.name)).contains("shard") => w
    }
    assert(baseWindows.nonEmpty)
    baseWindows.foreach { w =>
      val aggs = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.nonEmpty,
        s"base window runs over un-aggregated (doc-order) input:\n$w")
    }
    val span = 200
    val docs = Tables(spark, sf, "documents")
    val nShardRows = docs.select(col("source"), floor(col("doc_id") / span))
      .distinct().count()
    val idRange = docs.agg(max("doc_id")).head().getLong(0) + 1
    val nSources = docs.select("source").distinct().count()
    assert(nShardRows <= nSources * (idRange / span + 1),
      s"shard list exceeds the sources x idRange/span bound: $nShardRows")
    assert(nShardRows < docs.count(),
      "shard list is corpus-order — span is missized for this corpus")
  }

  test("q_train_pack_efficiency_sharded: the production audit's windows are shard-bounded; fill agrees with the sharded pack") {
    // the fill-rate audit of the SHARDED layout must inherit the same
    // window discipline as the pack itself — per-source cumsum windows
    // (one task per source at 100 TB) are confined to the small-stratum
    // twin q_train_pack_efficiency, whose scaladoc names this verb as
    // the production form
    val df = SparkEntry.queries("q_train_pack_efficiency_sharded")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.flatMap(_.references.map(_.name)),
          w.orderSpec.flatMap(_.references.map(_.name)))
    }
    assert(windows.nonEmpty)
    windows.foreach { case (partCols, orderCols) =>
      assert(partCols.contains("shard") || orderCols == Seq("shard"),
        s"stratum-sized window in the sharded audit: partitionBy=$partCols orderBy=$orderCols")
    }
    // the audit is exactly the pack's sequences rolled up: totals per
    // source must match q_text_pack_sharded's seq_tokens sums, and the
    // sequence counts its distinct seq ids
    val audit = df.select("source", "n_seqs", "total_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val packed = SparkEntry.queries("q_text_pack_sharded")(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("seq_tokens").as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(audit === packed,
      "sharded audit disagrees with the sharded pack's sequences")
  }

  test("funnel's three windows + per-user groupBy share ONE user_id exchange") {
    val plan = planOf(SparkEntry.queries("q_funnel_conversion")(spark, sf))
    // stages stack on the same partitioning: one hash exchange on
    // user_id feeds all three Window operators AND the per-user
    // aggregate; the only other exchange is the final single-partition
    // gather for the global rollup
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges <= 2, s"funnel re-shuffles between stages ($nExchanges exchanges):\n${plan.take(3000)}")
    assert("Window".r.findAllIn(plan).length >= 3, plan.take(3000))
  }

  test("substring dedup and perplexity plans stay equi-join — no cartesian, no BNLJ") {
    // perplexity's one BNLJ is the broadcast of the single-row corpus
    // totals (scalar cross join) — the vocab join itself must stay hash
    val sub = planOf(SparkEntry.queries("q_dedup_substring")(spark, sf))
    assert(!sub.contains("CartesianProduct") && !sub.contains("BroadcastNestedLoopJoin"),
      s"q_dedup_substring fell off the equi-join path:\n${sub.take(2000)}")
    val ppl = planOf(SparkEntry.queries("q_text_perplexity")(spark, sf))
    assert(!ppl.contains("CartesianProduct"), ppl.take(2000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(ppl).length <= 1, ppl.take(2000))
    assert(ppl.contains("HashJoin [tok"), // the vocab-keyed scoring join
      s"vocab join is not an equi hash join:\n${ppl.take(2000)}")
  }

  test("gaps-and-islands: lag + running sum + both groupBys share ONE hash exchange") {
    val plan = planOf(SparkEntry.queries("q_window_islands")(spark, sf))
    // hashpartitioning(user_id) satisfies the (user_id, island) and
    // user_id aggregations by the subset rule, so the only exchanges
    // are the initial user_id hash and the output-ordering range sort
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"islands pipeline re-shuffles ($hashEx hash exchanges):\n${plan.take(3000)}")
    assert("Window".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("every TPC-H subquery shape decorrelates — no nested-loop join in any plan") {
    // Q2 correlated scalar MIN, Q4 correlated EXISTS, Q13 filtered
    // outer join, Q17 correlated scalar AVG, Q20 nested IN-over-
    // aggregate, Q22 uncorrelated scalar gate + NOT EXISTS: all must
    // plan as equi-keyed joins/aggregates. (Q21 has its own deeper
    // assertion below.)
    for (q <- Seq("q_sql_tpch_q2", "q_sql_tpch_q4", "q_sql_tpch_q13",
        "q_sql_tpch_q17", "q_sql_tpch_q20", "q_sql_tpch_q22",
        "q_sql_lateral")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q did not decorrelate:\n${plan.take(2000)}")
    }
  }

  test("Q21's EXISTS / NOT EXISTS decorrelate to semi/anti joins, no nested loop") {
    val plan = planOf(SparkEntry.queries("q_sql_tpch_q21")(spark, sf))
    // the NOT EXISTS correlates on BOTH l1.l_orderkey and the outer
    // o_orderdate — RewritePredicateSubquery must still produce
    // equi-keyed semi/anti joins, never a nested-loop scan of lineitem
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"Q21 subqueries did not decorrelate:\n${plan.take(3000)}")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan.take(3000))
  }

  test("Q19's OR-of-ANDs pushes per-side residuals into BOTH scans") {
    val df = SparkEntry.queries("q_sql_tpch_q19")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    // at 100 TB the whole query is the scans: Catalyst must derive the
    // quantity-only disjunction for the lineitem scan and the
    // brand/size-only disjunction for the part scan rather than
    // evaluating the mixed predicate post-join over every joined row
    val liScan = scans.find(_.contains("lineitem")).getOrElse(fail("no lineitem scan"))
    val pScan = scans.find(_.contains("/part")).getOrElse(fail("no part scan"))
    assert(liScan.contains("PushedFilters") && liScan.contains("Or(") &&
      liScan.contains("l_quantity"),
      s"quantity disjunction not pushed to lineitem:\n$liScan")
    assert(pScan.contains("PushedFilters") && pScan.contains("Or(") &&
      pScan.contains("p_brand"),
      s"brand/size disjunction not pushed to part:\n$pScan")
  }

  test("the remaining TPC-H shapes decorrelate with no nested-loop joins") {
    // Q8/Q9: deep join trees stay hash/broadcast joins; Q11/Q15/Q16:
    // scalar + NOT IN subqueries decorrelate (Q16's NOT IN becomes a
    // null-aware anti join — fine as BNLJ-free only if the build side
    // broadcasts; assert no CartesianProduct and no SMJ-degenerate
    // nested loop on the AGGREGATE path)
    for (q <- Seq("q_sql_tpch_q8", "q_sql_tpch_q9", "q_sql_tpch_q11",
        "q_sql_tpch_q15")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q did not decorrelate:\n${plan.take(2000)}")
    }
  }

  test("hybrid rrf: the fused plan is WINDOW-FREE; fusion has no outer join") {
    // the RRF fusion must stay union + groupBy + heap cut: a full-
    // outer-join fusion cannot broadcast either side, and any window
    // over the fused candidates would funnel a probe's whole candidate
    // union into one sort task. Round 14 retired the last two bounded
    // windows too — the BM25 leg's rank runs through the bounded-heap
    // aggregator and the IVF probe-list rank through the literal-
    // centroid sort_array projection — so the plan-level contract is
    // now total: ZERO Window operators anywhere in the fused plan,
    // and the WindowExec single-partition warning is gone from the
    // logs.
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("q_hybrid_search_rrf")(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: logical.Window => w }
    assert(windows.isEmpty,
      s"fused plan carries ${windows.size} Window operator(s):\n${windows.headOption.map(_.toString.take(800))}")
    val outer = plan.collect {
      case j: logical.Join if j.joinType.sql.contains("OUTER") => j
    }
    assert(outer.isEmpty, "fusion plans an outer join")
    assert(!planOf(df).contains("CartesianProduct"))
  }

  test("index TVF legs carry manifest-derived stats: a TVF-leg join broadcasts cold; the raw search leg does not") {
    // the q_table_stats_bhj pattern extended to the retrieval TVFs:
    // graft_text_search advertises (live n_docs × output row width)
    // from the MANIFEST; graft_ann_search advertises probes × k. The
    // size-only estimator, scaling the pruned postings/list bytes up
    // through the aggregates, lands far above — so at a threshold
    // between the two, ONLY the manifest bound buys the broadcast.
    import graft.operators.{IvfIndex, TextIndex}
    val idx = Tables.scratch("tvf_stats_tidx")
    // padded corpus: three needles in every doc (3 postings buckets
    // feed the raw estimate) + 40 distinct md5 tokens per doc
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"),
      concat(lit("needlea needleb needlec "),
        expr("concat_ws(' ', transform(sequence(1, 40), " +
          "i -> md5(cast(id * 100 + i as string))))")).as("text"))
    val factDir = Tables.scratch("tvf_stats_fact")
    docs.write.mode("overwrite").parquet(factDir)
    TextIndex.buildIndex(docs, "doc_id", "text", idx, nBuckets = 8)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "262144",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "262144")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val fact = spark.read.parquet(factDir)
      assert(fact.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(262144),
        "fact side under the threshold — fixture too small")
      val tvf = spark.sql(s"SELECT * FROM graft_text_search('$idx', 'needlea')")
      // 1) the leg's advertised stats ARE the manifest formula:
      //    live n_docs × (8 + Σ output defaultSize)
      val node = tvf.queryExecution.optimizedPlan.collectFirst {
        case m: graft.plans.ManifestSized => m }
      assert(node.nonEmpty, "TVF plan lost its ManifestSized annotation")
      val width = 8L + node.get.output.map(_.dataType.defaultSize.toLong).sum
      assert(node.get.stats.sizeInBytes === BigInt(4000L * width),
        s"TVF stats not the manifest bound: ${node.get.stats.sizeInBytes}")
      assert(node.get.stats.sizeInBytes < BigInt(262144))
      // 2) the raw (unannotated) search leg estimates ABOVE the
      //    threshold — the separation that proves the BHJ below comes
      //    from the manifest bound alone
      val raw = TextIndex.searchAll(spark, idx, Seq("needlea", "needleb", "needlec"))
      val rawEst = raw.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(rawEst > BigInt(262144),
        s"raw search leg estimate $rawEst under threshold — fixture cannot separate")
      // 3) TVF leg joined to the fact table: broadcast hash join, cold
      val tvf3 = spark.sql(
        s"SELECT * FROM graft_text_search('$idx', 'needlea needleb needlec')")
      val bhj = tvf3.join(fact, "doc_id").queryExecution.executedPlan.toString
      assert(bhj.contains("BroadcastHashJoin"),
        s"manifest-sized TVF leg did not broadcast:\n${bhj.take(2000)}")
      // 4) the same join through the raw leg does NOT broadcast
      val smj = raw.select(col("doc_id"), col("total_tf"))
        .join(fact, "doc_id").queryExecution.executedPlan.toString
      assert(!smj.contains("BroadcastHashJoin"),
        "raw leg unexpectedly broadcast — threshold too high for the fixture")
      // 5) the ANN TVF: probes × k bound, same broadcast outcome
      val vidx = Tables.scratch("tvf_stats_vidx")
      val probesDir = Tables.scratch("tvf_stats_probes")
      val emb = Tables(spark, sf, "embeddings")
      IvfIndex.buildIndex(emb, "vec_id", "embedding", nCentroids = 8, path = vidx)
      emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
        .write.mode("overwrite").parquet(probesDir)
      val ann = spark.sql(
        s"SELECT * FROM graft_ann_search('$vidx', '$probesDir', 5, 8)")
      val annNode = ann.queryExecution.optimizedPlan.collectFirst {
        case m: graft.plans.ManifestSized => m }
      assert(annNode.nonEmpty)
      val annWidth = 8L + annNode.get.output.map(_.dataType.defaultSize.toLong).sum
      assert(annNode.get.stats.sizeInBytes === BigInt(10L * 5L * annWidth))
      val annJoin = ann.join(fact, ann("neighbor_id") === fact("doc_id"))
        .queryExecution.executedPlan.toString
      assert(annJoin.contains("BroadcastHashJoin"),
        s"manifest-sized ANN leg did not broadcast:\n${annJoin.take(2000)}")
      // row-exactness: the annotation changes nothing but the plan
      assert(tvf3.join(fact, "doc_id").count() ===
        raw.join(fact, "doc_id").count())
    } finally prev.foreach { case (c, vOpt) =>
      vOpt.fold(spark.conf.unset(c))(spark.conf.set(c, _))
    }
  }

  test("hybrid/snapshot/branch/changes TVFs carry manifest stats; a filter pushes THROUGH the annotation") {
    // round-15: ManifestSized extended from the text/ANN legs to the
    // remaining TVFs, plus pushdown transparency (a Filter above a TVF
    // used to stop at the annotation boundary)
    import graft.operators.{IvfIndex, Snapshots, TextIndex}
    val factDir = Tables.scratch("tvf2_fact")
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"),
      concat(lit("needlea "),
        expr("concat_ws(' ', transform(sequence(1, 40), " +
          "i -> md5(cast(id * 100 + i as string))))")).as("text"))
    docs.write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "262144",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "262144")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      assert(fact.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(262144))
      def msNode(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collectFirst {
          case m: graft.plans.ManifestSized => m }
      // ── snapshot + branch: EXACT footer cardinality, no job ──
      val root = Tables.scratch("tvf2_snap")
      Snapshots.create(spark, root,
        docs.limit(500).select(col("doc_id"), (col("doc_id") % 7).as("grp")))
      Snapshots.commitMerge(spark, root,
        spark.range(0, 120).select(col("id").as("doc_id"), lit(99L).as("grp")),
        "doc_id")
      val snap1 = spark.sql(s"SELECT * FROM graft_snapshot('$root', 1)")
      assert(msNode(snap1).exists(_.stats.rowCount === Some(BigInt(500))),
        s"graft_snapshot v1 rowCount: ${msNode(snap1).map(_.stats.rowCount)}")
      Snapshots.createBranch(spark, root, "audit")
      Snapshots.commitToBranch(spark, root, "audit",
        docs.limit(200).select(col("doc_id"), lit(1L).as("grp")))
      val br = spark.sql(s"SELECT * FROM graft_branch('$root', 'audit')")
      assert(msNode(br).exists(_.stats.rowCount === Some(BigInt(200))),
        s"graft_branch rowCount: ${msNode(br).map(_.stats.rowCount)}")
      // the branch leg BROADCASTS on a fact join from the bound alone
      // (cold session, no hint, no ANALYZE) — the same plan row the
      // snapshot/changes/hybrid TVFs assert
      val brJoin = br.join(fact, Seq("doc_id"))
        .queryExecution.executedPlan.toString
      assert(brJoin.contains("BroadcastHashJoin"),
        s"manifest-sized branch leg did not broadcast:\n${brJoin.take(2000)}")
      // ── table_changes: bound |v1|+|v2|; the BHJ the raw leg misses ──
      val chg = spark.sql(
        s"SELECT * FROM graft_table_changes('$root', 1, 2, 'doc_id')")
      assert(msNode(chg).exists(_.stats.rowCount === Some(BigInt(1000))),
        s"graft_table_changes bound: ${msNode(chg).map(_.stats.rowCount)}")
      // separation: the raw diff is a full-outer join whose size-only
      // estimate explodes past the threshold — the bound alone buys BHJ
      val rawChg = Snapshots.changes(spark, root, 1, 2, "doc_id")
      assert(rawChg.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(262144),
        "raw changes estimate under threshold — fixture cannot separate")
      val chgJoin = chg.join(fact, Seq("doc_id"))
        .queryExecution.executedPlan.toString
      assert(chgJoin.contains("BroadcastHashJoin"),
        s"manifest-sized changes leg did not broadcast:\n${chgJoin.take(2000)}")
      // ── hybrid: probes × k bound, BHJ on a fact join ──
      val tidx = Tables.scratch("tvf2_tidx")
      TextIndex.buildIndex(docs, "doc_id", "text", tidx, nBuckets = 8)
      val vidx = Tables.scratch("tvf2_vidx")
      val probesDir = Tables.scratch("tvf2_probes")
      val emb = Tables(spark, sf, "embeddings")
      IvfIndex.buildIndex(emb, "vec_id", "embedding", nCentroids = 8, path = vidx)
      emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
        .write.mode("overwrite").parquet(probesDir)
      val hyb = spark.sql(s"SELECT * FROM graft_hybrid_search('$tidx', " +
        s"'$vidx', '$probesDir', 'needlea', 20, 5, 8)")
      val hybNode = msNode(hyb)
      assert(hybNode.exists(_.stats.rowCount === Some(BigInt(50))),
        s"graft_hybrid_search bound: ${hybNode.map(_.stats.rowCount)}")
      val hybJoin = hyb.join(fact, Seq("doc_id"))
        .queryExecution.executedPlan.toString
      assert(hybJoin.contains("BroadcastHashJoin"),
        s"manifest-sized hybrid leg did not broadcast:\n${hybJoin.take(2000)}")
      // ── pushdown transparency: Filter written ABOVE the TVF in SQL
      // swaps below the annotation and reaches the postings scan ──
      val filtered = spark.sql(
        s"SELECT * FROM graft_text_search('$tidx', 'needlea') WHERE doc_id < 100")
      val opt = filtered.queryExecution.optimizedPlan
      assert(opt.isInstanceOf[graft.plans.ManifestSized],
        s"Filter did not push through the annotation; plan root: ${opt.nodeName}")
      // the predicate lands in the scan-side Filter/DataFilters BELOW
      // the aggregate (the PushedFilters display string truncates, so
      // match the pushed data-filter form)
      val phys = filtered.queryExecution.executedPlan.toString
      val pushed = """doc_id#\d+L < 100""".r.findFirstIn(phys)
      assert(pushed.isDefined &&
        phys.indexOf(pushed.get) > phys.lastIndexOf("HashAggregate"),
        s"doc_id predicate never pushed below the aggregate:\n${phys.take(3000)}")
      assert(filtered.count() === 100L)
      // column pruning reaches through the annotation too (the generic
      // UnaryNode pass-through absorbs the Project into the aggregate):
      // the optimized root stays the annotation, its output is pruned
      // to the selected column, and the row bound survives (the stored
      // byte bound keeps the pre-pruning width — a conservative upper
      // bound, which is all a bound must be)
      val projected = spark.sql(
        s"SELECT doc_id FROM graft_text_search('$tidx', 'needlea')")
      val pOpt = projected.queryExecution.optimizedPlan
      assert(pOpt.isInstanceOf[graft.plans.ManifestSized],
        s"projection stripped the annotation; root: ${pOpt.nodeName}")
      assert(pOpt.output.map(_.name) === Seq("doc_id"),
        s"column pruning stopped at the annotation: ${pOpt.output}")
      assert(pOpt.stats.rowCount === Some(BigInt(4000)),
        s"row bound lost under pruning: ${pOpt.stats.rowCount}")
      // LIMIT above the TVF: the annotation floats up and TIGHTENS to
      // min(n, bound) — the broadcast estimate a `tvf LIMIT 10 ⋈ fact`
      // leg should plan from
      val limited = spark.sql(
        s"SELECT * FROM graft_text_search('$tidx', 'needlea') LIMIT 10")
      val lOpt = limited.queryExecution.optimizedPlan
      assert(lOpt.isInstanceOf[graft.plans.ManifestSized],
        s"Limit stripped the annotation; root: ${lOpt.nodeName}")
      assert(lOpt.stats.rowCount === Some(BigInt(10)),
        s"limit did not tighten the bound: ${lOpt.stats.rowCount}")
      assert(limited.count() === 10L)
      // Aggregate above the TVF: output ≤ input, so the bound survives
      // and the aggregated leg stays broadcast-eligible
      val agged = spark.sql(
        s"SELECT doc_id, count(*) AS n FROM graft_text_search('$tidx', 'needlea') GROUP BY doc_id")
      val aOpt = agged.queryExecution.optimizedPlan
      assert(aOpt.isInstanceOf[graft.plans.ManifestSized],
        s"Aggregate stripped the annotation; root: ${aOpt.nodeName}")
      assert(aOpt.stats.rowCount === Some(BigInt(4000)),
        s"aggregate lost the bound: ${aOpt.stats.rowCount}")
      val aggJoin = agged.join(fact, Seq("doc_id"))
        .queryExecution.executedPlan.toString
      assert(aggJoin.contains("BroadcastHashJoin"),
        s"aggregated TVF leg did not broadcast:\n${aggJoin.take(2000)}")
    } finally prev.foreach { case (c, vOpt) =>
      vOpt.fold(spark.conf.unset(c))(spark.conf.set(c, _))
    }
  }

  test("parquetRowCount: footer-exact over flat and partitioned layouts (the TVF builders' job-free cardinality source)") {
    val flat = Tables.scratch("footer_count_flat")
    spark.range(0, 137).write.mode("overwrite").parquet(flat)
    assert(graft.plans.ManifestSized.parquetRowCount(spark, flat) === 137L)
    val part = Tables.scratch("footer_count_part")
    spark.range(0, 137).withColumn("p", col("id") % 3)
      .write.partitionBy("p").mode("overwrite").parquet(part)
    assert(graft.plans.ManifestSized.parquetRowCount(spark, part) === 137L,
      "recursive listing missed partition subdirectories")
    val empty = Tables.scratch("footer_count_empty")
    spark.range(0, 1).limit(0).repartition(1).write.mode("overwrite").parquet(empty)
    assert(graft.plans.ManifestSized.parquetRowCount(spark, empty) === 0L)
    // the per-file footer cache is validated by the listing (path,
    // len, mtime): a REWRITTEN directory must re-count, never serve
    // the stale sum — the mutable-probes-table case
    spark.range(0, 41).repartition(1).write.mode("overwrite").parquet(flat)
    assert(graft.plans.ManifestSized.parquetRowCount(spark, flat) === 41L,
      "footer cache served a stale count after an overwrite")
    assert(graft.plans.ManifestSized.parquetRowCount(spark, flat) === 41L)
  }

  test("fuzzy decontamination: all joins equi — no cartesian, no nested loop") {
    // candidate generation is the prefix-gram equi-join; verification
    // joins back by doc id. A cartesian or BNLJ anywhere means the
    // cross-table similarity join degenerated to all-pairs.
    val plan = planOf(SparkEntry.queries("q_text_decontaminate_fuzzy")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("q_train_temperature_mix: rates join broadcasts; tail sources sampled at a higher rate than the head") {
    // the per-source cut map is |sources| rows — a SortMergeJoin here
    // would shuffle the whole corpus to join against 16 rows
    val df = SparkEntry.queries("q_train_temperature_mix")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // α = 0.5 flattening: inclusion rate r_s = cut/2^32 must be
    // non-increasing in source size (up to the integer-floor step)
    val bySize = rows.map(r => (r.getAs[Long]("n_total"), r.getAs[Long]("cut")))
      .sortBy(_._1)
    bySize.sliding(2).foreach {
      case Array((nSmall, cutSmall), (nBig, cutBig)) if nSmall < nBig =>
        assert(cutSmall >= cutBig,
          s"smaller source ($nSmall docs) got a lower rate than bigger ($nBig)")
      case _ => ()
    }
    // the sample hits the 30% target closely (md5-uniformity at corpus n)
    val total = bySize.map(_._1).sum
    val sampled = rows.map(_.getAs[Long]("n_sampled")).sum
    assert(sampled > total * 2 / 10 && sampled < total * 4 / 10,
      s"sampled $sampled of $total — target was 30%")
  }

  test("q_train_token_budget: selection window runs over one quality bucket, not the corpus; equals the one-window rule") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("q_train_token_budget")(spark, sf)
    // every Window in the plan must sit above a bkt-equality Filter —
    // the whole point of the two-phase form is that the partitionless
    // cumsum never sees more than one bucket's docs
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window => w
    }
    windows.foreach { w =>
      val bucketed = w.child.collect {
        case f: logical.Filter if f.condition.toString.contains("bkt") => f
      }.nonEmpty
      assert(bucketed,
        s"budget window runs un-bucketed:\n${w.child.toString.take(800)}")
    }
    // doc-for-doc equivalence with the single-window prefix rule
    val docs = Tables(spark, sf, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
          .cast("bigint").as("tok"),
        (length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")).cast("double") /
          length(col("text"))).as("q"))
    val budget = 4L * docs.agg(sum("tok")).head.getLong(0) / 10L
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val oneWindow = docs.withColumn("cum", sum("tok").over(wAll))
      .filter(col("cum") <= budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_sel"), sum("tok").as("tok_sel"))
      .orderBy("source").collect().toSeq
    assert(df.collect().toSeq === oneWindow)
  }

  test("q_train_split_cluster: no near-dup pair straddles a split boundary") {
    val df = SparkEntry.queries("q_train_split_cluster")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("no_straddle_ok")))
    // the contract itself, checked pair by pair: every verified
    // near-dup pair lands in ONE split under the cluster assignment
    val docs = Tables(spark, sf, "documents")
    val pairs = graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8, shingleSize = 2)
    val labels = graft.operators.Dedup.duplicateClusters(pairs)
      .withColumnRenamed("doc", "doc_id")
    val u8 = expr("cast(conv(substring(md5(cast(concat('split:', " +
      "cast(label as string)) as binary)), 1, 2), 16, 10) as bigint)")
    val tagged = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
      .withColumn("split",
        when(u8 < 230, "train").when(u8 < 243, "val").otherwise("test"))
      .select("doc_id", "split")
    assert(pairs.count() > 0, "fixture has no near-dup pairs — test is vacuous")
    val straddling = pairs
      .join(tagged.toDF("doc_a", "sa"), "doc_a")
      .join(tagged.toDF("doc_b", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling === 0L, s"$straddling near-dup pairs straddle splits")
  }

  test("q_train_split partitions every source exactly (disjoint + complete)") {
    val df = SparkEntry.queries("q_train_split")(spark, sf)
    val rows = df.collect()
    val perSource = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val truth = Tables(spark, sf, "documents").groupBy("source").count()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(perSource === truth, "split counts do not re-sum to the corpus")
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val n = truth.values.sum.toDouble
    assert(bySplit("train") / n > 0.8 && bySplit.getOrElse("val", 0L) / n < 0.15 &&
      bySplit.getOrElse("test", 0L) / n < 0.15,
      s"split fractions off: $bySplit")
  }

  test("q_train_curriculum: stage assignment is window-free; schedule anneals easy-heavy to uniform") {
    val df = SparkEntry.queries("q_train_curriculum")(spark, sf)
    // two-phase tercile cut: the corpus-side plan must contain NO
    // window (the global-ntile funnel is the control, not the engine)
    val plan = planOf(df)
    assert(!plan.contains("Window"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("planned_tok") <= r.getAs[Long]("stage_tok"),
        s"planned exceeds available: $r")
    }
    // per-epoch doc populations are identical (stages don't move
    // between epochs; only weights do), and the easy-stage share
    // anneals monotonically down from e1 to e3
    val byEpoch = rows.groupBy(_.getAs[String]("epoch"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byEpoch.values.toSet.size == 1, s"epoch populations differ: $byEpoch")
    val easyW = rows.filter(_.getAs[String]("stage") == "easy")
      .sortBy(_.getAs[String]("epoch")).map(_.getAs[Long]("w"))
    assert(easyW.sameElements(easyW.sorted.reverse), s"easy weights not annealing: ${easyW.toSeq}")
  }

  test("q_decontaminate_overlap: rows are eval docs only, overlap bounded, consistent with the binary verb") {
    val df = SparkEntry.queries("q_decontaminate_overlap")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 == 0, s"non-eval doc in report: $r")
      val (ng, nh, bp) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("overlap_bp"))
      assert(nh <= ng && bp >= 0 && bp <= 10000, s"overlap out of bounds: $r")
      assert(bp == nh * 10000 / ng, s"bp arithmetic broken: $r")
    }
  }

  test("q_dedup_cross_source: normalized source pairs; pair total equals the minhash verb's") {
    val df = SparkEntry.queries("q_dedup_cross_source")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    rows.foreach { r =>
      assert(r.getAs[String]("src_lo") <= r.getAs[String]("src_hi"),
        s"unnormalized pair: $r")
    }
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val direct = SparkEntry.queries("q_dedup_minhash")(spark, sf).count()
    assert(total === direct, s"audit total $total != pair count $direct")
  }

  test("q_embed_outliers: label joins broadcast; outlier counts bounded by population") {
    val df = SparkEntry.queries("q_embed_outliers")(spark, sf)
    val plan = planOf(df)
    // both |labels|-row joins are forced broadcasts — a SortMergeJoin
    // here would shuffle the full embedding corpus against 10 rows
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))
      assert(out >= 0 && out < n, s"outliers not a strict subset: $r")
      assert(r.getAs[Double]("max_d2") >= r.getAs[Double]("mean_d2"), s"max < mean: $r")
    }
  }

  test("q_sim_bitext_mining: no cartesian product, no window — both kNN directions are joins + bounded heaps") {
    val df = SparkEntry.queries("q_sim_bitext_mining")(spark, sf)
    val plan = planOf(df)
    // the all-pairs score table (the stock miner's shape) must never
    // materialize: pair generation is the pruned list-id join, both
    // per-probe cuts and the per-src best are partial aggregates
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("margin") >= 1.6))
    // every planted translation (tgt = src + maxId; the embeddings
    // fixture has 500 vectors at sf0.001, planted = ids 0,10,…,490) is
    // mined back to its source
    val mined = rows.map(r =>
      r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    (0L until 500L by 10L).foreach { i =>
      assert(mined.get(i).contains(i + 500L), s"planted pair $i missing")
    }
  }

  test("q_text_cooccur_pmi: top-k via TakeOrdered on integer counts; PMI finite on the cut only") {
    val df = SparkEntry.queries("q_text_cooccur_pmi")(spark, sf)
    val plan = planOf(df)
    // the cut must be a TakeOrdered (never a global sort of the full
    // pair-count table), and pair construction stays inside the array
    // kernel — no per-doc positional self-join (no cartesian; the one
    // BNLJ in this plan is the 1-row broadcast-scalar cross join)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted.reverse), "cut not count-ranked")
    rows.foreach { r =>
      assert(r.getAs[String]("lo") <= r.getAs[String]("hi"), s"unnormalized pair: $r")
      val pmi = r.getAs[Double]("pmi")
      assert(!pmi.isNaN && !pmi.isInfinite, s"non-finite PMI: $r")
    }
  }

  test("q_train_pack_efficiency agrees with q_text_pack's sequences exactly") {
    val eff = SparkEntry.queries("q_train_pack_efficiency")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_seqs"), r.getAs[Long]("total_tok"), r.getAs[Long]("fill_bp"),
         r.getAs[Long]("capacity"))).toMap
    val pack = SparkEntry.queries("q_text_pack")(spark, sf).collect()
      .groupBy(_.getAs[String]("source"))
    assert(eff.keySet === pack.keySet)
    pack.foreach { case (src, seqs) =>
      val (n, tot, bp, cap) = eff(src)
      assert(n == seqs.length, s"$src seq count mismatch")
      val expTot = seqs.map(_.getAs[Long]("seq_tokens")).sum
      assert(tot == expTot && cap == n * 256 && bp == tot * 10000 / cap,
        s"$src rollup disagrees with pack: $n $tot $bp $cap")
    }
  }

  test("EVERY B.9 verb on a zero-row corpus: no crash; index verbs covered by the empty-INDEX erasure drills") {
    // round-15: the per-round empty-corpus patches generalized into one
    // standing net — every LLM-pipeline and snapshot-family verb runs
    // against a fixture where ALL tables are zero-row, and must
    // short-circuit cleanly (empty or spine output), never throw. The
    // failure mode this guards: .max/.head on an empty driver collect,
    // arithmetic on a null scalar row, a zero-task write that leaves an
    // unreadable artifact.
    val emptyDir = Tables.scratch("b9_empty_root")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { tn =>
      Tables(spark, sf, tn).limit(0)
        .write.mode("overwrite").parquet(Tables.path(emptyDir, tn))
    }
    // k-means-backed verbs cannot BUILD over zero rows (an IVF
    // quantizer needs a train set — FAISS refuses an empty add/train
    // the same way); their empty story is the EMPTY-INDEX path: build,
    // erase everything, compact, keep serving — drilled in DedupSpec
    // ("ivf full erasure") and below for the text index. The two
    // streaming ingest verbs ride the paced-snapshot harness and build
    // those same artifacts in-region.
    val needsBuiltArtifact = Set(
      "q_sim_ivf", "q_sim_ivf_pq", "q_sim_ivf_cdc", "q_sim_ivf_delete",
      "q_sim_ivf_incremental", "q_sim_ivf_merge", "q_sim_ivf_rebalance",
      "q_sim_ivf_skew", "q_sim_recall_curve", "q_sim_knn_join", "q_sim_label_knn",
      "q_sim_bitext_mining", "q_sim_bitext_recall",
      "q_sim_filtered_ann", "q_sim_range_search",
      "q_sql_ann", "q_sql_hybrid", "q_hybrid_search_rrf", "q_hybrid_cdc",
      "q_epoch_retention", "q_hybrid_asof", "q_sql_hybrid_asof",
      "q_forget", "q_stream_dedup_ingest", "q_stream_ivf_ingest",
      "q_stream_ivf_autorepair", "q_stream_decontaminate")
    val b9 = (graft.queries.LlmPipeline.queries.keys.toSeq ++
      graft.queries.Sources.queries.keys.filter(_.startsWith("q_table_"))).sorted
    val failures = b9.filterNot(needsBuiltArtifact).flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} B.9 verb(s) crash on a zero-row corpus:\n${failures.mkString("\n")}")
  }

  test("text index full erasure: compacting an all-tombstoned index keeps serving; append re-grows it") {
    // the IVF full-erasure drill's text twin (the q_forget-everything
    // path on the lexical side)
    import graft.operators.TextIndex
    val out = Tables.scratch("text_forget_all")
    val docs = spark.range(0, 30).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma doc "), col("id").cast("string")).as("text"))
    TextIndex.buildIndex(docs, "doc_id", "text", out, nBuckets = 4)
    TextIndex.deleteDocs(docs.select("doc_id"), "doc_id", out)
    TextIndex.compactIndex(spark, out)
    // physically erased, still serving: zero hits, live totals zero
    assert(TextIndex.searchAll(spark, out, Seq("alpha")).count() === 0L)
    assert(TextIndex.bm25(spark, out, Seq("alpha", "beta"), 5).count() === 0L)
    val (nDocs, _) = TextIndex.corpusTotals(spark, out)
    assert(nDocs === 0L, s"erased index still reports $nDocs live docs")
    // and the index re-grows normally
    TextIndex.appendDocs(docs.limit(10), "doc_id", "text", out)
    assert(TextIndex.searchAll(spark, out, Seq("alpha")).count() === 10L)
  }

  test("round-13 curation verbs on an EMPTY documents table: no crash, empty (or all-zero) results") {
    // the q_text_mixture empty-table rule, applied to every new verb
    // with a driver-side histogram walk or broadcast-scalar agg: empty
    // input must short-circuit cleanly (the failure mode is .max/.head
    // on an empty driver collect, or arithmetic on a null scalar row)
    val emptyDir = Tables.scratch("r13_empty_root")
    Tables(spark, sf, "documents").limit(0)
      .write.mode("overwrite").parquet(Tables.path(emptyDir, "documents"))
    val expectEmpty = Seq("q_train_curriculum", "q_train_token_budget",
      "q_train_temperature_mix", "q_train_repeat_epochs", "q_train_split",
      "q_train_split_cluster", "q_decontaminate_overlap", "q_text_gram_novelty",
      "q_dedup_cross_source", "q_text_lang_mix")
    expectEmpty.foreach { name =>
      val n = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n === 0L, s"$name returned $n rows on an empty corpus")
    }
    // the threshold sweep keeps its 4-row spine, zeroed
    val sweep = SparkEntry.queries("q_dedup_threshold_sweep")(spark, emptyDir).collect()
    assert(sweep.length == 4 && sweep.forall(r =>
      r.getAs[Long]("n_pairs") == 0L && r.getAs[Long]("n_docs_b") == 0L),
      s"sweep on empty corpus: ${sweep.mkString(";")}")
    // the chat verbs ride the events table — same rule
    Tables(spark, sf, "events").limit(0)
      .write.mode("overwrite").parquet(Tables.path(emptyDir, "events"))
    Seq("q_chat_flatten", "q_chat_loss_mask").foreach { name =>
      val n = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n === 0L, s"$name returned $n rows on an empty event stream")
    }
    // round-14 verbs, same rule: dsir (broadcast scalars + model
    // joins), soft dedup (CC over zero pairs), sharded pack audit
    // (shard-list windows over zero rows) must all short-circuit clean
    Seq("q_train_dsir", "q_dedup_soft",
        "q_train_pack_efficiency_sharded").foreach { name =>
      val n = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n === 0L, s"$name returned $n rows on an empty corpus")
    }
  }

  test("q_chat_flatten: dialogue reassembles exactly (chars = line lengths + separators); window-free") {
    val df = SparkEntry.queries("q_chat_flatten")(spark, sf)
    assert(!planOf(df).contains("Window"), planOf(df).take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, nc) = (r.getAs[Long]("n_turns"), r.getAs[String]("dialogue"),
        r.getAs[Long]("n_chars"))
      assert(d.count(_ == '\n') == n - 1, s"separator count wrong for conv $r")
      assert(nc == d.length, s"n_chars mismatch: $nc vs ${d.length}")
    }
    // masks and dialogues cover the same conversations with the same weights
    val mask = SparkEntry.queries("q_chat_loss_mask")(spark, sf).collect()
    assert(mask.map(_.getAs[Long]("conv_id")).toSet ===
      rows.map(_.getAs[Long]("conv_id")).toSet)
    mask.foreach { m =>
      val (tot, tr, bp) = (m.getAs[Long]("n_tok_total"), m.getAs[Long]("n_tok_trainable"),
        m.getAs[Long]("mask_bp"))
      assert(tr <= tot && bp == (tot - tr) * 10000 / tot, s"mask bounds broken: $m")
    }
    // per-conv total weight equals dialogue chars minus the separators
    val byConv = mask.map(m => m.getAs[Long]("conv_id") -> m.getAs[Long]("n_tok_total")).toMap
    rows.foreach { r =>
      val expected = r.getAs[Long]("n_chars") - (r.getAs[Long]("n_turns") - 1)
      assert(byConv(r.getAs[Long]("conv_id")) == expected,
        s"mask weights disagree with dialogue chars for $r")
    }
  }

  test("q_dedup_threshold_sweep: curve monotone non-increasing; 0.8 point equals the minhash verb") {
    val rows = SparkEntry.queries("q_dedup_threshold_sweep")(spark, sf)
      .collect().sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs") &&
        lo.getAs[Long]("n_docs_b") >= hi.getAs[Long]("n_docs_b"),
        s"curve not monotone: $lo vs $hi")
    }
    val at08 = rows.head.getAs[Long]("n_pairs")
    val direct = SparkEntry.queries("q_dedup_minhash")(spark, sf).count()
    assert(at08 === direct, s"sweep 0.8 point $at08 != minhash pair count $direct")
  }

  test("q_text_gram_novelty: uniqueness bounded; per-source gram totals re-derivable") {
    val df = SparkEntry.queries("q_text_gram_novelty")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ng, nu, bp) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique"),
        r.getAs[Long]("unique_bp"))
      assert(nu <= ng && bp == nu * 10000 / ng, s"novelty bounds broken: $r")
    }
  }

  test("q_train_repeat_epochs: repeats capped at 4 epochs; planned never exceeds target or cap") {
    val rows = SparkEntry.queries("q_train_repeat_epochs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tgt, rep, pl) = (r.getAs[Long]("n_tok"), r.getAs[Long]("target_tok"),
        r.getAs[Long]("repeat_x100"), r.getAs[Long]("planned_tok"))
      assert(rep <= 400 && rep >= 0, s"repeat out of range: $r")
      assert(pl <= n * 4, s"planned exceeds the 4-epoch cap: $r")
      if (rep < 400) assert(pl <= tgt, s"uncapped source overshoots its target: $r")
    }
  }

  test("q_text_lang_mix: shares sum to one per source; entropy within [0, log2(nlangs)]") {
    val df = SparkEntry.queries("q_text_lang_mix")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val shareSum = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-9, s"$src shares sum to $shareSum")
      val ent = rs.head.getAs[Double]("entropy")
      val bound = math.log(rs.length.toDouble) / math.log(2.0)
      assert(ent >= -1e-12 && ent <= bound + 1e-9,
        s"$src entropy $ent outside [0, $bound]")
    }
  }
}
