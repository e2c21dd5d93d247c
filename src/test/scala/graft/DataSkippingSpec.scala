package graft

import graft.operators.DataSkipping
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  // the operator's own observable: numFiles of the executed scan
  private def scannedFiles(df: DataFrame): Long = DataSkipping.scannedFiles(df)

  private def freshTable(name: String): String = {
    val out = Tables.scratch(name)
    (1 to 1000).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    out
  }

  test("footer-stats build is bit-identical to the aggregate-job build; unsupported types fall back, not break") {
    // mixed table: long + date (exact footer types) and string (binary
    // bounds may be truncated by the writer → must take the job path);
    // one column carries nulls so the all-null-chunk rule is exercised
    val out = Tables.scratch("skip_footer_tbl")
    (1 to 400).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000 + i / 7)),
        if (i % 5 == 0) null else s"v$i")
    }.toDF("k", "d", "s")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    // independent recompute: the aggregate the footer path must match
    def recompute(cols: Seq[String]) = {
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
        count(lit(1)).as("n_rows")
      spark.read.parquet(out)
        .groupBy(col("_metadata.file_path").as("file_path"))
        .agg(aggs.head, aggs.tail: _*)
    }
    def canon(df: DataFrame, cols: Seq[String]) = df
      .collect().map { r =>
        val p = new org.apache.hadoop.fs.Path(r.getAs[String]("file_path")).toString
        (p, cols.flatMap(c => Seq(r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c"))),
          r.getAs[Long]("n_rows"))
      }.sortBy(_._1).toSeq
    // exact-footer columns: buildIndex takes the footer path (zero data
    // scan) and must equal the recompute exactly, dates and all
    DataSkipping.buildIndex(spark, out, Seq("k", "d"))
    assert(canon(DataSkipping.index(spark, out), Seq("k", "d")) ===
      canon(recompute(Seq("k", "d")), Seq("k", "d")),
      "footer bounds diverged from the aggregate job")
    // string column: footer path refuses (truncation risk) and the
    // aggregate fallback still yields exact bounds incl. nulls
    DataSkipping.buildIndex(spark, out, Seq("k", "s"))
    assert(canon(DataSkipping.index(spark, out), Seq("k", "s")) ===
      canon(recompute(Seq("k", "s")), Seq("k", "s")),
      "fallback bounds diverged for a binary column")
  }

  test("planner-integrated scan prunes files from the query's own filters") {
    val out = freshTable("skipscan_tbl")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val total = spark.read.parquet(out).inputFiles.length
    assert(total === 8)

    // range filter: only the overlapping files are scanned
    val range = DataSkipping.scan(spark, out).filter(col("k") >= 100 && col("k") <= 200)
    assert(scannedFiles(range) < total)
    assert(range.count() === 101)

    // equality filter prunes to one file
    val eq = DataSkipping.scan(spark, out).filter(col("k") === 500)
    assert(scannedFiles(eq) === 1)
    assert(eq.count() === 1)

    // IN-list prunes to exactly the files holding a listed value
    val in = DataSkipping.scan(spark, out).filter(col("k").isin(5L, 900L))
    assert(scannedFiles(in) === 2)
    assert(in.count() === 2)

    // a non-indexed predicate is conservatively unpruned but exact
    val other = DataSkipping.scan(spark, out).filter(col("v") === "v42")
    assert(scannedFiles(other) === total)
    assert(other.count() === 1)

    // results are identical to the plain read, file layout or not
    val expected = spark.read.parquet(out)
      .filter(col("k") >= 100 && col("k") <= 200).orderBy("k").collect()
    assert(range.orderBy("k").collect() === expected)
  }

  test("a two-column index prunes on every indexed column's conjunct") {
    val out = Tables.scratch("skipscan_2col")
    // k ascending, m descending — a conjunct on each column rules out
    // opposite ends of the file sequence, so the intersection is
    // strictly smaller than either predicate alone achieves
    (1 to 1000).map(i => (i.toLong, (1000 - i).toLong, s"v$i"))
      .toDF("k", "m", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("k", "m"))
    val kOnly = scannedFiles(
      DataSkipping.scan(spark, out).filter(col("k") >= 200))
    val mOnly = scannedFiles(
      DataSkipping.scan(spark, out).filter(col("m") >= 200))
    val both = DataSkipping.scan(spark, out)
      .filter(col("k") >= 200 && col("m") >= 200)
    val bothFiles = scannedFiles(both)
    assert(bothFiles < kOnly && bothFiles < mOnly)
    assert(both.count() === spark.read.parquet(out)
      .filter(col("k") >= 200 && col("m") >= 200).count())
  }

  test("the index is authoritative for skipping only, never membership") {
    val out = freshTable("skipscan_member")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    // a file appended AFTER buildIndex — unindexed, must always scan
    Seq((5000L, "late")).toDF("k", "v")
      .write.mode("append").parquet(out)
    val df = DataSkipping.scan(spark, out).filter(col("k") >= 4000)
    assert(df.count() === 1) // the late row is found
    // readRange honors the same contract (the two-phase API)
    assert(DataSkipping.readRange(spark, out, "k", 4000L, 6000L).count() === 1)
    // and stale bounds still prune what they can prove absent
    assert(scannedFiles(DataSkipping.scan(spark, out)
      .filter(col("k") >= 100 && col("k") <= 200)) < 9)
  }

  test("statsOnly answers from metadata, reconciled against the live listing both ways") {
    val out = freshTable("skipscan_stats")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val indexed = spark.read.parquet(out).inputFiles.toSet

    // fully indexed: exact count/min/max with ZERO Spark jobs — the
    // index reads on the driver (manifest discipline), so the whole
    // answer is a listing + a sidecar read and the result is a
    // LocalRelation (no files in its plan either)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val s0 = try {
      val df = DataSkipping.statsOnly(spark, out, Seq("k"))
      Thread.sleep(1000) // listener delivery is async
      df
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs === 0, s"fully-indexed statsOnly launched $jobs Spark jobs")
    assert(s0.inputFiles.isEmpty)
    assert(s0.collect().head.toSeq === Seq(1000L, 1L, 1000L))

    // append after indexing: the fresh file is scanned (eagerly, inside
    // statsOnly) and folded in — values exact over index + fresh
    Seq((5000L, "late")).toDF("k", "v").write.mode("append").parquet(out)
    val s1 = DataSkipping.statsOnly(spark, out, Seq("k"))
    assert(s1.collect().head.toSeq === Seq(1001L, 1L, 5000L))

    // delete an indexed file: its index row must stop counting
    val victim = new org.apache.hadoop.fs.Path(indexed.head)
    victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(victim, false)
    val after = DataSkipping.statsOnly(spark, out, Seq("k")).collect().head
    assert(after.getLong(0) ===
      spark.read.parquet(out).count())
  }

  test("bloom index: no false negatives on present keys, absent probes prune") {
    val out = Tables.scratch("skipscan_bloom")
    // uuid-shaped key: md5 destroys clustering, so every file's
    // [min, max] spans the whole domain and bounds alone never prune —
    // exactly the layout blooms exist for
    val ids = (1 to 1000).map(i => s"id-${i}")
    ids.map(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(id), id))
      .toDF("uid", "src")
      .repartition(8)
      .write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("uid"), bloomCols = Seq("uid"))
    val total = spark.read.parquet(out).inputFiles.length

    def uidOf(i: Int): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"id-$i")

    // EVERY present key must be found — a single miss is a silently
    // dropped row, the failure class blooms must never introduce
    val presentProbes = (1 to 1000 by 97) :+ 1 :+ 1000
    presentProbes.foreach { i =>
      val hit = DataSkipping.scan(spark, out).filter(col("uid") === uidOf(i))
      assert(hit.count() === 1, s"present key id-$i must survive bloom pruning")
    }

    // absent = / IN / >10-value InSet probes prune files (bounds can't:
    // every file spans the domain, so any pruning here is the bloom's)
    val absentEq = DataSkipping.scan(spark, out)
      .filter(col("uid") === org.apache.commons.codec.digest.DigestUtils.md5Hex("absent-1"))
    assert(scannedFiles(absentEq) < total)
    assert(absentEq.count() === 0)

    val absentIn = DataSkipping.scan(spark, out)
      .filter(col("uid").isin((1 to 3).map(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"absent-$i")): _*))
    assert(scannedFiles(absentIn) < total)
    assert(absentIn.count() === 0)

    // >10 values: the optimizer rewrites In → InSet; still pruned
    val absentInSet = DataSkipping.scan(spark, out)
      .filter(col("uid").isin((1 to 12).map(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"absent-$i")): _*))
    assert(scannedFiles(absentInSet) === 0)
    assert(absentInSet.count() === 0)

    // a mixed InSet (11 absent + 1 present) still returns the present row
    val mixed = DataSkipping.scan(spark, out)
      .filter(col("uid").isin(((1 to 11).map(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"absent-$i")) :+ uidOf(500)): _*))
    assert(mixed.count() === 1)
    assert(mixed.select("src").as[String].collect() === Array("id-500"))
  }

  test("blooms with an unrecognized format version are ignored, not probed") {
    val out = Tables.scratch("skipscan_bloomver")
    (1 to 200).map(i => (s"k$i", i)).toDF("uid", "n")
      .repartition(4).write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("uid"), bloomCols = Seq("uid"))
    val idxDir = s"$out/_skip_index"
    // simulate an index written by a different binary: bump bloom_fmt
    val rewritten = spark.read.parquet(idxDir).withColumn("bloom_fmt", lit(99))
    val tmp = Tables.scratch("skipscan_bloomver_tmp")
    rewritten.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(idxDir)
    val total = spark.read.parquet(out).inputFiles.length
    // a probe that a (mis)matched bloom would prune: "k21x" is absent
    // but inside every file's [min, max] (hash layout), so only a bloom
    // could prune it — with the version unrecognized the bloom must NOT
    // be consulted: all files scanned, and present rows still returned
    val absent = DataSkipping.scan(spark, out).filter(col("uid") === "k21x")
    assert(scannedFiles(absent) === total)
    val present = DataSkipping.scan(spark, out).filter(col("uid") === "k7")
    assert(present.count() === 1)
  }

  test("every-file-skipped range returns empty, correctly typed") {
    val out = freshTable("skipscan_empty")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val none = DataSkipping.scan(spark, out).filter(col("k") > 99999)
    assert(scannedFiles(none) === 0)
    assert(none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(DataSkipping.readRange(spark, out, "k", 99999L, 999999L).count() === 0)
  }

  test("partitioned (nested) layout: statsOnly and readRange resolve the nested files, never an empty top-level listing") {
    // a partitionBy write puts every data file under p=<v> subdirs: the
    // top-level listing holds NO files, and the flat fast paths must
    // fall back to the recursive resolution instead of silently
    // reporting an empty table
    val out = Tables.scratch("skipscan_nested")
    (1 to 1000).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("k", "p", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").partitionBy("p").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val stats = DataSkipping.statsOnly(spark, out, Seq("k")).head()
    assert(stats.getAs[Long]("n_rows") === 1000L,
      "nested layout mis-resolved: statsOnly lost the partition files")
    assert(stats.getAs[Long]("min_k") === 1L && stats.getAs[Long]("max_k") === 1000L)
    val got = DataSkipping.readRange(spark, out, "k", 100L, 120L)
    assert(got.count() === 21)
    // partition column survives the file-list read (basePath)
    assert(got.select("p").distinct().count() === 4)
    // append un-indexed rows INTO a partition dir: statsOnly must fold
    // them in via the fresh-file scan, partition column intact
    Seq((5000L, 2, "x")).toDF("k", "p", "v")
      .write.mode("append").partitionBy("p").parquet(out)
    val stats2 = DataSkipping.statsOnly(spark, out, Seq("k")).head()
    assert(stats2.getAs[Long]("n_rows") === 1001L)
    assert(stats2.getAs[Long]("max_k") === 5000L)
  }

  test("mixed layout (top-level files next to partition subdirs) refuses the flat fast path") {
    // a flat table that later gained a partition-style subdirectory —
    // the fast path's top-level listing would silently drop the nested
    // file, so mixed layouts must take the stock resolution
    val out = Tables.scratch("skipscan_mixed")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val sub = new org.apache.hadoop.fs.Path(s"$out/extra")
    val fs = sub.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(sub)
    Seq((500L, "nested")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/extra/part")
    // Spark's own recursive resolution of this layout is the oracle
    val live = spark.read.parquet(out).count()
    assert(DataSkipping.readRange(spark, out, "k", 0L, 10000L).count() === live)
    assert(DataSkipping.statsOnly(spark, out, Seq("k"))
      .head().getAs[Long]("n_rows") === live)
  }

  test("string bounds against a timestamp column coerce with the session timezone") {
    val out = Tables.scratch("skipscan_tz")
    (0 until 240).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(i.toLong)))
    }.toDF("k", "ts")
      .repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("ts"))
    // string lo/hi need a timezone-aware Cast on the driver — a
    // zone-less Cast throws at eval; the result must match the engine's
    // own string-vs-timestamp comparison semantics
    val got = DataSkipping.readRange(spark, out, "ts",
      "2024-01-02 00:00:00", "2024-01-03 00:00:00")
    val want = spark.read.parquet(out).filter(
      col("ts") >= lit("2024-01-02 00:00:00") &&
        col("ts") <= lit("2024-01-03 00:00:00"))
    assert(got.count() === want.count() && got.count() === 25)
    assert(got.inputFiles.length < spark.read.parquet(out).inputFiles.length,
      "timestamp bounds should have pruned files on a ts-sorted layout")
  }

  test("footer-stats build parallelizes: bit-identical to the sequential loop, measurably faster at 500 files") {
    val out = Tables.scratch("skipscan_manyfiles")
    // ≥500 files, one row group each, exact-footer type
    (1 to 2000).map(i => (i.toLong, i * 2L)).toDF("k", "w")
      .repartition(500).write.mode("overwrite").parquet(out)
    val nFiles = spark.read.parquet(out).inputFiles.length
    assert(nFiles >= 500)
    def run(par: Int): (Seq[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val df = DataSkipping.footerStats(spark, out, Seq("k", "w"), parallelism = par)
        .getOrElse(fail("footer path refused an exact-footer table"))
      val rows = df.collect().toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(1); run(16) // JIT/page-cache warmup for both paths
    val (seqRows, seqSec) = run(1)
    val (parRows, parSec) = run(16)
    // order-preserving fan-out ⇒ the built index is BYTE-identical
    assert(parRows === seqRows, "parallel footer build diverged from sequential")
    val speedup = seqSec / parSec
    info(f"footer build over $nFiles files: sequential $seqSec%.3f s, " +
      f"parallel(16) $parSec%.3f s — ${speedup}%.1fx")
    // the BENCH.md row records the headline ratio; the spec gate stays
    // loose enough to survive a loaded CI box
    assert(speedup >= 2.0,
      f"parallel footer build only ${speedup}%.1fx faster than sequential")
  }

  test("pooled footer build surfaces the worker's own exception, not the pool wrapper") {
    val out = Tables.scratch("skipscan_corrupt")
    (1 to 100).map(i => (i.toLong, i * 2L)).toDF("k", "w")
      .repartition(8).write.mode("overwrite").parquet(out)
    // corrupt ONE data file, named to sort after the clean ones so the
    // schema probe (files.head) still succeeds and the failure lands
    // inside the pooled per-file reads
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bad = new org.apache.hadoop.fs.Path(out, "zzz-corrupt.parquet")
    val os = fs.create(bad, true)
    os.write("not a parquet file".getBytes("UTF-8")); os.close()
    val e = intercept[Exception] {
      DataSkipping.footerStats(spark, out, Seq("k", "w"), parallelism = 16)
    }
    // the serial path's contract: callers see the reader's raw
    // exception type (an IOException/RuntimeException), never the
    // pool's ExecutionException wrapper
    assert(!e.isInstanceOf[java.util.concurrent.ExecutionException],
      s"pool wrapper leaked: ${e.getClass.getName}")
  }
}
