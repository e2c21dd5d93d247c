package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Multi-batch streaming semantics that the single-batch oracle queries
  * can't exercise: watermark late-data drops and cross-batch dedup.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("watermark drops late rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData((ts(0), "a"), (ts(3), "a"))   // window [0,5)
    q.processAllAvailable()
    input.addData((ts(60), "a"))                 // watermark → 50min
    q.processAllAvailable()
    input.addData((ts(2), "a"))                  // LATE: before watermark
    q.processAllAvailable()
    input.addData((ts(120), "a"))                // advance further
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_test")
      .select(col("window.start").cast("long").as("w"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(rows(0L) == 2, s"late row must be dropped, got $rows")
  }

  test("checkpoint recovery: kill after first batch, restart, output equals batch agg") {
    val ev = Tables(spark, sf, "events").select("ts", "event_type", "value")
    val (sink, b1, b2) = graft.streaming.StreamOps.runWithRecovery(ev, nSplits = 8, st =>
      st.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n")))
    assert(b1 >= 1, "run 1 must commit at least one batch before the simulated crash")
    assert(b2 >= 1, s"run 2 must resume from the checkpoint and do work (b1=$b1)")
    // batch twin: watermark-finalized windows only (end <= max ts - 10min)
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    val expected = ev
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window.end") <= lit(maxTs) - expr("INTERVAL 10 MINUTES"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val got = sink.select("w_start", "event_type", "n").collect().toSet
    val exp = expected.collect().toSet
    assert(got === exp,
      s"recovered stream output != batch (got ${got.size} rows, expected ${exp.size})")
  }

  test("stateful agg under RocksDB state store matches the batch answer") {
    // the 100 TB state path: HDFS-backed state is heap-bound, RocksDB
    // spills to disk. Same query, same results, different provider.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val agg = graft.streaming.StreamOps.eventsStream(spark, sf)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val got = graft.streaming.StreamOps.runToMemory(agg, "complete")
        .select(col("window.start").as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val exp = Tables(spark, sf, "events")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got === exp)
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("foreachBatch idempotent-by-batchId sink survives kill/restart without duplicates") {
    // the production pattern for arbitrary sinks: partition output by
    // batch_id and dynamically overwrite only the partitions in hand —
    // a replayed batch (same id) rewrites its own partition instead of
    // appending a duplicate, so kill/restart keeps exactly-once output.
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables(spark, sf, "events").select("ts", "event_type", "value")
    val src = Tables.scratch("fb_idem_src")
    val out = Tables.scratch("fb_idem_out")
    val ckpt = Tables.scratch("fb_idem_ckpt")
    ev.repartitionByRange(6, col("ts")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    val q1 = start()
    try {
      while (q1.recentProgress.isEmpty && q1.isActive) Thread.sleep(25)
    } finally q1.stop()
    q1.awaitTermination()
    val q2 = start()
    q2.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() === ev.count(), "row count drifted across kill/restart")
    val gotSum = got.agg(sum("value")).collect()(0).getDouble(0)
    val expSum = ev.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(gotSum - expSum) < 1e-6, s"value sum drifted: $gotSum vs $expSum")
  }

  test("streaming dedup is first-seen across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dd = input.toDF().toDF("id", "v").dropDuplicates("id")
    val q = dd.writeStream.format("memory").queryName("dd_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData((1L, "first"), (2L, "x"))
    q.processAllAvailable()
    input.addData((1L, "second"), (3L, "y"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dd_test").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "first", 2L -> "x", 3L -> "y"))
  }

  test("dropDuplicatesWithinWatermark re-admits keys after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dd = input.toDF().toDF("ts", "id")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dd.writeStream.format("memory").queryName("ddw_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData((ts(0), 1L), (ts(1), 1L))      // in-window dup suppressed
    q.processAllAvailable()
    input.addData((ts(60), 2L))                  // watermark → 55min, id=1 state evicted
    q.processAllAvailable()
    input.addData((ts(61), 1L))                  // same key AFTER eviction: re-emitted
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddw_test").select("id").as[Long].collect().toSeq.sorted
    // bounded state: id=1 appears twice (before and after eviction) —
    // exactly the behavior that keeps state finite at 100 TB
    assert(ids == Seq(1L, 1L, 2L), s"got $ids")
  }

  test("sessionize (emitOpen=false) flushes the open session exactly once via event-time timeout") {
    import graft.streaming.Sessionize
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val sessions = Sessionize.run(spark, events, emitOpen = false)
    val q = sessions.writeStream.format("memory").queryName("sess_mb_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData((7L, ts(10), 1.0), (7L, ts(15), 2.0)) // open session
    q.processAllAvailable()
    input.addData((7L, ts(14), 1.5))                  // same open session, second batch (within delay)
    q.processAllAvailable()
    input.addData((9L, ts(120), 9.0))                 // watermark far past 7's gap deadline
    q.processAllAvailable()
    input.addData((9L, ts(121), 1.0))                 // extra batch: must NOT re-emit user 7
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_mb_test")
      .filter(col("user_id") === 7L)
      .select(col("n"), col("sum_value")).as[(Long, Double)].collect().toSeq
    // exactly ONE session for user 7, containing all three events
    assert(out == Seq((3L, 4.5)), s"got $out")
  }

  test("sessionsOf splits on gap and aggregates") {
    import graft.streaming.Sessionize
    val m = 60L * 1000000
    val evs = Seq((0L * m, 1.0), (5L * m, 2.0), (30L * m, 4.0))
    val out = Sessionize.sessionsOf(7L, evs).toSeq
    assert(out.length == 2)
    assert(out.head.n == 2 && out.head.sum_value == 3.0)
    assert(out.head.s_end_us == 15L * m) // last + 10min gap
    assert(out(1).n == 1 && out(1).s_start_us == 30L * m)
  }
}
