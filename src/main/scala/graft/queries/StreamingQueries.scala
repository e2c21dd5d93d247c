package graft.queries

import graft.Tables
import graft.operators.Upsert
import graft.streaming.{SessionTimers, Sessionize, StreamOps, UserStatsProcessor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY §2.B.8), each drained through
  * a memory sink with AvailableNow so the final table is directly
  * comparable to its batch/DuckDB twin. Tumbling/sliding/session
  * windows, watermarked append, streaming dedup, stream-static and
  * stream-stream joins, arbitrary stateful sessionization.
  */
object StreamingQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 5-minute window per event type (complete mode).
    "q_stream_tumbling" -> ((s, dir) => {
      val agg = StreamOps.eventsStream(s, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      StreamOps.runToMemory(agg, "complete")
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Sliding 10-minute window every 5 minutes.
    "q_stream_sliding" -> ((s, dir) => {
      val agg = StreamOps.eventsStream(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      StreamOps.runToMemory(agg, "complete")
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy("w_start")
    }),

    // Session windows (10-minute gap) per user.
    "q_stream_session" -> ((s, dir) => {
      val agg = StreamOps.eventsStream(s, dir)
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      StreamOps.runToMemory(agg, "complete")
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    }),

    // Watermarked tumbling agg in append mode: only windows finalized
    // by the watermark (max ts - 10 min) are emitted.
    "q_stream_watermark" -> ((s, dir) => {
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      StreamOps.runToMemory(agg, "append")
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),

    // Chained windowed aggregation (window-on-window — the multiple-
    // stateful-operator pipeline Spark enabled via SPARK-40925):
    // 5-minute tumbling per-type counts re-aggregated into 15-minute
    // rollups in ONE streaming query, two stateful operators sharing
    // one watermark propagated through window_time(). This is the
    // pre-aggregation cascade of a metrics pipeline (raw → minutely →
    // quarter-hourly) without landing the intermediate anywhere.
    // Append mode: a 15-min rollup emits only once the watermark
    // closes it, and every closed rollup's 5-min subwindows are
    // themselves closed (5 | 15 alignment), so the emitted set is
    // exactly the oracle's HAVING-filtered one.
    "q_stream_chained_agg" -> ((s, dir) => {
      val l1 = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n5"), sum("value").as("v5"))
      val l2 = l1
        .groupBy(window(window_time(col("window")), "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n_subwindows"), sum("n5").as("n_events"),
          max("n5").as("max_5min"), sum("v5").as("sum_value"))
      StreamOps.runToMemory(l2, "append")
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_subwindows"), col("n_events"), col("max_5min"),
          col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Streaming CDC apply: every micro-batch of the paced (3-batch)
    // stream computes its per-user "latest event" delta and MERGEs it
    // into the running snapshot (Upsert.merge: matched keys replaced,
    // unmatched survive, new keys insert) — the foreachBatch upsert
    // loop a lakehouse sink runs in production. Range-split pacing
    // colocates equal timestamps, so the per-batch (ts, event_id)
    // tie-break composes to the global one and the final snapshot must
    // equal the batch-computed latest-event table exactly.
    "q_stream_cdc_upsert" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      var snap = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("last_event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("last_ts",
            org.apache.spark.sql.types.TimestampType))))
      val q = StreamOps.eventsStreamPaced(s, dir, 3)
        .select("user_id", "event_id", "event_type", "ts")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val delta = batch
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(col("user_id"), col("event_type").as("last_event_type"),
              col("ts").as("last_ts"))
          snap = Upsert.merge(snap, delta, "user_id").localCheckpoint()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      snap.orderBy("user_id")
    }),

    // STATE STORE READER (streaming observability): after the
    // AvailableNow drain, read the checkpoint's live aggregation state
    // with spark.read.format("statestore"). Append mode emits+evicts
    // every window the final watermark (max ts − 10 min) has closed, so
    // the surviving state is EXACTLY the complement — the still-open
    // windows — which the oracle predicts with the inverted HAVING of
    // q_stream_watermark. Schema fields are resolved dynamically (key
    // struct = grouping keys, value struct = agg buffer).
    "q_stream_state_reader" -> ((s, dir) => {
      // unique per CALL: the memory sink cannot resume a checkpoint, and
      // Bench invokes each query twice in one JVM (warm + measured)
      val ckpt = graft.Tables.scratch(
        s"state_reader_ckpt_${java.util.UUID.randomUUID().toString.take(8)}")
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      StreamOps.runToMemory(agg, "append", checkpoint = Some(ckpt))
      val st = s.read.format("statestore").load(ckpt)
      val keyFields = st.schema("key").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      val valueField = st.schema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.head
      st.select(
          col(s"key.`${keyFields(0)}`.start").as("w_start"),
          col(s"key.`${keyFields(1)}`").as("event_type"),
          col(s"value.`$valueField`").cast("long").as("n"))
        .orderBy("w_start", "event_type")
    }),

    // Streaming dedup on a key pair (first-seen semantics; output keys
    // only so the result is order-independent).
    "q_stream_dedup" -> ((s, dir) => {
      val dd = StreamOps.eventsStream(s, dir)
        .select("user_id", "event_type")
        .dropDuplicates("user_id", "event_type")
      StreamOps.runToMemory(dd, "append")
        .orderBy("user_id", "event_type")
    }),

    // Bounded-state streaming dedup: dropDuplicatesWithinWatermark
    // evicts key state once the watermark passes — the form that
    // survives 100 TB (unbounded dropDuplicates state-OOMs). Single
    // AvailableNow drain ⇒ output = DISTINCT keys.
    "q_stream_dedup_watermark" -> ((s, dir) => {
      val dd = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
      StreamOps.runToMemory(dd, "append")
        .orderBy("user_id", "event_type")
    }),

    // Stream-static join: events stream against the customer dim.
    "q_stream_static_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val joined = StreamOps.eventsStream(s, dir)
        .join(cust, col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      StreamOps.runToMemory(joined, "complete")
        .orderBy("c_mktsegment")
    }),

    // Stream-stream join with watermarks + time bound: views followed by
    // an error within 10 minutes for the same user.
    "q_stream_stream_join" -> ((s, dir) => {
      val views = StreamOps.eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val errors = StreamOps.eventsStream(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
        .withWatermark("e_ts", "30 minutes")
      val joined = views.join(errors,
        col("v_user") === col("e_user") &&
        col("e_ts") > col("v_ts") &&
        col("e_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      val out = StreamOps.runToMemory(joined, "append")
      out.groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // Stream-stream join under RATE LIMITING (maxFilesPerTrigger=1 over
    // a 3-way time-range split): views buffered in join state in one
    // micro-batch must still match errors arriving batches later. The
    // result must equal the batch join exactly — the 30-min watermark
    // delay exceeds the 10-min join window, so no buffered row can
    // expire before its last possible match arrives (range-split input
    // keeps event time monotone across batches). Same oracle shape as
    // the single-batch variant; what's exercised is cross-batch state.
    "q_stream_stream_paced" -> ((s, dir) => {
      // 3 splits = 2 batch boundaries — enough to exercise cross-batch
      // state; each extra micro-batch costs a full state-commit round
      // (data-volume-independent), so more splits only burn wall-clock
      val src = StreamOps.eventsStreamPaced(s, dir, 3)
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val errors = src.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
        .withWatermark("e_ts", "30 minutes")
      val joined = views.join(errors,
        col("v_user") === col("e_user") &&
        col("e_ts") > col("v_ts") &&
        col("e_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      val out = StreamOps.runToMemory(joined, "append")
      out.groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // Streaming ingestion INTO the versioned table format: each paced
    // micro-batch's per-user latest state commits via
    // Snapshots.commitMerge, so the stream leaves a time-travelable
    // version history (v1 = empty create, v2..v4 = one per batch) —
    // the composition a production CDC pipeline runs (stream → MERGE →
    // snapshot). Emits the final per-user state (== the batch answer,
    // exactly the q_stream_cdc_upsert contract) plus the history
    // invariants: version count and row-count monotonicity (a MERGE
    // only updates or inserts, never deletes).
    // Streaming inverted-index maintenance: documents arrive as a
    // rate-limited multi-batch stream; each micro-batch appends its
    // postings into the persisted TextIndex (O(batch) work — existing
    // posting files are never rewritten). After the drain, search over
    // the incrementally-built index must equal the batch-built answer,
    // and multi_batch proves the ingest actually crossed >=3 batch
    // boundaries rather than degenerating to one bulk build.
    "q_stream_text_index" -> ((s, dir) => {
      import graft.operators.TextIndex
      val idx = graft.Tables.scratch("stream_text_index")
      val q = StreamOps.tableStreamPaced(s, dir, "documents", "doc_id", 3)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          TextIndex.appendDocs(batch, "doc_id", "text", idx)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val nBatches = q.recentProgress.count(_.numInputRows > 0)
      val terms = Seq("hash", "merge", "vector")
      TextIndex.searchAll(s, idx, terms)
        .join(graft.Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang")), "doc_id")
        .orderBy("doc_id")
        .select(col("doc_id"), col("total_tf"), col("lang"),
          lit(nBatches >= 3).as("multi_batch"))
    }),

    "q_stream_snapshot_ingest" -> ((s, dir) => {
      import graft.operators.Snapshots
      val root = graft.Tables.scratch("snap_ingest_tbl")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Snapshots.create(s, root, s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("last_event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("last_ts",
            org.apache.spark.sql.types.TimestampType)))))
      val q = StreamOps.eventsStreamPaced(s, dir, 3)
        .select("user_id", "event_id", "event_type", "ts")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val delta = batch
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(col("user_id"), col("event_type").as("last_event_type"),
              col("ts").as("last_ts"))
          Snapshots.commitMerge(s, root, delta, "user_id")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val vs = Snapshots.versions(s, root)
      val counts = vs.map(v => Snapshots.read(s, root, Some(v)).count())
      val monotone = counts.zip(counts.drop(1)).forall { case (a, b) => a <= b }
      Snapshots.read(s, root)
        .select(col("user_id"), col("last_event_type"), col("last_ts"),
          lit(vs.length).as("n_versions"), lit(monotone).as("history_monotone"))
        .orderBy("user_id")
    }),

    // OUTER stream-stream join: matched pairs emit on match; an
    // unmatched left row emits (with nulls) only once the global
    // watermark passes v_ts + join bound, i.e. the row provably cannot
    // match anymore. The oracle encodes exactly that contract: global
    // watermark = min(max ts per side) − 30 min; unmatched views count
    // only when v_ts + 10 min < watermark. Users with neither matched
    // nor expired-unmatched rows are absent on both sides.
    "q_stream_stream_outer" -> ((s, dir) => {
      val views = StreamOps.eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val errors = StreamOps.eventsStream(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
        .withWatermark("e_ts", "30 minutes")
      val joined = views.join(errors,
        col("v_user") === col("e_user") &&
        col("e_ts") > col("v_ts") &&
        col("e_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      val out = StreamOps.runToMemory(joined, "append")
      out.groupBy(col("v_user").as("user_id"))
        .agg(count(col("e_user")).as("n_matched"),
          count(when(col("e_user").isNull, 1)).as("n_expired_unmatched"))
        .orderBy("user_id")
    }),

    // Update output mode: only changed groups are emitted per batch
    // (single drain batch → one row per group, equal to batch agg).
    "q_stream_update" -> ((s, dir) => {
      val agg = StreamOps.eventsStream(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      StreamOps.runToMemory(agg, "update")
        .orderBy("event_type")
    }),

    // foreachBatch sink: the production pattern for arbitrary
    // (transactional/idempotent-by-batch-id) sinks — each micro-batch
    // lands in parquet, result read back from the files.
    "q_stream_foreach_batch" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val out = graft.Tables.scratch("stream_foreach_batch")
      val agg = StreamOps.eventsStream(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      val q = agg.writeStream
        .outputMode("complete")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).orderBy("event_type")
    }),

    // Checkpoint RECOVERY: watermarked agg → parquet file sink, query
    // killed after its first committed micro-batch, restarted from the
    // same checkpoint, drained. Exactly-once sink commits mean the
    // combined output equals one uninterrupted run — same oracle shape
    // as q_stream_watermark.
    "q_stream_recovery" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("ts", "event_type", "value")
      val (sink, _, _) = StreamOps.runWithRecovery(ev, nSplits = 6, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("w_start"), col("event_type"), col("n")))
      sink.orderBy("w_start", "event_type")
    }),

    // Spark 4 transformWithState: per-user running stats with explicit
    // ValueState (RocksDB state store).
    "q_stream_transform_state" -> ((s, dir) => {
      val out = UserStatsProcessor.run(s, StreamOps.eventsStream(s, dir))
      StreamOps.runToMemory(out, "update")
        .orderBy("user_id")
    }),

    // Arbitrary stateful op: flatMapGroupsWithState sessionization.
    "q_stream_sessionize" -> ((s, dir) => {
      val sessions = Sessionize.run(s, StreamOps.eventsStream(s, dir))
      StreamOps.runToMemory(sessions, "append")
        .orderBy("user_id", "s_start")
    }),

    // transformWithState TIMERS: sessionization where the open session
    // closes because the watermark passed its gap deadline (registered
    // event-time timer), not because another event arrived. Driven by
    // the 3-batch paced source so timers genuinely fire across
    // micro-batch boundaries. Emitted = in-batch-closed sessions plus
    // timer-closed tails; per-user last sessions whose deadline the
    // final watermark (max ts − 10 min) never passes stay in state,
    // and the oracle predicts exactly that complement.
    "q_stream_timer_sessionize" -> ((s, dir) => {
      val sessions = SessionTimers.run(s, StreamOps.eventsStreamPaced(s, dir, 3))
      StreamOps.runToMemory(sessions, "append")
        .orderBy("user_id", "s_start")
    })
  )

  /** Shared SQL fragment: gap-based sessionization twin (also the
    * oracle of the batch session-window query in [[Windows]]). */
  private[queries] val sessionSql =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL 10 MINUTE AS s_end,
      |       user_id, count(*) AS n, sum(value) AS sum_value
      |FROM sessions GROUP BY user_id, sid""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
        |  time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS w_end,
        |  event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,

    "q_stream_sliding" ->
      """SELECT w_start, count(*) AS n, sum(value) AS sum_value FROM (
        |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS w_start, value FROM events)
        |GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q_stream_session" ->
      (sessionSql + " ORDER BY user_id, s_start"),

    "q_stream_watermark" ->
      """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
        |       event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |HAVING time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE
        |       <= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        |ORDER BY w_start, event_type""".stripMargin,

    // the 15-min rollup over 5-min subwindows; emitted = rollups the
    // final watermark (max ts - 10 min) has closed, same rule as
    // q_stream_watermark
    "q_stream_chained_agg" ->
      """WITH l1 AS (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS w_start,
        |    time_bucket(INTERVAL 5 MINUTE, ts) AS w5,
        |    event_type, count(*) AS n5, sum(value) AS v5
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT w_start, event_type,
        |  count(*) AS n_subwindows,
        |  CAST(sum(n5) AS BIGINT) AS n_events,
        |  CAST(max(n5) AS BIGINT) AS max_5min,
        |  sum(v5) AS sum_value
        |FROM l1
        |WHERE w_start + INTERVAL 15 MINUTE
        |      <= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q_stream_cdc_upsert" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_event_type, ts AS last_ts
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // final snapshot = latest event per user (same contract as
    // q_stream_cdc_upsert); 4 versions = empty create + 3 batches
    // identical deliverable to q_text_search_index's oracle, plus the
    // measured multi-batch invariant
    "q_stream_text_index" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                       t -> len(t) > 0)) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
        |       WHERE w IN ('hash', 'merge', 'vector') GROUP BY 1, 2)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS total_tf, d.lang,
        |  TRUE AS multi_batch
        |FROM tf JOIN documents d ON tf.doc_id = d.doc_id
        |GROUP BY tf.doc_id, d.lang
        |HAVING count(*) = 3
        |ORDER BY tf.doc_id""".stripMargin,

    "q_stream_snapshot_ingest" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_event_type, ts AS last_ts,
        |  4 AS n_versions, TRUE AS history_monotone
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the complement of q_stream_watermark's emitted set: windows the
    // final watermark has NOT closed are exactly what stays in state
    "q_stream_state_reader" ->
      """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
        |       event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |HAVING time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE
        |       > (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        |ORDER BY w_start, event_type""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n, sum(value) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_stream_stream_join" ->
      """SELECT v.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
        |  ON v.user_id = e.user_id
        | AND e.ts > v.ts AND e.ts <= v.ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    // rate-limited multi-batch run must still equal the batch join
    "q_stream_stream_paced" ->
      """SELECT v.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
        |  ON v.user_id = e.user_id
        | AND e.ts > v.ts AND e.ts <= v.ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    "q_stream_stream_outer" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
        |wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM e))
        |              - INTERVAL 30 MINUTE AS w),
        |matched AS (
        |  SELECT v.user_id FROM v JOIN e
        |    ON v.user_id = e.user_id
        |   AND e.ts > v.ts AND e.ts <= v.ts + INTERVAL 10 MINUTE),
        |expired AS (
        |  SELECT v.user_id FROM v
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |          WHERE e.user_id = v.user_id
        |            AND e.ts > v.ts AND e.ts <= v.ts + INTERVAL 10 MINUTE)
        |    AND v.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm))
        |SELECT user_id,
        |  (SELECT count(*) FROM matched m WHERE m.user_id = u.user_id) AS n_matched,
        |  (SELECT count(*) FROM expired x WHERE x.user_id = u.user_id) AS n_expired_unmatched
        |FROM (SELECT user_id FROM matched UNION SELECT user_id FROM expired) u
        |ORDER BY user_id""".stripMargin,

    "q_stream_update" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_foreach_batch" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_recovery" ->
      """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
        |       event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |HAVING time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE
        |       <= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        |ORDER BY w_start, event_type""".stripMargin,

    "q_stream_transform_state" ->
      """SELECT user_id, count(*) AS n, sum(value) AS sum_value,
        |       max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_sessionize" ->
      (sessionSql + " ORDER BY user_id, s_start"),

    // Batch twin of the timer path: the gap sessions that are emitted
    // are (a) every session a later same-user event closed in-batch
    // (all but the per-user last) and (b) per-user last sessions whose
    // gap deadline s_end is at or before the final watermark
    // (max ts − 10 min). The remainder is still open in state when the
    // stream drains — by design, matching real streaming semantics.
    // The boundary comparison is written at MILLISECOND floor because
    // that is what the engine evaluates (verified against the Spark
    // 4.1.2 bytecode): timers are registered at s_end_us/1000,
    // TimerStateImpl.getExpiredTimers returns timers with
    // timerTs <= eventTimeWatermarkForEviction (INCLUSIVE), and the
    // watermark is floor-ms(max event time) − delay. A µs-precision
    // `s_end <= max(ts) − 10 min` would disagree whenever s_end lands
    // in the same millisecond as the watermark with a larger sub-ms
    // part — the engine emits, the µs predicate says unemitted.
    "q_stream_timer_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, min(ts) AS s_start,
        |         max(ts) + INTERVAL 10 MINUTE AS s_end,
        |         count(*) AS n, sum(value) AS sum_value
        |  FROM sessions GROUP BY user_id, sid)
        |SELECT user_id, s_start, s_end, n, sum_value
        |FROM agg
        |WHERE epoch_ms(s_end) <= (SELECT epoch_ms(max(ts)) - 600000 FROM events)
        |   OR EXISTS (SELECT 1 FROM agg a2
        |              WHERE a2.user_id = agg.user_id
        |                AND a2.s_start > agg.s_start)
        |ORDER BY user_id, s_start""".stripMargin
  )
}
