package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven sessionization on the Spark 4 `transformWithState`
  * surface (SURVEY §2.B.8 "transformWithState + timeouts"): the modern
  * replacement for [[Sessionize]]'s event-time-timeout fMGWS path.
  *
  * Per user, state holds the open session's events. Sessions that a
  * later in-batch event closes (gap exceeded) are emitted immediately
  * from `handleInputRows`; the open tail is covered by ONE registered
  * event-time TIMER at its gap deadline (`last event + gap`). When the
  * watermark passes that deadline, `handleExpiredTimer` flushes the
  * session and clears state — the session closes because time passed,
  * not because another event arrived, which is exactly the semantics
  * the fMGWS timeout API provided and `transformWithState` moves to
  * explicit timers.
  *
  * Timer discipline: re-arm on every input batch (delete + register)
  * so each key carries at most one live timer — at scale the timer
  * store stays O(active users), and an expired timer never fires for a
  * session that a later event already extended.
  */
object SessionTimers {
  import Sessionize.{Ev, GapMicros, SessionOut}

  class Proc extends StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var open: ValueState[List[(Long, Double)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[List[(Long, Double)]] =
        Encoders.kryo[List[(Long, Double)]]
      open = getHandle.getValueState[List[(Long, Double)]](
        "open", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[SessionOut] = {
      val prev = if (open.exists()) open.get() else Nil
      val all = (prev ++ rows.map(e => (e.tsMicros, e.value))).sortBy(_._1)
      if (all.isEmpty) return Iterator.empty
      val sessions = Sessionize.sessionsOf(key, all).toVector
      val tail = sessions.last
      open.update(all.filter(_._1 >= tail.s_start_us))
      // one live timer per key: drop the previous deadline, arm the
      // open session's current one (ms — the timer API is ms-grained)
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(tail.s_end_us / 1000)
      sessions.dropRight(1).iterator
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!open.exists()) return Iterator.empty
      val evs = open.get()
      open.clear()
      Sessionize.sessionsOf(key, evs)
    }
  }

  /** Streaming sessionization with timer-driven close (append mode;
    * RocksDB state store; watermark delay 10 min). Sessions whose gap
    * deadline the final watermark never passes stay in state — the
    * caller's oracle must account for them (per-user last session with
    * `s_end > max(ts) - delay` is unemitted).
    */
  def run(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // RocksDB state store comes from StreamOps.ensureRocksDbStateStore
    // (session-wide, applied by every drain path) — no per-query flip
    implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .withWatermark("ts", "10 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.EventTime(), OutputMode.Append())
      .toDF()
      .select(col("user_id"),
        expr("timestamp_micros(s_start_us)").as("s_start"),
        expr("timestamp_micros(s_end_us)").as("s_end"),
        col("n"), col("sum_value"))
  }
}
