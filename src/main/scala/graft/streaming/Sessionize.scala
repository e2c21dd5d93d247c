package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming (SURVEY §2.B.8): per-user session
  * statistics via `flatMapGroupsWithState` — the custom-state operator
  * the built-in session_window can't express (e.g. carrying value sums
  * and event counts per open session across micro-batches).
  */
object Sessionize {
  // `ts` carries the watermarked event-time attribute through to the
  // stateful operator (event-time timeout requires it in the input);
  // tsMicros is the same instant pre-converted for the session math
  case class Ev(user_id: Long, ts: java.sql.Timestamp, tsMicros: Long, value: Double)
  case class SessionState(events: List[(Long, Double)])
  case class SessionOut(user_id: Long, s_start_us: Long, s_end_us: Long,
      n: Long, sum_value: Double)

  val GapMicros: Long = 10L * 60 * 1000000

  /** Split a user's (sorted) events into gap-separated sessions. */
  private[graft] def sessionsOf(
      userId: Long, evs: Seq[(Long, Double)]): Iterator[SessionOut] = {
    if (evs.isEmpty) return Iterator.empty
    val sorted = evs.sortBy(_._1)
    val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
    var start = sorted.head._1
    var last = start
    var n = 0L
    var sum = 0.0
    for ((ts, v) <- sorted) {
      if (ts - last >= GapMicros) {
        out += SessionOut(userId, start, last + GapMicros, n, sum)
        start = ts; n = 0L; sum = 0.0
      }
      last = ts; n += 1; sum += v
    }
    out += SessionOut(userId, start, last + GapMicros, n, sum)
    out.iterator
  }

  /** Streaming sessionization: state holds the open tail of events per
    * user; closed sessions (gap exceeded within the batch) are emitted
    * immediately.
    *
    * `emitOpen = true` (default): the open session is also emitted each
    * invocation — correct ONLY for a single AvailableNow drain batch
    * (matches the batch/SQL formulation exactly).
    *
    * `emitOpen = false`: multi-batch-safe. The open session stays in
    * state and is flushed exactly once via EVENT-TIME TIMEOUT when the
    * watermark passes its gap deadline — callers must set a watermark
    * on `events` upstream.
    */
  def run(spark: SparkSession, events: DataFrame,
      emitOpen: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.kryo[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    val typed = events
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Ev]

    val timeoutConf =
      if (emitOpen) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.EventTimeTimeout()
    val sessions = typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap deadline: flush it
            // exactly once and clear state
            val evs = state.get.events
            state.remove()
            sessionsOf(userId, evs)
          } else {
            val prev = if (state.exists) state.get.events else Nil
            val all = prev ++ rows.map(e => (e.tsMicros, e.value)).toList
            if (all.isEmpty) Iterator.empty
            else {
              val sorted = all.sortBy(_._1)
              // keep the open tail (last gap-run) in state; emit the rest
              val sessions = sessionsOf(userId, sorted).toVector
              val closed = sessions.dropRight(1)
              val openStart = sessions.last.s_start_us
              state.update(SessionState(sorted.filter(_._1 >= openStart)))
              if (emitOpen) {
                // single-batch drain: emit the open session too
                // (AvailableNow final batch — no more data will arrive)
                closed.iterator ++ Iterator(sessions.last)
              } else {
                // flush when the watermark clears last event + gap
                state.setTimeoutTimestamp(sorted.last._1 / 1000 + GapMicros / 1000)
                closed.iterator
              }
            }
          }
      }
    sessions.toDF()
      .select(col("user_id"),
        expr("timestamp_micros(s_start_us)").as("s_start"),
        expr("timestamp_micros(s_end_us)").as("s_end"),
        col("n"), col("sum_value"))
  }
}
