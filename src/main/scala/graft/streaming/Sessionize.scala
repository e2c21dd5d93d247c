package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming (SURVEY §2.B.8): per-user session
  * statistics via `flatMapGroupsWithState` — the custom-state operator
  * the built-in session_window can't express (e.g. carrying value sums
  * and event counts per open session across micro-batches).
  */
object Sessionize {
  case class Ev(user_id: Long, tsMicros: Long, value: Double)
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
    * immediately. With a single AvailableNow batch this emits every
    * session, matching the batch/SQL formulation exactly.
    */
  def run(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.kryo[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Ev]

    val sessions = typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
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
            // single-batch drain: emit the open session too (AvailableNow
            // final batch — no more data will arrive)
            closed.iterator ++ Iterator(sessions.last)
          }
      }
    sessions.toDF()
      .select(col("user_id"),
        expr("timestamp_micros(s_start_us)").as("s_start"),
        expr("timestamp_micros(s_end_us)").as("s_end"),
        col("n"), col("sum_value"))
  }
}
