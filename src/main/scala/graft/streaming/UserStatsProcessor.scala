package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 `transformWithState` surface (SURVEY §2.B.8 "arbitrary
  * stateful op", modern API): a per-user running-aggregate
  * StatefulProcessor with explicit ValueState. Requires the RocksDB
  * state store provider.
  */
object UserStatsProcessor {
  case class Ev(user_id: Long, value: Double)
  case class UserAgg(user_id: Long, n: Long, sum_value: Double, max_value: Double)

  class Proc extends StatefulProcessor[Long, Ev, UserAgg] {
    @transient private var state: ValueState[(Long, Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[(Long, Double, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
      state = getHandle.getValueState[(Long, Double, Double)]("agg", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[UserAgg] = {
      var (n, sum, mx) =
        if (state.exists()) state.get() else (0L, 0.0, Double.NegativeInfinity)
      rows.foreach { e =>
        n += 1; sum += e.value; mx = math.max(mx, e.value)
      }
      state.update((n, sum, mx))
      Iterator(UserAgg(key, n, sum, mx))
    }
  }

  /** Per-user running stats over the events stream (update semantics:
    * each batch emits the refreshed aggregate for touched users).
    */
  def run(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // RocksDB state store comes from StreamOps.ensureRocksDbStateStore
    // (session-wide, applied by every drain path) — no per-query flip
    implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
    implicit val outEnc: Encoder[UserAgg] = Encoders.product[UserAgg]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.select(col("user_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
