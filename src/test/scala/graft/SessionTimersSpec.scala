package graft

import graft.streaming.{SessionTimers, StreamOps}
import org.apache.spark.sql.functions._

class SessionTimersSpec extends SparkSuite {

  test("timer-driven sessionize equals batch sessions closeable under the final watermark") {
    val paced = StreamOps.eventsStreamPaced(spark, sf, 3)
    val got = StreamOps.runToMemory(SessionTimers.run(spark, paced), "append")
      .select("user_id", "s_start", "s_end", "n", "sum_value")
      .orderBy("user_id", "s_start")
      .collect()

    // batch twin: gap sessions; expected-emitted = in-batch-closed (all
    // but each user's last session) + timer-closed (last session whose
    // gap deadline the final watermark passed)
    Tables.registerAll(spark, sf)
    val expected = spark.sql(
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
        |-- ms-floor INCLUSIVE bound = the engine's own timer-expiry
        |-- check (timerTs <= eviction watermark, both floor-ms; see the
        |-- q_stream_timer_sessionize oracle comment)
        |WHERE unix_millis(s_end) <= (SELECT unix_millis(max(ts)) - 600000 FROM events)
        |   OR EXISTS (SELECT 1 FROM agg a2
        |              WHERE a2.user_id = agg.user_id
        |                AND a2.s_start > agg.s_start)
        |ORDER BY user_id, s_start""".stripMargin)
      .collect()

    assert(got.length === expected.length,
      s"emitted ${got.length} sessions, batch twin predicts ${expected.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0))
      assert(g.getTimestamp(1) === e.getTimestamp(1))
      assert(g.getTimestamp(2) === e.getTimestamp(2))
      assert(g.getLong(3) === e.getLong(3))
      assert(math.abs(g.getDouble(4) - e.getDouble(4)) < 1e-6)
    }
  }
}
