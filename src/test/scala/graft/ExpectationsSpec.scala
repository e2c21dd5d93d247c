package graft

import graft.operators.Expectations
import graft.operators.Expectations.Rule
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq(
    Rule("positive", col("x") > 0),
    Rule("small", col("x") < 100))

  private def df = Seq(
    (1L, 5), (2L, -3), (3L, 200), (4L, 50), (5L, -200)
  ).toDF("id", "x")

  test("audit tags each row with exactly its violated rules") {
    val tags = Expectations.audit(df, rules)
      .select(col("id"), col("__violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(tags(1L) === Seq.empty)
    assert(tags(2L) === Seq("positive"))
    assert(tags(3L) === Seq("small"))
    assert(tags(4L) === Seq.empty)
    assert(tags(5L) === Seq("positive")) // -200 < 100: small holds
  }

  test("split quarantines violators and keeps clean rows tag-free") {
    val (good, bad) = Expectations.split(df, rules)
    assert(good.select("id").as[Long].collect().sorted === Array(1L, 4L))
    assert(!good.columns.contains("__violations"))
    assert(bad.count() === 3)
  }

  test("metrics counts per-rule and all-pass violations") {
    val m = Expectations.metrics(df, rules)
      .as[(String, Long, Long)].collect()
      .map { case (r, v, t) => r -> ((v, t)) }.toMap
    assert(m("positive") === ((2L, 5L)))
    assert(m("small") === ((1L, 5L)))
    assert(m("__all_pass") === ((3L, 5L))) // 3 rows violate something
  }

  test("an unevaluable (NULL) predicate is a violation") {
    val withNull = Seq((1L, Some(5)), (2L, None)).toDF("id", "x")
    val (good, bad) = Expectations.split(withNull, Seq(Rule("positive", col("x") > 0)))
    assert(good.select("id").as[Long].collect() === Array(1L))
    assert(bad.select("id").as[Long].collect() === Array(2L))
  }

  test("reserved, duplicate, and non-identifier rule names are rejected") {
    def bad(rs: Seq[Rule]) =
      intercept[IllegalArgumentException](Expectations.audit(df, rs))
    assert(bad(Seq(Rule("__total", col("id") > 0))).getMessage.contains("reserved"))
    assert(bad(Seq(Rule("__all_pass", col("id") > 0))).getMessage.contains("reserved"))
    assert(bad(Seq(Rule("a", col("id") > 0), Rule("a", col("id") < 9)))
      .getMessage.contains("duplicate"))
    assert(bad(Seq(Rule("has.dot", col("id") > 0))).getMessage.contains("identifier"))
    assert(bad(Seq(Rule("", col("id") > 0))).getMessage.contains("identifier"))
    // a plain identifier still works end-to-end
    assert(Expectations.metrics(df, Seq(Rule("ok_name", col("id") > 0))).count() === 2)
  }
}
