package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates (the Delta Live Tables "expectations"
  * shape): a rule set compiles into ONE projection pass — no UDFs, no
  * second scan — that tags every row with the names of the rules it
  * violates. From that single tagged plan, callers split good/bad rows
  * (quarantine pattern) or roll up per-rule violation counts; Catalyst
  * dedups the shared subplan, so gate + split + audit costs one read
  * of the input at any scale.
  *
  * A training-data pipeline runs these between every ingest and its
  * consumers: rows that fail land in a quarantine table for triage
  * instead of silently poisoning the corpus downstream.
  */
object Expectations {

  /** One named expectation: `predicate` must hold for the row to pass. */
  final case class Rule(name: String, predicate: Column)

  private val ViolationsCol = "__violations"

  /** Tag each row with the array of rule names it violates (empty =
    * clean row). NULL predicate results count as violations — an
    * expectation that cannot be evaluated is not satisfied.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    validateNames(rules)
    val tags = rules.map(r =>
      when(coalesce(r.predicate, lit(false)), lit(null: String))
        .otherwise(lit(r.name)))
    df.withColumn(ViolationsCol,
      filter(array(tags: _*), t => t.isNotNull))
  }

  /** (rows passing every rule, quarantined rows still carrying their
    * violation tags).
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = audit(df, rules)
    (tagged.filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol),
      tagged.filter(size(col(ViolationsCol)) > 0))
  }

  /** Rule names become aggregate column names in `metrics` (alongside
    * the reserved `__total`/`__all_pass`) and violation tags in
    * `audit`. A duplicate, reserved, or non-identifier name would
    * silently corrupt the rollup (or throw a misleading analysis
    * error), so reject it up front with a message naming the rule.
    */
  private def validateNames(rules: Seq[Rule]): Unit = {
    val reserved = Set("__total", "__all_pass", ViolationsCol)
    val dupes = rules.groupBy(_.name).collect { case (n, rs) if rs.sizeIs > 1 => n }
    require(dupes.isEmpty, s"duplicate rule names: ${dupes.mkString(", ")}")
    rules.foreach { r =>
      require(!reserved(r.name), s"rule name '${r.name}' is reserved")
      require(r.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"rule name '${r.name}' is not a plain identifier " +
          "([A-Za-z_][A-Za-z0-9_]*) — dots/spaces would be parsed as " +
          "nested-field references in the metrics rollup")
    }
  }

  /** One row per rule: violation count + violation rate, plus a final
    * `__all_pass` row counting rows that pass every rule.
    */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val tagged = audit(df, rules)
    val perRule = rules.map(r =>
      sum(when(array_contains(col(ViolationsCol), r.name), 1L).otherwise(0L))
        .as(r.name))
    val allPass = sum(when(size(col(ViolationsCol)) === 0, 1L).otherwise(0L))
      .as("__all_pass")
    val counts = tagged.agg(count(lit(1)).as("__total"), (perRule :+ allPass): _*)
    // unpivot to (rule, n_violations, total) — stable shape however
    // many rules the caller declares
    val total = col("__total")
    val rows = rules.map(r =>
      struct(lit(r.name).as("rule"), col(r.name).as("n_violations"), total.as("n_total"))) :+
      struct(lit("__all_pass").as("rule"),
        (total - col("__all_pass")).as("n_violations"), total.as("n_total"))
    counts.select(explode(array(rows: _*)).as("m"))
      .select(col("m.rule"), col("m.n_violations"), col("m.n_total"))
  }
}
