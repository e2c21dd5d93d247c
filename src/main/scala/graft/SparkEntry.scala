package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups live under `graft.queries`; each exposes a
  * `queries` map (name → (spark, sfDir) => DataFrame) and an `oracle`
  * map (name → equivalent DuckDB SQL). Names are stable across rounds.
  */
object SparkEntry {
  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (Aggregates.queries, Aggregates.oracle),
      (Windows.queries, Windows.oracle),
      (Joins.queries, Joins.oracle),
      (Scalars.queries, Scalars.oracle),
      (LlmPipeline.queries, LlmPipeline.oracle),
      (StreamingQueries.queries, StreamingQueries.oracle),
      (Sources.queries, Sources.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
