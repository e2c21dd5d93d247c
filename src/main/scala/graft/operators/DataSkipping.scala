package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping over a parquet table — the
  * statistics half of the metadata pruning the reference's declared
  * ecosystem gets from Iceberg manifests / Delta transaction logs
  * (reference `README.md:75-88`): each data file carries per-column
  * min/max bounds in a tiny side index, and a range-predicate read
  * resolves ONLY the files whose interval overlaps the predicate —
  * the others cost zero I/O, zero listing, zero scan tasks.
  *
  * This is distinct from (and composes with) partition pruning:
  * partitioning prunes on the one coarse dir key; file skipping prunes
  * on any indexed column, and pays off exactly when the write layout
  * clusters that column (sorted/range-partitioned/Z-ordered writes —
  * see `Partitioning.zorderWrite`). At 100 TB a one-day predicate over
  * a date-sorted fact table touches O(day) files instead of O(table),
  * which is the difference between an interactive query and a full
  * scan; the index itself is O(files × cols) — metadata-sized, read on
  * the driver like Iceberg's manifest files.
  *
  * The index is ONE Spark job regardless of file count — an aggregate
  * grouped by `_metadata.file_path` (no per-file driver loop, no
  * footer round-trips) — and the skip decision keeps correctness out
  * of the index's hands: the residual predicate is always re-applied
  * to the surviving files, so bounds only ever REDUCE I/O, exactly
  * Parquet's own row-group-stats contract one level up.
  */
object DataSkipping {
  private val IndexDir = "_skip_index"

  /** Build (or rebuild) the min/max index for `cols` over the parquet
    * table at `tableDir`. One aggregation job: per-file min, max, and
    * row count for every indexed column, written as a single-file
    * parquet index beside the data (metadata-sized: O(files × cols)).
    */
  def buildIndex(spark: SparkSession, tableDir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one column to index")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    spark.read.parquet(tableDir)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tableDir/$IndexDir")
  }

  /** The index as a DataFrame (file_path, min_X/max_X per indexed
    * column, n_rows) — the `files` metadata-table analog. */
  def index(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(s"$tableDir/$IndexDir")

  /** Files the index can RULE OUT for `column` vs [lo, hi] — the skip
    * decision, evaluated on the metadata-sized index (driver collect of
    * O(files) paths, like Iceberg's manifest scan; see the driver-
    * ceiling note on readRange). Files with a NULL bound (all-null
    * column chunk) are kept: bounds may only prove absence, never
    * presence.
    */
  private def skippableFiles(spark: SparkSession, tableDir: String,
      column: String, lo: Column, hi: Column): Set[String] = {
    val mn = col(s"min_$column")
    val mx = col(s"max_$column")
    index(spark, tableDir)
      .filter(mn.isNotNull && mx.isNotNull && (mx < lo || mn > hi))
      .select("file_path")
      .collect().map(r => normalize(r.getString(0))).toSet
  }

  private def normalize(path: String): String = new Path(path).toString

  /** Read `tableDir` restricted to rows with `column` in [lo, hi],
    * scanning only the files the index cannot rule out. The index is
    * authoritative ONLY for skipping, never for membership: the live
    * table listing is the source of truth, and a data file the index
    * has never seen (appended or compacted after `buildIndex`) is
    * always scanned — stale bounds can only cost I/O, never rows. The
    * residual between-filter is re-applied, so the result is exact
    * whatever the file layout; the file-set reduction is observable via
    * `df.inputFiles`. Returns an empty (correctly-typed) frame when
    * every file is skipped.
    *
    * Driver ceiling: the surviving-path Seq and the index collect are
    * O(files) driver-side — the Iceberg-manifest trade-off, fine to
    * O(10^5) files. Beyond that the index should back a custom
    * `FileIndex` so pruning stays inside the scan planner; at that
    * scale the table should also be partitioned, which bounds the
    * per-read listing to the partitions the query touches.
    */
  def readRange(spark: SparkSession, tableDir: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    val skippable = skippableFiles(spark, tableDir, column, lit(lo), lit(hi))
    val live = spark.read.parquet(tableDir)
    val files = live.inputFiles.toSeq.filterNot(f => skippable.contains(normalize(f)))
    val base =
      if (files.isEmpty) live.limit(0)
      else spark.read.schema(live.schema).parquet(files: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
