package graft

import graft.operators.DataSkipping
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  // the operator's own observable: numFiles of the executed scan
  private def scannedFiles(df: DataFrame): Long = DataSkipping.scannedFiles(df)

  private def freshTable(name: String): String = {
    val out = Tables.scratch(name)
    (1 to 1000).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    out
  }

  test("planner-integrated scan prunes files from the query's own filters") {
    val out = freshTable("skipscan_tbl")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val total = spark.read.parquet(out).inputFiles.length
    assert(total === 8)

    // range filter: only the overlapping files are scanned
    val range = DataSkipping.scan(spark, out).filter(col("k") >= 100 && col("k") <= 200)
    assert(scannedFiles(range) < total)
    assert(range.count() === 101)

    // equality filter prunes to one file
    val eq = DataSkipping.scan(spark, out).filter(col("k") === 500)
    assert(scannedFiles(eq) === 1)
    assert(eq.count() === 1)

    // IN-list prunes to exactly the files holding a listed value
    val in = DataSkipping.scan(spark, out).filter(col("k").isin(5L, 900L))
    assert(scannedFiles(in) === 2)
    assert(in.count() === 2)

    // a non-indexed predicate is conservatively unpruned but exact
    val other = DataSkipping.scan(spark, out).filter(col("v") === "v42")
    assert(scannedFiles(other) === total)
    assert(other.count() === 1)

    // results are identical to the plain read, file layout or not
    val expected = spark.read.parquet(out)
      .filter(col("k") >= 100 && col("k") <= 200).orderBy("k").collect()
    assert(range.orderBy("k").collect() === expected)
  }

  test("a two-column index prunes on every indexed column's conjunct") {
    val out = Tables.scratch("skipscan_2col")
    // k ascending, m descending — a conjunct on each column rules out
    // opposite ends of the file sequence, so the intersection is
    // strictly smaller than either predicate alone achieves
    (1 to 1000).map(i => (i.toLong, (1000 - i).toLong, s"v$i"))
      .toDF("k", "m", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    DataSkipping.buildIndex(spark, out, Seq("k", "m"))
    val kOnly = scannedFiles(
      DataSkipping.scan(spark, out).filter(col("k") >= 200))
    val mOnly = scannedFiles(
      DataSkipping.scan(spark, out).filter(col("m") >= 200))
    val both = DataSkipping.scan(spark, out)
      .filter(col("k") >= 200 && col("m") >= 200)
    val bothFiles = scannedFiles(both)
    assert(bothFiles < kOnly && bothFiles < mOnly)
    assert(both.count() === spark.read.parquet(out)
      .filter(col("k") >= 200 && col("m") >= 200).count())
  }

  test("the index is authoritative for skipping only, never membership") {
    val out = freshTable("skipscan_member")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    // a file appended AFTER buildIndex — unindexed, must always scan
    Seq((5000L, "late")).toDF("k", "v")
      .write.mode("append").parquet(out)
    val df = DataSkipping.scan(spark, out).filter(col("k") >= 4000)
    assert(df.count() === 1) // the late row is found
    // readRange honors the same contract (the two-phase API)
    assert(DataSkipping.readRange(spark, out, "k", 4000L, 6000L).count() === 1)
    // and stale bounds still prune what they can prove absent
    assert(scannedFiles(DataSkipping.scan(spark, out)
      .filter(col("k") >= 100 && col("k") <= 200)) < 9)
  }

  test("statsOnly answers from metadata, reconciled against the live listing both ways") {
    val out = freshTable("skipscan_stats")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val indexed = spark.read.parquet(out).inputFiles.toSet

    // fully indexed: exact count/min/max with ZERO data files in the plan
    val s0 = DataSkipping.statsOnly(spark, out, Seq("k"))
    assert(s0.inputFiles.forall(_.contains("_skip_index")))
    assert(s0.collect().head.toSeq === Seq(1000L, 1L, 1000L))

    // append after indexing: the fresh file is scanned and folded in,
    // but no pre-index data file is read
    Seq((5000L, "late")).toDF("k", "v").write.mode("append").parquet(out)
    val s1 = DataSkipping.statsOnly(spark, out, Seq("k"))
    val dataRead = s1.inputFiles.filterNot(_.contains("_skip_index"))
    assert(dataRead.length === 1 && !indexed.contains(dataRead.head))
    assert(s1.collect().head.toSeq === Seq(1001L, 1L, 5000L))

    // delete an indexed file: its index row must stop counting
    val victim = new org.apache.hadoop.fs.Path(indexed.head)
    victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(victim, false)
    val after = DataSkipping.statsOnly(spark, out, Seq("k")).collect().head
    assert(after.getLong(0) ===
      spark.read.parquet(out).count())
  }

  test("every-file-skipped range returns empty, correctly typed") {
    val out = freshTable("skipscan_empty")
    DataSkipping.buildIndex(spark, out, Seq("k"))
    val none = DataSkipping.scan(spark, out).filter(col("k") > 99999)
    assert(scannedFiles(none) === 0)
    assert(none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(DataSkipping.readRange(spark, out, "k", 99999L, 999999L).count() === 0)
  }
}
