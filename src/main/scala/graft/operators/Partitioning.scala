package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for shuffle avoidance at scale
  * (SURVEY §4.2 "Partitioning & shuffle"): bucketing for co-located
  * joins and salting for skewed keys.
  */
object Partitioning {

  /** Write both sides as bucketed+sorted tables on the join key and
    * join them: with matching bucket counts Spark plans a sort-merge
    * join with NO Exchange on either side — the 100 TB repeated-join
    * pattern (pay the shuffle once at write time, never at read time).
    */
  def bucketedJoin(
      spark: SparkSession,
      left: DataFrame, right: DataFrame,
      key: String, buckets: Int,
      leftTable: String, rightTable: String): DataFrame = {
    def save(df: DataFrame, name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // the in-memory catalog forgets tables across sessions but the
      // managed location survives — clear it or saveAsTable refuses
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + name)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    }
    save(left, leftTable)
    save(right, rightTable)
    spark.table(leftTable).join(spark.table(rightTable), key)
  }

  /** Cluster-sorted write: range-partition on the cluster keys and
    * sort within partitions before writing, so every output file covers
    * a narrow, non-overlapping key range. Parquet min/max statistics
    * then prune whole files/row groups for selective filters — at
    * 100 TB, layout is the dominant scan-cost lever (a filter on an
    * unclustered table reads every file; on a clustered one it reads
    * the few files whose range intersects the predicate).
    */
  def clusteredWrite(df: DataFrame, path: String, numFiles: Int, keys: String*): Unit =
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Salted join for skewed keys: the skewed (large) side gets a random
    * salt in [0, saltFactor); the small side is replicated saltFactor
    * times; the join key becomes (key, salt), spreading a hot key over
    * saltFactor reducers. (AQE skew-join handles this adaptively; the
    * explicit form is for engines/pipelines where the skew is known
    * up front, and keeps working when AQE is off.)
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      key: String, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
