package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming plumbing (SURVEY §2.B.8, lifecycle S3).
  *
  * Streams are the same parquet tables read through the file streaming
  * source (offset tracking = the reference's listStatus analog,
  * `CubefsFileSystem.java:280-336`); results land in a memory sink via
  * an AvailableNow-style drain so batch-equivalence is directly
  * checkable against the DuckDB oracle. Checkpoint durability maps to
  * the reference's hsync contract (`CubefsOutputStream.java:135-141`).
  */
object StreamOps {
  private val counter = new AtomicInteger(0)

  /** The events table as a stream (schema fixed from the batch read;
    * nanos ts pre-converted to µs TimestampType by the same rule as
    * `Tables`).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(Tables.path(dir, "events")).schema
    // the file source requires a directory: stream the sf dir with a
    // glob filter selecting only the events table file
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Drain a streaming DataFrame into a memory sink and return the
    * result table. `outputMode`: complete for aggregations (emits full
    * state), append for stateless/finalized-only operators.
    */
  def runToMemory(df: DataFrame, outputMode: String): DataFrame = {
    val name = s"graft_sink_${counter.incrementAndGet()}"
    val spark = df.sparkSession
    // a streaming query creates one state-store instance per shuffle
    // partition; at small scale 32 stores of per-batch commit machinery
    // dominate wall-clock. The override lets callers (Bench) size state
    // partitions to the data volume — exactly what you'd tune on a
    // cluster — without touching correctness (results are partition-
    // count-independent).
    val partsOverride = spark.conf.getOption("spark.graft.streaming.shufflePartitions")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    partsOverride.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      partsOverride.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", prev))
    }
    spark.table(name)
  }
}
