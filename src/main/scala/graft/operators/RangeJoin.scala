package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable interval/range join (SURVEY §2.B.3, §4.3).
  *
  * Spark plans a bare `b.ts BETWEEN a.ts AND a.ts + w` condition as a
  * broadcast-nested-loop join — O(|A|·|B|), hopeless at 100 TB. We
  * rewrite it as an equi-join on time buckets of width == the window:
  * each left row lands in bucket ⌊ts/w⌋ and is duplicated into bucket
  * ⌊ts/w⌋+1 (any right row within (ts, ts+w] lives in one of the two);
  * the bucket equi-join shuffles both sides on the bucket key (hash
  * partitioned, SMJ/SHJ — no cross product) and the exact predicate
  * filters residuals. Cost: 2|A|+|B| shuffled rows, ~2·density matches
  * scanned per row — independent of total table size, so it survives a
  * 1000-executor scale-up as long as time is well-distributed.
  */
object RangeJoin {

  /** Join `left` to `right` on `lo < right.tsCol - left.tsCol <= hi`
    * windows expressed as: right.ts in (left.ts + loSec, left.ts + hiSec].
    * Extra equi-conditions (e.g. same key) can be appended by the caller
    * on the returned frame's columns.
    *
    * @param loSec exclusive lower offset seconds (0 = strictly after)
    * @param hiSec inclusive upper offset seconds; bucket width
    */
  def timeWindow(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      loSec: Long, hiSec: Long): DataFrame = {
    require(hiSec > loSec, s"empty window ($loSec, $hiSec]")
    val w = hiSec - loSec
    // left row covers right timestamps in (lts+lo, lts+hi]: that span of
    // length w intersects at most 2 buckets of width w.
    val lBucket = floor((unix_timestamp(col(leftTs)) + loSec) / w).cast("long")
    val rBucket = floor(unix_timestamp(col(rightTs)) / w).cast("long")
    val l = left.withColumn("__buckets", array(lBucket, lBucket + 1))
      .withColumn("__bucket", explode(col("__buckets"))).drop("__buckets")
    val r = right.withColumn("__bucket", rBucket)
    val joined = l.join(r, Seq("__bucket"), "inner").drop("__bucket")
    val lts = unix_timestamp(col(leftTs))
    val rts = unix_timestamp(col(rightTs))
    joined.filter(rts > lts + loSec && rts <= lts + hiSec)
  }

  /** Sub-second-precision variant comparing raw timestamps. */
  def timeWindowExact(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      windowSec: Long): DataFrame = {
    val w = windowSec
    val lMicros = unix_micros(col(leftTs))
    val rMicros = unix_micros(col(rightTs))
    val lBucket = floor(lMicros / (w * 1000000L)).cast("long")
    val rBucket = floor(rMicros / (w * 1000000L)).cast("long")
    val l = left.withColumn("__bucket", explode(array(lBucket, lBucket + 1)))
    val r = right.withColumn("__bucket", rBucket)
    l.join(r, Seq("__bucket"), "inner").drop("__bucket")
      .filter(rMicros > lMicros && rMicros <= lMicros + w * 1000000L)
  }
}
