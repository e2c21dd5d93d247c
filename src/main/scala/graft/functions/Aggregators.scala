package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (SURVEY §2.B.4 / §4.3): weighted average and vector
  * centroid as `Aggregator[IN, BUF, OUT]`, exposed through
  * `functions.udaf` so they run as real partial/final hash aggregates
  * (map-side combine — no driver-side collection).
  */
object Aggregators {

  /** Weighted mean: sum(v*w)/sum(w); null-safe on empty groups. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Element-wise mean of float vectors → centroid as array<double>.
    * Buffer is (sums, count); merge is element-wise — associative and
    * commutative, so Spark's partial aggregation is safe.
    */
  object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      if (v == null) b
      else {
        val acc = if (b._1.length == 0) new Array[Double](v.length) else b._1
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        (acc, b._2 + 1)
      }
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      if (a._1.length == 0) b
      else if (b._1.length == 0) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    }
    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExprEnc.doubleArray, Encoders.scalaLong)
    override def outputEncoder: Encoder[Seq[Double]] = ExprEnc.doubleSeq
  }

  /** Bounded top-k by score (SURVEY §4.3): keeps only k (score, id)
    * pairs per group through partial aggregation — an O(n·log k)
    * alternative to a full window sort for top-k-per-group at scale.
    * Deterministic: ties broken by ascending id.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Long, Double), List[(Double, Long)], Seq[TopKHit]] {
    private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
      // sorted desc by (score, then id asc via negated comparison)
      val merged = (e :: buf).sortBy { case (s, id) => (-s, id) }
      merged.take(k)
    }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] =
      insert(b, (in._2, in._1))
    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      (a ++ b).sortBy { case (s, id) => (-s, id) }.take(k)
    override def finish(b: List[(Double, Long)]): Seq[TopKHit] =
      b.map { case (s, id) => TopKHit(id, s) }
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      Encoders.kryo[List[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[TopKHit]] = ExprEnc.topkSeq
  }

  case class TopKHit(id: Long, score: Double)

  /** Bloom filter over pre-hashed (xxhash64) elements as a mergeable
    * aggregate: buffer = the bit array itself, merge = word-wise OR —
    * associative and commutative, so it runs as a real partial/final
    * hash aggregate (each map task builds a partial bloom; the shuffle
    * carries one `words`-long array per group, never the elements).
    * Emits array<long> so the result round-trips through parquet as an
    * ordinary column (the skip index stores one per file per column).
    */
  class BloomAgg(words: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      GraftHash.bloomSet(b, h, k); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExprEnc.longArray
    override def outputEncoder: Encoder[Array[Long]] = ExprEnc.longArray
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    val doubleSeq: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    val topkSeq: Encoder[Seq[TopKHit]] = ExpressionEncoder[Seq[TopKHit]]()
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
