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
    *
    * The buffer is a BINARY MIN-HEAP over two fixed arrays whose root
    * is the current WORST member (lowest score; largest id among score
    * ties): a full buffer rejects a non-qualifying row with ONE root
    * comparison (the overwhelmingly common case once the heap warms
    * up) and admits a qualifying one in O(log k) — the per-row list
    * re-sort this replaces cost O(k log k) on the hottest inner loop
    * of the ANN scale path (`quantizedRerankTopK` stage 1 runs it once
    * per corpus row). The arrays ride the ExpressionEncoder, not a
    * Kryo blob, so spills serialize columnar.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Long, Double), TopKBuf, Seq[TopKHit]] {
    require(k >= 1, "TopKByScore needs k >= 1")
    // (s1, i1) ranks strictly below (s2, i2) in the final desc-score /
    // asc-id order — the heap invariant: every parent ranks <= its
    // children, so the root is the eviction candidate. TOTAL order via
    // Double.compare: `<` is false both ways for NaN, so a NaN that
    // reached the root would block every further admission for its
    // group; Double.compare ranks NaN above every real score — the
    // same "NaN is greatest" order Spark's window sort uses, so a NaN
    // score (e.g. cosine of a zero-norm vector) degrades one rank slot,
    // never the whole group.
    private def below(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }
    private def swap(b: TopKBuf, i: Int, j: Int): Unit = {
      val s = b.scores(i); b.scores(i) = b.scores(j); b.scores(j) = s
      val d = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = d
    }
    private def siftUp(b: TopKBuf, start: Int): Unit = {
      var i = start
      while (i > 0 && below(b.scores(i), b.ids(i),
          b.scores((i - 1) / 2), b.ids((i - 1) / 2))) {
        swap(b, i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    private def siftDown(b: TopKBuf): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < b.n && below(b.scores(l), b.ids(l), b.scores(m), b.ids(m))) m = l
        if (r < b.n && below(b.scores(r), b.ids(r), b.scores(m), b.ids(m))) m = r
        if (m == i) done = true
        else { swap(b, i, m); i = m }
      }
    }
    private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
      if (b.n < k) {
        b.scores(b.n) = s; b.ids(b.n) = id; b.n += 1
        siftUp(b, b.n - 1)
      } else if (below(b.scores(0), b.ids(0), s, id)) {
        b.scores(0) = s; b.ids(0) = id
        siftDown(b)
      }
      b
    }
    override def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)
    override def reduce(b: TopKBuf, in: (Long, Double)): TopKBuf =
      insert(b, in._2, in._1)
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      if (a.n == 0) b
      else {
        var i = 0
        while (i < b.n) { insert(a, b.scores(i), b.ids(i)); i += 1 }
        a
      }
    }
    override def finish(b: TopKBuf): Seq[TopKHit] =
      (0 until b.n).map(i => (b.scores(i), b.ids(i)))
        // the same total order the heap maintains (best first): a
        // `sortBy(-s)` twin would send NaN last while the heap ranked
        // it first — the two must never disagree
        .sortWith { case ((s1, i1), (s2, i2)) => below(s2, i2, s1, i1) }
        .map { case (s, id) => TopKHit(id, s) }
    override def bufferEncoder: Encoder[TopKBuf] = ExprEnc.topkBuf
    override def outputEncoder: Encoder[Seq[TopKHit]] = ExprEnc.topkSeq
  }

  /** TopKByScore's heap buffer: parallel (score, id) arrays of
    * capacity k with `n` live slots in heap order.
    */
  case class TopKBuf(scores: Array[Double], ids: Array[Long], var n: Int)

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

  /** EXACT integer Gram/moment accumulator — the one distributed pass
    * behind the PCA family ([[graft.operators.Embeddings]]): input is
    * the embedding pre-quantized to longs (x_q = rint(x·scale)), and
    * the buffer accumulates [count, Σx_q (d), Σ x_q·x_qᵀ upper
    * triangle (d(d+1)/2)] — ALL long sums, so the result is
    * bit-identical regardless of partitioning/merge order and any
    * engine replays it exactly (the q_sample_weighted integer-
    * arithmetic discipline applied to second moments). Partial
    * aggregation ships ONE ~d²/2-long buffer per task, never rows.
    * Overflow headroom: |x_q| ≤ scale ⇒ each Σx²  entry ≤ n·scale²
    * (2⁶³ admits n·10⁶ up to ~9·10¹² rows at scale 1000).
    * Dimension is inferred from the first row; the empty buffer is a
    * zero-length sentinel so an empty group finishes empty.
    */
  class GramAgg extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(b0: Array[Long], x: Seq[Long]): Array[Long] = {
      val d = x.size
      val b = if (b0.isEmpty) new Array[Long](1 + d + d * (d + 1) / 2) else b0
      b(0) += 1L
      val xa = x.toArray
      var i = 0
      while (i < d) { b(1 + i) += xa(i); i += 1 }
      var p = 1 + d
      i = 0
      while (i < d) {
        val xi = xa(i)
        var j = i
        while (j < d) { b(p) += xi * xa(j); p += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
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
    val topkBuf: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
