package graft

import graft.functions.{GraftHash, VectorExpressions}
import org.apache.spark.sql.functions._

/** The packed aggregation-ordering encoding (round-20 rework): a
  * lexicographic (major, minor) — or (double, id) — `max_by`/`min_by`
  * ordering packed into one decimal(38,0) so the aggregate stays a
  * HashAggregate (struct-typed aggregation buffers are not
  * UnsafeRow-mutable and demote the whole aggregate to SortAggregate).
  * Covers: the bit map's monotonicity against Spark SQL's double
  * ordering, the pack's exactness/monotonicity at the long extremes,
  * value-equivalence of a packed max_by/min_by pair against the struct
  * form it replaced, and the plan shape (HashAggregate, no sort) of
  * the rewritten consumers.
  */
class PackedOrderingSpec extends SparkSuite {
  import spark.implicits._

  test("doubleSortBits is monotone in Spark SQL's double order; zeros collapse; NaN greatest") {
    val samples = Seq(
      Double.NegativeInfinity, -1e308, -2.5, -1.0, -1e-300, -java.lang.Double.MIN_VALUE,
      -0.0, 0.0, java.lang.Double.MIN_VALUE, 1e-300, 0.5, 1.0, 2.5, 1e308,
      Double.PositiveInfinity, Double.NaN)
    for (a <- samples; b <- samples) {
      // Spark SQL double order: NaN greatest, -0.0 == 0.0 — exactly
      // java.lang.Double.compare with the two zeros identified
      val cmp =
        if (a == 0.0 && b == 0.0) 0
        else java.lang.Double.compare(a, b)
      val got = java.lang.Long.compare(
        GraftHash.doubleSortBits(a), GraftHash.doubleSortBits(b))
      assert(math.signum(cmp.toDouble) === math.signum(got.toDouble),
        s"order of ($a, $b): double cmp $cmp, bits cmp $got")
    }
  }

  test("pack_ord is exact and lexicographic at the long extremes") {
    val majors = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    val minors = Seq(0L, 1L, Long.MaxValue - 1, Long.MaxValue)
    val rows = (for (ma <- majors; mi <- minors) yield (ma, mi)).toDF("ma", "mi")
    val packed = rows
      .withColumn("p", VectorExpressions.pack_ord(col("ma"), col("mi")))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDecimal(2)))
    // no overflow-to-null anywhere in the domain, and pack order ==
    // (major, minor) lexicographic order
    packed.foreach { case (k, p) => assert(p != null, s"pack_ord($k) overflowed") }
    for (((k1, p1), i) <- packed.zipWithIndex; ((k2, p2), j) <- packed.zipWithIndex if i < j) {
      val lex = implicitly[Ordering[(Long, Long)]].compare(k1, k2)
      assert(math.signum(lex.toDouble) === math.signum(p1.compareTo(p2).toDouble),
        s"pack order diverges from lexicographic at $k1 vs $k2")
    }
  }

  test("packed max_by/min_by pair equals the struct-ordered form it replaced") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      // few groups, coarse scores → plenty of ties for the tiebreak
      (i % 5, math.floor(rnd.nextDouble() * 8) / 4.0, rnd.nextInt(1000).toLong)
    }.toDF("g", "score", "id")
    val ord = VectorExpressions.pack_ord(
      VectorExpressions.double_sort_bits(col("score")), col("id"))
    val packed = rows.groupBy("g")
      .agg(max_by(col("id"), ord).as("mx"), min_by(col("id"), ord).as("mn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val control = rows.groupBy("g")
      .agg(max_by(col("id"), struct(col("score"), col("id"))).as("mx"),
        min_by(col("id"), struct(col("score"), col("id"))).as("mn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(packed === control)
  }

  test("rewritten max_by consumers hash-aggregate: no SortAggregate in their plans") {
    for (q <- Seq("q_agg_minmax_by", "q_join_asof", "q_sim_label_knn",
        "q_dedup_canonicalize")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SortAggregate"),
        s"$q still sort-aggregates:\n${plan.take(3000)}")
      assert(plan.contains("HashAggregate"), s"$q lost its aggregate?")
    }
  }
}
