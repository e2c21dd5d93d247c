package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Property-based round-trip laws (SURVEY §5.2.4, mirroring the
  * reference's own write/read-back test style —
  * CubeFileSystemTest.java testReadWriter/testFileIO): arbitrary typed
  * rows survive a parquet write/read cycle bit-exactly, and algebraic
  * laws hold on generated data.
  */
case class Row1(id: Long, d: Double, s: String, ts: Timestamp, arr: Seq[Float], ok: Boolean)

class RoundTripSpec extends SparkSuite {
  import spark.implicits._

  private val genRow: Gen[Row1] = for {
    id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    d <- Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.oneOf(0.0, -0.0, Double.MaxValue))
    s <- Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("", "空白 テキスト", "a\tb\nc", "'); DROP--"))
    tsMs <- Gen.chooseNum(0L, 4102444800000L) // 1970..2100
    arr <- Gen.listOfN(4, Gen.chooseNum(-1e6f, 1e6f))
    ok <- Arbitrary.arbBool.arbitrary
  } yield Row1(id, d, s, new Timestamp(tsMs), arr, ok)

  private def sample(n: Int, seed: Long): Seq[Row1] = {
    // one evolving seed (fresh seeds per row would repeat scalacheck's
    // edge-case-biased first pick for every row)
    var s = Seed(seed)
    (0 until n).flatMap { _ =>
      val r = genRow.apply(Gen.Parameters.default, s)
      s = s.next
      r
    }
  }

  test("parquet write/read round-trips arbitrary typed rows exactly") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val rows = sample(200, seed * 1000)
      val dir = Files.createTempDirectory("graft_rt").toString
      rows.toDF().write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).as[Row1].collect()
      assert(back.map(_.toString).sorted.toSeq == rows.map(_.toString).sorted)
    }
  }

  test("filter split/fusion law: filter(p && q) == filter(p).filter(q)") {
    val rows = sample(300, 99).toDF()
    val a = rows.filter(col("d") > 0 && col("ok")).count()
    val b = rows.filter(col("d") > 0).filter(col("ok")).count()
    assert(a == b)
  }

  test("union count law: |A union all B| == |A| + |B|") {
    val a = sample(150, 7).toDF()
    val b = sample(170, 8).toDF()
    assert(a.unionAll(b).count() == a.count() + b.count())
  }

  test("dedup idempotence: distinct(distinct(A)) == distinct(A)") {
    val rows = sample(100, 5)
    val dup = (rows ++ rows ++ rows.take(10)).toDF()
    val once = dup.distinct()
    assert(once.count() == once.distinct().count())
    assert(once.count() == rows.map(_.toString).distinct.size)
  }

  test("join cardinality bound: |A join B on key| <= |A|*|B| and semi <= |A|") {
    val a = sample(80, 21).toDF().withColumn("k", col("id") % 10)
    val b = sample(60, 22).toDF().withColumn("k", col("id") % 10)
    val joined = a.join(b, "k").count()
    assert(joined <= a.count() * b.count())
    assert(a.join(b, Seq("k"), "left_semi").count() <= a.count())
  }

  test("frame split is lossless: concatenating every frame rebuilds the payload") {
    import graft.operators.Multimodal
    val docs = Seq(
      (1L, "x" * 600),          // 3 frames, partial tail
      (2L, "y" * 256),          // exactly one frame
      (3L, "short"),            // sub-frame payload
      (4L, "z" * 512)           // exact multiple
    ).toDF("doc_id", "text")
    val payloads = Multimodal.withPayload(docs, "doc_id", "text")
    val rebuilt = Multimodal.sampleFrames(payloads, every = 1)
      .groupBy("doc_id")
      .agg(expr(
        """aggregate(
          |  transform(sort_array(collect_list(struct(frame_idx, frame))), s -> s.frame),
          |  CAST('' AS BINARY), (acc, f) -> concat(acc, f))""".stripMargin).as("rebuilt"))
    val diffs = payloads.join(rebuilt, "doc_id")
      .filter(col("payload") =!= col("rebuilt"))
      .count()
    assert(diffs == 0, "frame split/concat must be byte-lossless")
  }
}
