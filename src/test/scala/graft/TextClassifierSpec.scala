package graft

import graft.operators.TextClassifier
import org.apache.spark.sql.functions._

/** In-engine logistic-regression filter: learning on planted separable
  * data, output invariants, empty-corpus short-circuit.
  */
class TextClassifierSpec extends SparkSuite {
  import spark.implicits._

  test("planted separable signal: the model discovers the marker feature and classifies >= 0.9") {
    val rnd = new scala.util.Random(41)
    val fillers = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 200L).map { i =>
      val base = Seq.fill(12)(fillers(rnd.nextInt(fillers.size)))
      val text = if (i % 2 == 0) (base :+ "marker").mkString(" ")
                 else base.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val out = TextClassifier.trainAndScore(docs, "doc_id", "text",
        label = when(col("doc_id") % 2 === 0, 1.0).otherwise(0.0),
        nFeatures = 8, iters = 40, lr = 0.5)
      .collect()
    assert(out.length === 200)
    val acc = out.count(_.getAs[Boolean]("correct")).toDouble / out.length
    assert(acc >= 0.9, s"separable signal not learned: acc=$acc")
    // output invariants: predicted == (logit >= 0), correct consistent
    out.foreach { r =>
      assert(r.getAs[Boolean]("predicted") === (r.getAs[Double]("logit") >= 0.0))
      assert(r.getAs[Boolean]("correct") ===
        (r.getAs[Boolean]("predicted") === (r.getAs[Long]("label") == 1L)))
    }
  }

  test("training is deterministic: two runs produce identical weights end to end") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val lbl = when(col("n_chars") >= 300, 1.0).otherwise(0.0)
    def run() = TextClassifier.trainAndScore(docs, "doc_id", "text",
        lbl, nFeatures = 16, iters = 5, lr = 0.1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logit")))
    assert(run().toSeq === run().toSeq)
  }

  test("persisted model round-trip: scoreWith reproduces trainAndScore's logits; token-less docs score bias") {
    val docs = Tables(spark, sf, "documents").limit(120).localCheckpoint()
    val lbl = when(col("n_chars") >= 300, 1.0).otherwise(0.0)
    val path = Tables.scratch("clf_roundtrip_model")
    TextClassifier.trainAndSave(docs, "doc_id", "text", lbl,
      nFeatures = 16, iters = 5, lr = 0.1, path = path)
    val direct = TextClassifier.trainAndScore(docs, "doc_id", "text", lbl,
        nFeatures = 16, iters = 5, lr = 0.1)
      .select("doc_id", "logit").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scored = TextClassifier.scoreWith(spark, path, docs, "doc_id", "text")
      .collect()
    assert(scored.length === 120)
    scored.foreach { r =>
      val want = direct(r.getAs[Long]("doc_id"))
      // occurrence-wise vs cnt·w summation: same value modulo float
      // association — equal far inside the 6dp canonicalization
      assert(math.abs(r.getAs[Double]("logit") - want) < 1e-9,
        s"round-trip logit diverged: $r vs $want")
      assert(r.getAs[Boolean]("keep") === (r.getAs[Double]("logit") >= 0.0))
    }
    // a doc with no in-vocab tokens scores exactly the bias
    val alien = Seq((999L, "zzzq wwxy")).toDF("doc_id", "text")
    val bias = spark.read.parquet(path).filter(col("f") === -1)
      .head.getAs[Double]("w")
    val got = TextClassifier.scoreWith(spark, path, alien, "doc_id", "text")
      .head.getAs[Double]("logit")
    assert(got === bias, s"token-less doc scored $got, bias is $bias")
  }

  test("empty corpus short-circuits to an empty typed frame") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextClassifier.trainAndScore(empty, "doc_id", "text",
      label = lit(1.0), nFeatures = 8, iters = 3, lr = 0.1)
    assert(out.isEmpty)
    assert(out.columns.toSeq ===
      Seq("doc_id", "logit", "label", "predicted", "correct"))
  }
}
