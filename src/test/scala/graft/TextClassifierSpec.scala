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

  test("all-OOV corpus (empty vocabulary) still trains the bias and scores every doc") {
    // every token longer than any real word ⇒ nFeatures=0 forces the
    // empty-vocab path directly: only the f=-1 bias rows exist.
    // All-ones labels drive the bias positive; every doc must appear,
    // scored by the trained bias alone, predicted=true, correct=true.
    val docs = Seq((1L, "zq zq"), (2L, "ww")).toDF("doc_id", "text")
    val out = TextClassifier.trainAndScore(docs, "doc_id", "text",
        label = lit(1.0), nFeatures = 0, iters = 10, lr = 0.5)
      .orderBy("doc_id").collect()
    assert(out.length === 2, "bias-only training dropped documents")
    val logits = out.map(_.getAs[Double]("logit")).distinct
    assert(logits.length === 1 && logits.head > 0.0,
      s"bias-only logits should be one positive value: ${out.toSeq}")
    assert(out.forall(_.getAs[Boolean]("correct")))
  }

  test("streaming classifier gate: union of batch scores equals one-shot scoreWith; gate conserves") {
    // fixed persisted model ⇒ per-batch scoring is independent, so the
    // streamed gate must reproduce the one-shot scoring pass exactly
    val streamed = SparkEntry.queries("q_stream_classifier_gate")(spark, sf)
      .collect()
    val docs = Tables(spark, sf, "documents")
    val lbl = when(size(filter(split(lower(col("text")), "\\W+"),
      w => w === "vector")) >= 2, 1.0).otherwise(0.0)
    val model = Tables.scratch("gate_spec_model")
    TextClassifier.trainAndSave(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", lbl, nFeatures = 64, iters = 15, lr = 0.05, path = model)
    val oneShot = TextClassifier.scoreWith(spark, model, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), math.round(r.getAs[Double]("logit") * 1e9),
        r.getAs[Boolean]("keep"))
    assert(streamed.map(key).toSeq === oneShot.map(key).toSeq,
      "streamed gate diverged from the one-shot scoring pass")
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(r.getAs[Boolean]("multi_batch"), "gate did not see >= 3 batches")
      assert(r.getAs[Boolean]("conservation_ok"), "kept + quarantined != streamed")
    }
  }

  test("gate redelivery: a redelivered batch replaces its own ingest partition — log exact, never duplicated") {
    // the at-least-once contract the per-write dynamic overwrite buys
    val docs = Tables(spark, sf, "documents").limit(60).localCheckpoint()
    val lbl = when(col("n_chars") >= 300, 1.0).otherwise(0.0)
    val model = Tables.scratch("gate_redeliver_model")
    TextClassifier.trainAndSave(docs, "doc_id", "text", lbl,
      nFeatures = 16, iters = 5, lr = 0.1, path = model)
    val log = Tables.scratch("gate_redeliver_log")
    def deliver(bid: Long): Unit =
      TextClassifier.scoreWith(spark, model, docs, "doc_id", "text")
        .filter(col("keep")).select("doc_id", "logit")
        .withColumn("ingest", lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest").parquet(log)
    deliver(0L)
    val once = spark.read.parquet(log).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    deliver(0L) // crash-then-redeliver: same batch id lands again
    val twice = spark.read.parquet(log).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(once === twice, "redelivered batch duplicated the log")
    assert(once.nonEmpty)
  }

  test("seeded mini-batch GD: deterministic, and fixture-rule accuracy within 0.05 of full-batch") {
    val docs = Tables(spark, sf, "documents")
    val lbl = when(size(filter(split(lower(col("text")), "\\W+"),
      w => w === "vector")) >= 2, 1.0).otherwise(0.0)
    def acc(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(_.getAs[Boolean]("correct")).toDouble / rows.length
    def runMini() = TextClassifier.trainAndScore(docs, "doc_id", "text",
        lbl, nFeatures = 64, iters = 15, lr = 0.05, batchOf16 = 4)
      .orderBy("doc_id").collect()
    val mini = runMini()
    val full = TextClassifier.trainAndScore(docs, "doc_id", "text",
        lbl, nFeatures = 64, iters = 15, lr = 0.05)
      .orderBy("doc_id").collect()
    assert(mini.length === full.length)
    // the md5-bucket sample is seeded ⇒ bit-identical re-runs
    assert(mini.map(_.getAs[Double]("logit")).toSeq ===
      runMini().map(_.getAs[Double]("logit")).toSeq,
      "mini-batch training is not deterministic")
    val (aMini, aFull) = (acc(mini), acc(full))
    assert(aMini >= aFull - 0.05,
      s"mini-batch accuracy $aMini fell >0.05 below full-batch $aFull")
  }
}
