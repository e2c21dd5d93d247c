package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED corpus filtering — the fastText-class learned filter
  * step (Joulin et al. '16; the CCNet/RefinedWeb/FineWeb recipe runs
  * exactly this shape to keep wanted-language / wanted-quality
  * documents): a logistic classifier over bag-of-token features,
  * trained IN-ENGINE by full-batch gradient descent and applied to
  * every document. Heuristic scores (q_text_quality) rank by fixed
  * rules; this learns the rule from curator labels.
  *
  * Scale shape: the vocabulary is frequency-ranked top-F (TakeOrdered,
  * F parameter-sized — the q_text_vocab_encode cut); the per-doc
  * feature table (doc, feature, count) materializes ONCE
  * (localCheckpoint) and every GD step is ONE Spark job over it — the
  * per-doc score is a keyed aggregate with the weight vector as a
  * broadcast map literal, the residual joins back by doc id, and the
  * gradient collapses to F+1 driver rows (parameter-sized collect, the
  * 25-site rule). K steps = K jobs; the model never leaves the driver
  * as anything bigger than an F-entry map. Scoring the corpus is the
  * same keyed aggregate with the final weights — one more distributed
  * pass, no UDF anywhere.
  *
  * Determinism: vocabulary ties break (count desc, token asc); the
  * bias is feature -1 with cnt=1 on EVERY doc (token-less documents
  * still train and score); gradients are plain double sums and the
  * sigmoid is `1/(1+exp(-s))` — the same libm exp both engines link
  * (the q_text_bigram_lm ln precedent), so a DuckDB oracle replays
  * the entire training run step for step.
  *
  * Returns one row per document: (idCol, logit, label 0/1,
  * predicted = logit ≥ 0, correct).
  */
object TextClassifier {

  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
      label: Column, nFeatures: Int, iters: Int, lr: Double,
      momentum: Double = 0.9, batchOf16: Int = 16): DataFrame =
    fit(docs, idCol, textCol, label, nFeatures, iters, lr, momentum,
        batchOf16) match {
      case None =>
        docs.select(col(idCol), lit(0.0).as("logit"),
          label.cast("long").as("label"), lit(true).as("predicted"),
          (label.cast("long") === 1L).as("correct")).limit(0)
      case Some((feats, w, _)) =>
        val wFinal = typedlit(w.toMap)
        feats
          .withColumn("wx", col("cnt") * element_at(wFinal, col("f")))
          .groupBy(col("did").as(idCol), col("y")).agg(sum("wx").as("logit"))
          .select(col(idCol), col("logit"), col("y").cast("long").as("label"),
            (col("logit") >= 0.0).as("predicted"),
            ((col("logit") >= 0.0) === (col("y") === 1.0)).as("correct"))
    }

  /** Train and PERSIST the model as a reusable artifact — the index
    * family's build-once / serve-many discipline applied to the
    * learned filter: a production pipeline trains on the labeled
    * slice once and scores every future ingest batch against the
    * saved weights, no labels and no training jobs at score time. The
    * artifact is one F+1-row parquet (token, f, w; the bias travels
    * as f = -1 with a null token) — readable by any engine.
    */
  def trainAndSave(docs: DataFrame, idCol: String, textCol: String,
      label: Column, nFeatures: Int, iters: Int, lr: Double, path: String,
      momentum: Double = 0.9, batchOf16: Int = 16): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (wRows, vocabRows) =
      fit(docs, idCol, textCol, label, nFeatures, iters, lr, momentum,
          batchOf16) match {
        case None => (Map(-1 -> 0.0), Array.empty[(String, Int)])
        case Some((_, w, vocab)) => (w.toMap, vocab)
      }
    val byF = vocabRows.map { case (tok, f) => (f, tok) }.toMap
    wRows.toSeq.sortBy(_._1)
      .map { case (f, wv) => (byF.get(f), f, wv) }
      .toDF("token", "f", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Score an unlabeled corpus against a [[trainAndSave]] artifact:
    * ONE distributed pass — doc-token explode, broadcast token→weight
    * join (the model is parameter-sized by construction), per-doc sum,
    * bias added to every doc (token-less documents score bias alone).
    * Returns (idCol, logit, keep = logit ≥ 0).
    */
  def scoreWith(spark: org.apache.spark.sql.SparkSession, modelPath: String,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val model = spark.read.parquet(modelPath)
    val bias = model.filter(col("f") === -1).select("w").head.getDouble(0)
    val tokenWeights = model.filter(col("f") =!= -1).select("token", "w")
    val sums = docs
      .select(col(idCol), explode(filter(split(lower(col(textCol)), "\\W+"),
        t => length(t) > 0)).as("token"))
      .join(broadcast(tokenWeights), Seq("token"))
      .groupBy(col(idCol)).agg(sum("w").as("wsum"))
    docs.select(col(idCol))
      .join(sums, Seq(idCol), "left_outer")
      .select(col(idCol),
        (lit(bias) + coalesce(col("wsum"), lit(0.0))).as("logit"))
      .withColumn("keep", col("logit") >= 0.0)
  }

  /** The training loop: returns (feature table, trained weights keyed
    * by feature id with -1 = bias, ranked vocabulary), or None on an
    * empty corpus.
    *
    * `batchOf16` < 16 enables SEEDED MINI-BATCH GD — the 100 TB knob:
    * full-batch GD is `iters` corpus passes, the one corpus-bound cost
    * in the family. Each step k instead trains on the deterministic
    * md5-bucket slice {doc : first hex digit of md5("<id>:<k>") among
    * the first `batchOf16` of 16} — the q_sample_seeded machinery, so
    * the per-step sample is (a) O(batchOf16/16) of the corpus, (b)
    * DIFFERENT every step (the salt is the step index: over 16/b steps
    * the expected coverage is the whole corpus), and (c) exactly
    * replayable by any engine that has md5 — the DuckDB oracle applies
    * the same bucket rule per step, so mini-batch training stays
    * hash-gate exact, not just statistically close. The gradient
    * normalizes by the ACTUAL sample size (read from the bias group's
    * row count in the same one-job collect — no extra count job);
    * an empty sample degrades to a pure momentum step.
    */
  private def fit(docs: DataFrame, idCol: String, textCol: String,
      label: Column, nFeatures: Int, iters: Int, lr: Double,
      momentum: Double, batchOf16: Int = 16)
      : Option[(DataFrame, scala.collection.mutable.Map[Int, Double], Array[(String, Int)])] = {
    val toks = docs.select(col(idCol).as("did"), label.cast("double").as("y"),
      explode(filter(split(lower(col(textCol)), "\\W+"),
        t => length(t) > 0)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(nFeatures)
      .collect().zipWithIndex.map { case (r, i) => (r.getString(0), i) }
    val nDocs = docs.count().toDouble
    // only an EMPTY CORPUS short-circuits: a non-empty corpus whose
    // tokens are all filtered out still trains the bias feature (the
    // f=-1 row exists on every doc), matching the oracle's replay —
    // an all-OOV corpus scores every doc by the trained bias alone
    if (nDocs == 0) return None
    val fmap = typedlit(vocab.toMap)
    // (doc, feature, count) + the bias row f=-1 on every doc — built
    // once, reused by every step and the final scoring pass
    val feats = toks
      .withColumn("f", element_at(fmap, col("tok")))
      .filter(col("f").isNotNull)
      .groupBy(col("did"), col("y"), col("f"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .unionByName(docs.select(col(idCol).as("did"),
        label.cast("double").as("y"), lit(-1).as("f"), lit(1.0).as("cnt")))
      // NOT pre-partitioned by did: localCheckpoint preserves
      // outputPartitioning, and a did-partitioned checkpoint does make
      // every step's per-doc aggregate and residual join exchange-free —
      // but removing the exchange also removes the shuffle stats AQE
      // needs to convert the per-step residual join to a runtime
      // broadcast, pinning it as a SortMergeJoin that re-sorts the
      // feature table every step. Measured (sf0.1, isolated):
      // filter 8.46→9.38, minibatch 9.84→11.21, score 6.62→8.14 —
      // reverted. On a corpus where the residual cannot broadcast the
      // balance flips; that layout choice belongs to the deployment.
      .localCheckpoint()
    val w = scala.collection.mutable.Map[Int, Double](
      ((-1 +: vocab.indices.toArray).map(_ -> 0.0)): _*)
    // heavy-ball momentum: v ← μ·v + g/N, w ← w − lr·v — ~2.7× fewer
    // steps than plain GD at equal accuracy (measured during tuning),
    // and each step is still one job; both state vectors stay
    // parameter-sized on the driver
    val v = scala.collection.mutable.Map[Int, Double](
      ((-1 +: vocab.indices.toArray).map(_ -> 0.0)): _*)
    val hexDigits = "0123456789abcdef".take(math.max(0, batchOf16))
      .map(_.toString)
    for (k <- 1 to iters) {
      // the step's training slice: full corpus, or the step-salted
      // deterministic md5 bucket (each doc's bias row travels with it,
      // so the f=-1 group below counts the sample exactly)
      val stepFeats =
        if (batchOf16 >= 16) feats
        else feats.filter(
          substring(md5(concat(col("did").cast("string"), lit(s":$k"))
            .cast("binary")), 1, 1).isin(hexDigits: _*))
      val wmap = typedlit(w.toMap)
      val resid = stepFeats
        .withColumn("wx", col("cnt") * element_at(wmap, col("f")))
        .groupBy("did", "y").agg(sum("wx").as("s"))
        .select(col("did"),
          (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("r"))
      // ONE job per step: the F+1-row gradient collect (each row also
      // carries its group's row count — the f=-1 group's count IS the
      // step's sample size, since the bias row appears once per doc).
      // The residual side is broadcast EXPLICITLY: AQE converts this
      // join to a runtime broadcast anyway (the residual is one narrow
      // (did, r) row per doc), but only after planning a full exchange
      // of the feature table and inferring from its shuffle stats —
      // per step. The hint pins the conversion at plan time, so no
      // step stages a feature-table exchange for the join. Scale
      // caveat: on a corpus whose per-doc residual cannot broadcast
      // the hint must come out — that layout choice belongs to the
      // deployment, as with the did-partitioned checkpoint (above).
      val gradRows = stepFeats.join(broadcast(resid), "did")
        .groupBy("f").agg(sum(col("r") * col("cnt")).as("g"),
          count(lit(1)).as("m"))
        .collect()
      val grads = gradRows.map(r2 => r2.getInt(0) -> r2.getDouble(1)).toMap
      val nk =
        if (batchOf16 >= 16) nDocs
        else math.max(1.0, gradRows.find(_.getInt(0) == -1)
          .map(_.getLong(2).toDouble).getOrElse(0.0))
      w.keys.foreach { f =>
        v(f) = momentum * v(f) + grads.getOrElse(f, 0.0) / nk
        w(f) -= lr * v(f)
      }
    }
    Some((feats, w, vocab))
  }
}
