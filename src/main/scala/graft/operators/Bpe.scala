package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer-merge TRAINING (Sennrich et al. '16,
  * arXiv:1508.07909 — the subword-vocabulary construction every
  * training pipeline runs before a single model step; GPT-2/LLaMA-class
  * tokenizers are this algorithm over bytes). Each round counts all
  * adjacent symbol pairs across the corpus weighted by word frequency,
  * promotes the most frequent pair to a new symbol, and rewrites the
  * symbol sequences; `nMerges` rounds yield the ranked merge table the
  * tokenizer ships with.
  *
  * Scale shape — the reason this is a VOCAB algorithm, not a corpus
  * one: the corpus collapses to its word-frequency table in ONE
  * groupBy (Zipf: |vocab| grows ~√corpus, and the counts carry the
  * weight), and every round after that touches only vocab-sized data —
  * a zip-explode pair count (groupBy-sum, map-side combinable), a
  * driver argmax of ONE row (TakeOrdered limit 1, never a global
  * sort), and a per-word merge rewrite that is a codegen'd array fold
  * (no shuffle at all). Lineage is truncated per round
  * (localCheckpoint) so round N's plan never replays rounds 1..N-1 —
  * the iterative-operator discipline duplicateClusters set.
  *
  * Merge application is the standard greedy LEFT-TO-RIGHT
  * NON-OVERLAPPING rewrite (a run "aaa" under merge (a,a) becomes
  * [aa, a], never [a, aa]) — implemented as an index fold with a
  * skip-next flag, the same traversal order the reference subword-nmt
  * code's regex substitution performs. Pair STATISTICS, per the
  * original algorithm, count every adjacent occurrence (overlaps
  * included: "aaa" contributes (a,a) twice). Ties at the argmax break
  * by (count desc, left asc, right asc) — deterministic, so the whole
  * training run is exactly reproducible and the DuckDB oracle replays
  * it merge for merge.
  *
  * Returns one row per executed merge: (merge_rank 1-based, lhs,
  * rhs, n = weighted pair count at selection time, tokens_after =
  * total corpus symbol count after applying it — strictly decreasing,
  * the compression curve a tokenizer team actually reads). Words are
  * whitespace/punct tokens lowercased (the corpus-text-verb rule);
  * merges are interior-only (per-word sequences, GPT-2-style: no
  * end-of-word marker). An empty corpus or an exhausted pair table
  * (all words single-symbol) short-circuits to the rows earned so far.
  */
object Bpe {

  /** Greedy LTR non-overlapping single-merge rewrite of one symbol
    * array — the native O(len) kernel
    * ([[graft.functions.VectorExpressions.BpeMerge]]). The former HOF
    * fold was semantically identical but concat-copied its accumulator
    * at every position (O(len²) per word per round — bounded by word
    * length under the \\W+ splitter, latent for no-delimiter corpora
    * where one "word" is the whole document).
    */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    graft.functions.VectorExpressions.bpe_merge(syms, a, b)

  /** Corpus → word-frequency table with initial character-level symbol
    * sequences: (word, cnt, syms). The one corpus-sized pass.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(split(lower(col(textCol)), "\\W+"),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))

  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    train(docs, textCol, nMerges)._1

  /** The training loop; returns (ranked merge table, final symbol
    * table) so [[encodeStats]] can reuse the trained state without a
    * second run.
    */
  private def train(docs: DataFrame, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var wf = wordFreq(docs, textCol).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // tokens_after(merge k) = total symbol count of the table round k+1
    // scans — so it rides round k+1's pair-count pass as an observe()
    // metric (zero extra jobs); only the LAST merge pays one explicit
    // count job after the loop.
    val tokensAfter = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val obs = new org.apache.spark.sql.Observation(s"bpe_round_$rank")
      // overlap-inclusive adjacent-pair statistics, frequency-weighted
      val pairs = wf
        .observe(obs, coalesce(sum(col("cnt") * size(col("syms"))), lit(0L))
          .as("tokens"))
        .select(col("cnt"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .select(col("cnt"), col("p.a").as("a"), col("p.b").as("b"))
      val top = pairs.groupBy("a", "b").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      // AQE propagates an EMPTY pair table (the exhaustion round) into
      // an empty relation whose final plan no longer carries the
      // CollectMetrics node — the observation map comes back EMPTY, not
      // blocking. Fall back to the explicit one-job count; `wf` here is
      // still the post-merge-(rank-1) table, exactly the value owed.
      if (rank > 1) tokensAfter += scala.util.Try(
          obs.get("tokens").asInstanceOf[Long])
        .getOrElse(wf.agg(coalesce(sum(col("cnt") * size(col("syms"))), lit(0L)))
          .head.getLong(0))
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        val n = top(0).getLong(2)
        wf = wf.withColumn("syms", applyMerge(col("syms"), a, b)).localCheckpoint()
        out += ((rank, a, b, n))
        rank += 1
      }
    }
    if (out.length > tokensAfter.length)
      tokensAfter += wf
        .agg(coalesce(sum(col("cnt") * size(col("syms"))), lit(0L)))
        .head.getLong(0)
    import spark.implicits._
    val merges = out.toSeq.zip(tokensAfter)
      .map { case ((r, a, b, n), t) => (r, a, b, n, t) }
      .toDF("merge_rank", "lhs", "rhs", "n", "tokens_after")
    (merges, wf)
  }

  /** ENCODE the corpus with the trained merge table — the tokenizer-
    * inference path, and the op a data-budgeting pipeline actually
    * runs: token counts under the TRAINED tokenizer (q_text_tokens'
    * whitespace count approximates; this is the real number a token
    * budget is spent in). Because BPE merges never cross word
    * boundaries, encoding a document is a pure per-word lookup: the
    * final symbol table IS the trained tokenizer applied to every
    * vocab word, so the corpus encodes via one doc-word explode + a
    * vocab-sized hash join + one per-doc aggregate — no per-doc merge
    * replay, no broadcast of a corpus-sized side. Returns per doc:
    * n_words, n_subwords (Σ len(syms)), max_word_syms (the longest
    * word's subword count — the tail a sequence-length planner reads).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val (_, wf) = train(docs, textCol, nMerges)
    val words = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\W+"),
        t => length(t) > 0)).as("word"))
    words.join(wf.select(col("word"), size(col("syms")).as("n_syms")), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_subwords"),
        max(col("n_syms")).cast("long").as("max_word_syms"))
  }

  /** Train and PERSIST the tokenizer as a reusable artifact — the
    * build-once / serve-many discipline ([[TextClassifier.trainAndSave]]
    * pattern): a production pipeline trains the tokenizer on its
    * curated slice ONCE and every future corpus encodes against the
    * saved tables, no training jobs at encode time. The artifact is
    * two parquet tables under `path`:
    *   - `merges/`  — the ranked merge table (merge_rank, lhs, rhs, n,
    *     tokens_after), the file a tokenizer ships as `merges.txt`;
    *   - `symbols/` — the final per-word symbol table (word, syms),
    *     i.e. the trained tokenizer pre-applied to every training
    *     word — vocab-sized (Zipf: ~√corpus), the lookup side of
    *     every future encode join.
    * Both engine-agnostic parquet, readable by anything.
    */
  def trainAndSave(docs: DataFrame, textCol: String, nMerges: Int,
      path: String): Unit = {
    val (merges, wf) = train(docs, textCol, nMerges)
    merges.coalesce(1).write.mode("overwrite").parquet(path + "/merges")
    wf.select("word", "syms").write.mode("overwrite").parquet(path + "/symbols")
  }

  /** Encode an ARBITRARY corpus against a [[trainAndSave]] artifact:
    * one doc-word explode + a vocab-sized LEFT hash join against the
    * saved symbol table + one per-doc aggregate — zero training jobs,
    * and (unlike an inner join) out-of-vocabulary words are never
    * dropped: an unseen word falls back to its CHARACTER length (the
    * encoding BPE assigns a word none of whose learned merges the
    * serving layer can prove applicable without a per-word replay —
    * the conservative sequence-length upper bound a budget planner
    * wants). Returns per doc: (idCol, n_words, n_subwords,
    * max_word_syms, n_oov — how many word occurrences fell back,
    * the drift signal that tells a pipeline the tokenizer needs
    * retraining).
    */
  def encodeWith(spark: org.apache.spark.sql.SparkSession, modelPath: String,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val syms = spark.read.parquet(modelPath + "/symbols")
      .select(col("word"), size(col("syms")).as("n_syms"))
    val words = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\W+"),
        t => length(t) > 0)).as("word"))
    words.join(syms, Seq("word"), "left_outer")
      .withColumn("n_enc",
        coalesce(col("n_syms"), length(col("word"))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_enc")).as("n_subwords"),
        max(col("n_enc")).as("max_word_syms"),
        sum(when(col("n_syms").isNull, 1L).otherwise(0L)).as("n_oov"))
  }
}
