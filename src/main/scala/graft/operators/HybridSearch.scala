package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of the two persisted
  * index access paths — a lexical leg served by the inverted text
  * index ([[TextIndex.bm25]]: manifest totals, term-pruned postings)
  * and a vector leg served by the cluster-partitioned IVF index
  * ([[IvfIndex.searchTopK]]: probed-list partition pruning). This is
  * the RAG-retrieval shape: one query = a term set plus an embedding;
  * the answer is one fused ranking per probe.
  *
  * RRF (Cormack et al., SIGIR'09): score(d) = Σ_legs 1/(k0 + rank_leg(d)),
  * summed over the legs that retrieved d in their top-n. Fusion is a
  * UNION of per-leg contribution rows + one groupBy — deliberately NOT
  * a full-outer join, which cannot broadcast either side and would add
  * a join for every extra leg. At scale every stage is bounded:
  *   - the BM25 leg is O(postings-of-terms) index I/O and its leg
  *     rank comes from the bounded-heap aggregator over the already-
  *     `limit(n)`-ed rows (≤ n, driver-bounded) — the plan carries NO
  *     window operator at all;
  *   - the vector leg inherits the IVF layout's partition pruning and
  *     the bounded-heap cut (shuffle carries O(probes × n) rows);
  *   - the text leg is replicated to probes by a broadcast crossJoin
  *     of an ≤ n-row frame — the corpus is never rescanned;
  *   - the fused cut reuses the same heap aggregator, so no per-probe
  *     sort task materializes the candidate union.
  * Candidate set per probe = union of both legs' top-n (standard RRF —
  * docs outside both top-n lists score 0 and cannot enter the fused
  * top-k for k ≤ n). The vector leg excludes the probe's own vector
  * (self-match); the text leg has no self notion, so a probe's own
  * document may still surface through its lexical rank.
  */
object HybridSearch {

  /** Fused top-k per probe. `n` is the per-leg retrieval depth, `k`
    * the fused cut, `k0` the RRF smoothing constant (60 in the paper).
    * Ties in the fused score (common: a rank-r-text-only doc and a
    * rank-r-vector-only doc score identically) break by ascending
    * doc id, in both the heap cut and the oracle. Output:
    * (probe_id, rank, doc_id, rrf).
    */
  def rrfTopK(spark: SparkSession, textIndexPath: String,
      assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      terms: Seq[String], idCol: String, vecCol: String,
      n: Int, k: Int, nProbes: Int, k0: Int = 60): DataFrame = {
    // lexical leg: BM25 off the persisted index; the leg rank comes
    // from the SAME bounded-heap aggregator as every other cut in the
    // family (one synthetic group key — the leg has no probe notion),
    // so the whole fused plan is WINDOW-FREE: no single-partition
    // WindowExec anywhere, not even an n-bounded one
    val textTop = legRank(TextIndex.bm25(spark, textIndexPath, terms, n), n)
    // vector leg: IVF search (partition-pruned lists, heap cut)
    val vecTop = IvfIndex.searchTopK(assigned, centroids, probes,
        idCol, vecCol, n, nProbes)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("leg_rank"))
    fuse(textTop, vecTop, probes, idCol, k, k0)
  }

  /** [[rrfTopK]] AT AN EPOCH PIN — the fused as-of read that completes
    * the pinned serving stack ([[IndexEpoch]] pins both index states
    * in one CAS; each leg already serves ranked as-of reads, but the
    * fused RRF ranking is the deliverable a coordinator-pinned tier
    * actually returns): the lexical leg is [[TextIndex.bm25AsOf]]
    * (generations, seq ceiling, tombstone horizon AND n_docs/avgdl
    * from the pinned manifest content), the vector leg is
    * [[IvfIndex.searchTopK]] over [[IvfIndex.loadLiveAsOf]]'s masked
    * rows probing the pin's `cgen` centroid table — so the probed
    * cluster set, the candidate rows, and the corpus scalars are ALL
    * pin-resolved, and the fused ranking is bit-stable under post-pin
    * mutation and (root registered) full layout maintenance. Same
    * fusion plan as the live verb — union + groupBy + heap cut,
    * window-free, nothing corpus-sized broadcast.
    */
  def rrfTopKAsOf(spark: SparkSession, textIndexPath: String,
      vecIndexPath: String, probes: DataFrame, terms: Seq[String],
      idCol: String, vecCol: String, n: Int, k: Int, nProbes: Int,
      textPin: Seq[String], vecPin: Seq[String], k0: Int = 60): DataFrame = {
    val textTop = legRank(
      TextIndex.bm25AsOf(spark, textIndexPath, terms, n, textPin), n)
    val (masked, pinCentroids) =
      IvfIndex.loadLiveAsOf(spark, vecIndexPath, idCol, vecPin)
    val vecTop = IvfIndex.searchTopK(masked, pinCentroids, probes,
        idCol, vecCol, n, nProbes)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("leg_rank"))
    fuse(textTop, vecTop, probes, idCol, k, k0)
  }

  /** The lexical leg's rank: the bounded-heap cut over an already
    * `limit(n)`-ed (doc_id, score) frame — ≤ n driver-bounded rows,
    * one synthetic group key, no window.
    */
  private def legRank(bm: DataFrame, n: Int): DataFrame =
    SimilaritySearch.heapTopK(
        bm.select(lit(0L).as("probe_id"), col("doc_id").as("neighbor_id"),
          col("score")),
        "score", n)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("leg_rank"))

  /** The shared fusion tail (live and as-of verbs): replicate the
    * probe-free text leg to probes by broadcast crossJoin of an ≤ n-row
    * frame, union the per-leg contributions, one groupBy, heap cut.
    */
  private def fuse(textTop: DataFrame, vecTop: DataFrame, probes: DataFrame,
      idCol: String, k: Int, k0: Int): DataFrame = {
    val pid = probes.select(col(idCol).as("probe_id"))
    val contrib = pid.crossJoin(broadcast(textTop))
      .unionByName(vecTop)
      .select(col("probe_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("leg_rank")).cast("double")).as("contrib"))
    // ≤ 2 contribution rows per (probe, doc): the sum is order-free
    // bit-identically (IEEE addition of two positive doubles commutes)
    val fused = contrib.groupBy("probe_id", "doc_id")
      .agg(sum("contrib").as("rrf"))
    SimilaritySearch.heapTopK(
        fused.select(col("probe_id"), col("doc_id").as("neighbor_id"), col("rrf")),
        "rrf", k)
      .select(col("probe_id"), col("rank"), col("neighbor_id").as("doc_id"),
        col("rrf"))
  }
}
