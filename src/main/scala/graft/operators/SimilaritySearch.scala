package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.B.9).
  *
  * Brute force is the correctness baseline: broadcast the (small) probe
  * set against the full corpus — one scan, no shuffle of the corpus,
  * per-probe top-k via window. The LSH variant buckets by random
  * hyperplane signatures and searches only same-bucket candidates
  * (multi-probe across tables for recall) — corpus-size-independent
  * candidate sets, the 100 TB path.
  */
object SimilaritySearch {

  /** Per-probe bounded-heap top-k cut ([[graft.functions.Aggregators.TopKByScore]]):
    * partial aggregation keeps k (score, id) pairs per probe on every
    * map task, so the shuffle carries O(probes × k) rows and NO task
    * ever sorts a whole probe's scored corpus — the failure mode of a
    * `row_number` window cut, whose per-probe partition holds |corpus|
    * rows in one task at scale. Ties break by ascending neighbor id,
    * identical to the window ordering it replaces. Output:
    * (probe_id, rank, neighbor_id, `scoreCol`).
    */
  private[operators] def heapTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.Aggregators.TopKByScore(k))
    scored.groupBy("probe_id")
      .agg(topk(col("neighbor_id"), col(scoreCol)).as("hits"))
      .select(col("probe_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("hit.id").as("neighbor_id"), col("hit.score").as(scoreCol))
  }

  /** Exact cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding self). Probes must be small enough to
    * broadcast; corpus side streams through one codegen'd stage into
    * the bounded-heap cut — exactness comes from scoring EVERY corpus
    * row, not from how the top k are kept, so the baseline shares
    * [[heapTopK]] with the approximate variants and no per-probe
    * corpus-sized sort task exists anywhere in the family (the window
    * formulation survives only as a spec-level cross-check in
    * DedupSpec).
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    heapTopK(scored.select("probe_id", "neighbor_id", "cos"), "cos", k)
  }

  /** LSH-bucketed approximate top-k: `nTables` independent hyperplane
    * signatures; candidates = corpus vectors sharing a bucket with the
    * probe in any table; exact cosine re-rank of candidates only.
    *
    * `nFlips` > 0 enables multi-probe (Lv '07): each probe additionally
    * searches the buckets reached by flipping its `nFlips` lowest-margin
    * sign bits per table. Recall comparable to extra hash tables, but
    * the CORPUS side is untouched — only the tiny probe side fans out,
    * so at 100 TB the candidate budget is tunable without re-hashing or
    * re-shuffling the corpus.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, nTables: Int = 4, nFlips: Int = 0): DataFrame = {
    // ONE scan per side: a single projection computes every table's
    // bucket (per-table plane seed → genuinely independent signatures;
    // a shared-prefix scheme — nBits + t planes from one set — makes
    // every table-t collision imply a table-0 collision, adding cost
    // but zero recall) and explodes the (table, bucket) pairs. The
    // former per-table unionAll form re-scanned the corpus nTables
    // times — at 100 TB that is nTables full reads for the same rows.
    def bucketed(df: DataFrame, id: String, vec: String, flips: Int) = {
      val renamed = df.select(col(idCol).as(id), col(vecCol).as(vec))
      if (flips == 0) {
        val pairs = (0 until nTables).map { t =>
          struct(lit(t).as("table"), hyperplane_bucket(col(vec), nBits, t).as("bucket"))
        }
        renamed.select(col(id), col(vec), explode(array(pairs: _*)).as("tb"))
          .select(col(id), col(vec), col("tb.table").as("table"),
            col("tb.bucket").as("bucket"))
      } else {
        // (table, array<bucket>) structs — one kernel call per table —
        // then a second explode flattens the per-table probe lists
        val pairs = (0 until nTables).map { t =>
          struct(lit(t).as("table"),
            hyperplane_probes(col(vec), nBits, t, flips).as("buckets"))
        }
        renamed.select(col(id), col(vec), explode(array(pairs: _*)).as("tb"))
          .select(col(id), col(vec), col("tb.table").as("table"),
            explode(col("tb.buckets")).as("bucket"))
      }
    }
    val c = bucketed(corpus, "neighbor_id", "neighbor_vec", flips = 0)
    val p = bucketed(probes, "probe_id", "probe_vec", flips = nFlips)
    // score BEFORE the pair dedup (the Dedup.embeddingNearDups rule):
    // cosine is identical across a pair's duplicate (table, bucket)
    // hits, so deduping the scored narrow rows keeps the result
    // bit-identical while the dedup exchange carries (ids, cos) — 3
    // flat columns through a codegen'd HashAggregate — instead of two
    // d-wide vectors through first(array) SortAggregates (plan before:
    // Sort + SortAggregate on both sides of the pair exchange with the
    // vectors in the shuffle; the re-scored duplicate hits are ≤
    // nTables× flops on candidate rows only, cheap next to shuffling
    // and sorting the payload at any d)
    val cands = c.join(broadcast(p), Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
      .select("probe_id", "neighbor_id", "cos")
      .dropDuplicates("probe_id", "neighbor_id")
    // bounded-heap cut: a hot probe (or a skewed bucket) never piles
    // its whole candidate set into one window-sort task
    heapTopK(cands, "cos", k)
  }

  /** Two-stage quantized re-rank: a coarse pass scores EVERY corpus
    * vector with the int8 approximation (per-vector max-abs scale, the
    * `q_embed_quantize` format — 4x less memory bandwidth than float32,
    * integer dot product), keeps the top `nCandidates` per probe, and
    * only those run the exact float cosine. This is the classic
    * IVF-free scale pattern for a quantized corpus: stage 1 reads the
    * int8 columns (at 100 TB, the only full-corpus pass), stage 2
    * touches `nCandidates x |probes|` rows.
    *
    * Determinism: quantized values and the integer dot product are
    * exact (|q| <= 127, so qdot < 2^53 for any realistic dim); the
    * approx score multiplies them by the two scales in one fixed
    * association, so the stage-1 cut is reproducible cross-engine
    * bit-for-bit. Ties broken by neighbor id at both cuts.
    */
  def quantizedRerankTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nCandidates: Int): DataFrame = {
    def quantized(df: DataFrame, id: String, vec: String, scale: String) = df
      .select(col(idCol).as(id), col(vecCol).as(vec),
        array_max(transform(col(vecCol), x => abs(x))).cast("double").as(scale))
      .filter(col(scale) > 0) // zero vectors have no direction; cosine undefined
      .withColumn(s"q_$id", transform(col(vec), x =>
        floor(x.cast("double") * (lit(127.0) / col(scale)) + lit(0.5)).cast("long")))
    val p = quantized(probes, "probe_id", "probe_vec", "p_scale")
    val c = quantized(corpus, "neighbor_id", "neighbor_vec", "c_scale")
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("qdot",
        aggregate(zip_with(col("q_probe_id"), col("q_neighbor_id"),
          (a, b) => a * b), lit(0L), (acc, v) => acc + v))
      .withColumn("approx",
        col("qdot").cast("double") * col("p_scale") * col("c_scale") / lit(16129.0))
    // stage-1 cut as a bounded heap, NOT a window: the full-corpus
    // scored stream reduces map-side to nCandidates rows per probe —
    // the only all-corpus pass never funnels into a per-probe sort task
    val candIds = heapTopK(scored.select("probe_id", "neighbor_id", "approx"),
        "approx", nCandidates)
      .select("probe_id", "neighbor_id")
    // stage 2: re-join the candidate ids (probes × nCandidates rows —
    // broadcast-sized by construction) against the float vectors for
    // the exact cosine; column-pruned corpus scan, no shuffle
    val pv = p.select(col("probe_id"), col("probe_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"))
    val exact = cv.join(broadcast(candIds.join(pv, "probe_id")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    heapTopK(exact.select("probe_id", "neighbor_id", "cos"), "cos", k)
  }

  /** Two-stage TRUNCATED-DIMENSION re-rank — the Matryoshka (MRL,
    * Kusupati et al. '22) retrieval pattern: embeddings trained with
    * nested-prefix objectives keep most of their signal in the leading
    * dimensions, so the coarse pass scores every corpus vector on only
    * the first `coarseDims` components (dim/coarseDims× less compute
    * AND — when the corpus stores a truncated sidecar column — less
    * I/O), keeps `nCandidates` per probe, and only those run the exact
    * full-dimension cosine. The complementary cut to
    * [[quantizedRerankTopK]]: that one shrinks bytes-per-component,
    * this one shrinks components; at 100 TB the two compose (truncated
    * int8 coarse pass).
    *
    * Determinism: `slice` is positional, the truncated cosine is the
    * same libm arithmetic in both engines over identical floats, and
    * both cuts break ties by ascending neighbor id. Vectors whose
    * truncated prefix is all-zero are dropped at stage 1 (truncated
    * cosine undefined), mirroring the zero-vector rule above.
    */
  def truncatedRerankTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nCandidates: Int,
      coarseDims: Int): DataFrame = {
    def truncated(df: DataFrame, id: String, vec: String) = df
      .select(col(idCol).as(id), col(vecCol).as(vec),
        slice(col(vecCol), 1, coarseDims).as(s"t_$id"))
      .filter(aggregate(col(s"t_$id"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) > 0)
    val p = truncated(probes, "probe_id", "probe_vec")
    val c = truncated(corpus, "neighbor_id", "neighbor_vec")
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("coarse",
        cosine_sim(col("t_probe_id"), col("t_neighbor_id")))
    val candIds = heapTopK(scored.select("probe_id", "neighbor_id", "coarse"),
        "coarse", nCandidates)
      .select("probe_id", "neighbor_id")
    val pv = p.select(col("probe_id"), col("probe_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"))
    val exact = cv.join(broadcast(candIds.join(pv, "probe_id")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    heapTopK(exact.select("probe_id", "neighbor_id", "cos"), "cos", k)
  }

  /** Margin-based MUTUAL-kNN pair mining (Artetxe & Schwenk '19,
    * arXiv:1811.01136 — the LASER/CCMatrix bitext-mining scorer, and
    * the same shape mines any cross-set alignment: caption↔image
    * embeddings, question↔answer, translation pairs). For two vector
    * sets indexed as IVF layouts, each side kNN-joins into the other;
    * a pair scores margin = cos(x,y) / ((avgₖcos(x→tgt) +
    * avgₖcos(y→src)) / 2) — the RATIO strategy, which suppresses hub
    * vectors that score high against everything (raw-cosine mining's
    * failure mode). Kept pairs must be MUTUAL (each inside the other's
    * kNN), clear `marginThreshold`, and per src vector only the
    * best-margin tgt survives (the paper's "max" strategy; ties →
    * lowest tgt id).
    *
    * Scale shape: with pruned probing (nProbes < nLists, the corpus-
    * scale recall/cost knob, auditable with q_sim_recall_curve's
    * machinery) both directions are [[IvfIndex.knnJoin]]s — shuffle
    * joins on the pruned list id with bounded-heap cuts (probe tables
    * here are corpus-sized, so searchTopK's broadcast would be fatal);
    * the per-vector kNN averages are partial aggregates over k rows
    * each; the mutual check and both average attachments are keyed
    * hash joins on pair/vector ids, O(n·k) rows end to end. No window,
    * no cartesian.
    *
    * With EXHAUSTIVE probing (nProbes ≥ both sides' list counts — the
    * verify-scale operating point, where the result is exact → brute-
    * force DuckDB oracle) the knnJoin shape degrades: its equi-join's
    * only key is the list id — nLists distinct values, so nLists tasks
    * carry the whole O(n²) candidate volume no matter how many cores
    * exist, and the cosine kernel re-accumulates both operands' norms
    * on every pair. The exhaustive branch ([[exhaustiveMutualTopK]])
    * runs each direction through a deterministic R×R block join
    * instead (R² keys spread the pair volume over the full task grid)
    * with per-row factored norms — bit-identical results, full-width
    * parallelism, d-flop pairs.
    */
  def marginMutualKnn(
      srcAssigned: DataFrame, srcCentroids: DataFrame,
      tgtAssigned: DataFrame, tgtCentroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Int,
      marginThreshold: Double): DataFrame = {
    val srcRows = srcAssigned.select(col(idCol), col(vecCol))
    val tgtRows = tgtAssigned.select(col(idCol), col(vecCol))
    // centroid tables are parameter-sized by construction (the
    // IvfIndex driver-cache contract) — collecting the live list ids
    // is a tiny job, and the exhaustive branch needs exactly these ids
    def liveIds(centroids: DataFrame): Seq[Int] =
      centroids.select("centroid_id").collect().map(_.getInt(0)).toSeq
    val liveS = liveIds(srcCentroids)
    val liveT = liveIds(tgtCentroids)
    val (fwd, rev) =
      if (nProbes >= liveS.size && nProbes >= liveT.size)
        exhaustiveMutualTopK(srcAssigned, liveS, tgtAssigned, liveT,
          idCol, vecCol, k)
      else
        // src → tgt: every src vector probes the tgt index (and vice
        // versa). Each direction's kNN feeds two consumers
        // (knn-average + mutual join); NOT checkpointed — AQE's
        // exchange reuse already computes the shared heap-cut shuffle
        // once at runtime (measured: adding localCheckpoint here read
        // 4.75 s vs 4.01 s pristine at sf0.1 — the eager
        // materialization costs more than the reuse it replaces).
        (IvfIndex.knnJoin(tgtAssigned, tgtCentroids, srcRows,
            idCol, vecCol, k, nProbes),
          IvfIndex.knnJoin(srcAssigned, srcCentroids, tgtRows,
            idCol, vecCol, k, nProbes))
    val fAvg = fwd.groupBy(col("probe_id").as("src_id"))
      .agg(avg("cos").as("src_knn_avg"))
    val rAvg = rev.groupBy(col("probe_id").as("tgt_id"))
      .agg(avg("cos").as("tgt_knn_avg"))
    val mutual = fwd
      .select(col("probe_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cos"))
      .join(rev.select(col("probe_id").as("tgt_id"),
        col("neighbor_id").as("src_id")), Seq("src_id", "tgt_id"))
    // per-src best pick: the (margin desc, tgt_id asc) ordering packs
    // into one decimal ([[VectorExpressions.pack_ord]] — margin > 0
    // past the threshold, tgt ids are non-negative), so all three
    // max_by buffers are UnsafeRow-mutable and the aggregate stays a
    // HashAggregate; the former struct ordering demoted it to a
    // SortAggregate. The pack embeds tgt_id, so the ordering is unique
    // within a group and the three picks land on the same row.
    val bestOrd = pack_ord(double_sort_bits(col("margin")),
      lit(Long.MaxValue) - col("tgt_id"))
    mutual
      .join(fAvg, Seq("src_id"))
      .join(rAvg, Seq("tgt_id"))
      .withColumn("margin",
        col("cos") / ((col("src_knn_avg") + col("tgt_knn_avg")) / 2))
      .filter(col("margin") >= marginThreshold)
      .groupBy("src_id")
      .agg(max_by(col("tgt_id"), bestOrd).as("tgt_id"),
        max_by(col("cos"), bestOrd).as("cos"),
        max_by(col("margin"), bestOrd).as("margin"))
      .select(col("src_id"), col("tgt_id"), col("cos"), col("margin"))
  }

  /** Both directions of an EXHAUSTIVE cross-set kNN (the
    * [[marginMutualKnn]] exhaustive branch; see its scaladoc for why).
    * Returns (fwd, rev) with [[heapTopK]]'s output shape —
    * bit-identical to two exhaustive [[IvfIndex.knnJoin]]s: the same
    * pair sets (candidates filtered to each side's live clusters,
    * probes unfiltered, self-pairs excluded), the same cosine kernel,
    * the same bounded-heap cut with the same ascending-id tie rule.
    *
    * Each direction is one codegen pipeline — block join → cosine →
    * narrow projection → partial heap aggregation — with NO per-pair
    * generator: a shared-scoring variant that emitted both probe roles
    * from one pass (half the cosine flops) measured 3.5× SLOWER at sf1
    * (25.5 → 90.6 s), because its per-pair `explode(array(struct…))`
    * put two allocations and a generator row on every one of the n²
    * pairs — per-pair allocation beats per-pair flops at any d. The
    * heap cut's exchange caps each direction's n² subtree, so AQE
    * exchange reuse runs it once for its two downstream consumers
    * (knn-average + mutual join), exactly as on the pruned path.
    */
  private def exhaustiveMutualTopK(
      srcAssigned: DataFrame, liveSrc: Seq[Int],
      tgtAssigned: DataFrame, liveTgt: Seq[Int],
      idCol: String, vecCol: String, k: Int): (DataFrame, DataFrame) = {
    val spark = srcAssigned.sparkSession
    // R×R deterministic blocks: R² join keys over the task grid. The
    // pruned path's list-id join key has only nLists distinct values,
    // so at exhaustive probing nLists tasks carry the whole O(n²)
    // candidate volume no matter how many cores exist; R² keys spread
    // it (guide §2.5's many-keys rule). Replication factor R per side
    // is the standard block-nested cost, scale-adaptive via the
    // session's shuffle partitioning. Results are R-independent — the
    // pair SET is the full cross product whatever the blocking.
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val r = math.max(4L, math.ceil(math.sqrt(parts * 4.0)).toLong)
    def oneDirection(assigned: DataFrame, live: Seq[Int],
        probes: DataFrame): DataFrame = {
      // numbered repartition on BOTH sides: the shuffled bytes are tiny
      // relative to the join's n² OUTPUT, so AQE's byte-sized partition
      // coalescing would fold the block grid back into a handful of
      // tasks (it cannot see the output explosion); an explicit
      // partition count is strict under AQE. Skew-splitting is not
      // being given up — the blocks are uniform by construction
      // (xxhash64 of the id), unlike the hot-list cluster key the
      // pruned path must leave splittable.
      // norms are per-VECTOR invariants: computed once per row here (the
      // same double accumulation chain as the cosine kernel's na/nb, so
      // sqrt comes out bit-identical), the per-pair work drops from 3d
      // flops (the kernel re-accumulates both norms every pair) to the
      // d-flop dot product plus one multiply+divide — with the exact
      // kernel arithmetic: denom = sqrt(na)·sqrt(nb), cos = dp/denom,
      // zero denom → 0.0.
      def norm(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        sqrt(aggregate(v, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      val c = assigned.filter(col("cluster").isin(live: _*))
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
        .withColumn("n_norm", norm(col("neighbor_vec")))
        .withColumn("cb", pmod(xxhash64(col("neighbor_id")), lit(r)))
        .withColumn("pb", explode(sequence(lit(0L), lit(r - 1))))
        .repartition(parts, col("pb"), col("cb"))
      val p = probes
        .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
        .withColumn("p_norm", norm(col("probe_vec")))
        .withColumn("pb", pmod(xxhash64(col("probe_id")), lit(r)))
        .withColumn("cb", explode(sequence(lit(0L), lit(r - 1))))
        .repartition(parts, col("pb"), col("cb"))
      val cands = c.join(p, Seq("pb", "cb"))
        .filter(col("probe_id") =!= col("neighbor_id"))
        .withColumn("denom", col("p_norm") * col("n_norm"))
        .withColumn("cos", when(col("denom") === 0.0, lit(0.0))
          .otherwise(dot_product(col("probe_vec"), col("neighbor_vec")) / col("denom")))
      heapTopK(cands.select("probe_id", "neighbor_id", "cos"), "cos", k)
    }
    (oneDirection(tgtAssigned, liveTgt,
        srcAssigned.select(col(idCol), col(vecCol))),
      oneDirection(srcAssigned, liveSrc,
        tgtAssigned.select(col(idCol), col(vecCol))))
  }
}
