package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor (SURVEY §2.B.9 "scale path"):
  * a k-means coarse quantizer partitions the corpus into nCentroids
  * inverted lists; a probe searches only its nProbes nearest lists and
  * re-ranks candidates by exact cosine. Candidate count scales with
  * corpus/nCentroids · nProbes — independent of total corpus size when
  * nCentroids grows with the data.
  *
  * The quantizer is Spark ML k-means (seeded, deterministic); list
  * assignment and search are plain DataFrame ops.
  *
  * == Persisted layout: the lists ARE partitions ==
  *
  * The index's whole point is that a search touches
  * corpus/nCentroids × nProbes rows — and that has to hold for I/O,
  * not just compute. The persisted corpus is therefore written
  * `partitionBy("cluster")`: each inverted list is its own partition
  * directory, the probe-side `cluster IN (<probed ids>)` filter is a
  * PARTITION filter Spark resolves during planning, and a search's
  * scan reads only the probed lists' files (numFiles-asserted in
  * DedupSpec, the same observable as `q_table_skip_scan`). A flat
  * layout with a join-side cluster filter bounds the compute but
  * re-reads the ENTIRE corpus per search batch — at 100 TB that is
  * the difference between an index and a scan.
  *
  * Alongside each row's float vector the lists carry its int8 code
  * (`q_code`, per-vector max-abs scale — the `q_embed_quantize`
  * format): [[searchTopKQuantized]] runs its coarse pass over the
  * codes (4× less I/O and memory bandwidth) and its exact re-rank
  * over the float column of the SAME pruned files, so the whole
  * two-stage query reads index files only — IVF-PQ-lite.
  */
object IvfIndex {

  /** Fit the quantizer and return (corpus with cluster col, centroids
    * as (centroid_id, centroid_vec float-array) frame).
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol)))
    val model = new KMeans()
      .setK(nCentroids).setSeed(seed).setFeaturesCol("__v").setPredictionCol("cluster")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("__v")
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("centroid_id", "centroid_vec")
    (assigned, centroids)
  }

  /** Int8 codes for the coarse pass, denormalized onto the inverted
    * lists at write time (identical formula to `q_embed_quantize`:
    * per-vector max-abs scale, floor(x+0.5) half-up rounding — exact
    * integers, reproducible cross-engine). Stored as array<tinyint> —
    * a QUARTER of the float column's bytes, which is the whole point
    * of scanning codes in the coarse pass. Zero-norm vectors keep
    * their row (scale 0, all-zero code): an index must not silently
    * drop corpus rows, and the coarse score simply ranks them last.
    */
  private def withCodes(df: DataFrame, vecCol: String): DataFrame = df
    .withColumn("q_scale",
      array_max(transform(col(vecCol), x => abs(x))).cast("double"))
    .withColumn("q_code", when(col("q_scale") > 0,
        transform(col(vecCol), x =>
          floor(x.cast("double") * (lit(127.0) / col("q_scale")) + lit(0.5))
            .cast("byte")))
      .otherwise(transform(col(vecCol), _ => lit(0).cast("byte"))))

  /** Persist a fitted index under `path`: the cluster-assigned corpus
    * written `partitionBy("cluster")` — one partition directory per
    * inverted list, the layout [[searchTopK]]'s probed-cluster filter
    * prunes at planning time — plus int8 codes per row and the
    * centroid table. Fit ONCE, search many — at scale a k-means refit
    * per lookup is the difference between an index and a scan.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, path: String, seed: Long = 42L): Unit = {
    val (assigned, centroids) = fit(corpus, idCol, vecCol, nCentroids, seed)
    // cluster-exclusive shuffle before the partitioned write: ONE file
    // per inverted list instead of write-tasks × clusters small files
    // (the TextIndex bucket rule) — nCentroids doubles as the build's
    // write-parallelism lever, exactly how an IVF sizes itself: more
    // data → more lists → more parallel writers AND smaller probes
    withCodes(assigned, vecCol)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assigned")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index: (assigned corpus, centroids). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/assigned"), spark.read.parquet(s"$path/centroids"))

  /** Incremental maintenance: assign NEW vectors to the EXISTING
    * centroids (nearest-centroid, no refit) and append them to the
    * persisted inverted lists — FAISS's add-without-train, the ingest
    * path an index needs at scale: a per-batch k-means refit re-scans
    * the whole corpus, while assignment is one broadcast crossJoin +
    * `min_by` partial aggregation over the batch — O(batch ×
    * nCentroids) work, no shuffle of anything corpus-sized, no window.
    * The append lands INSIDE the cluster partition directories (same
    * `partitionBy` layout as the build), so searches over the grown
    * index keep pruning to probed lists. Ties break by centroid id,
    * matching the deterministic argmin the fit-time transform
    * computes. Centroid staleness under distribution drift is the
    * caller's rebuild-cadence policy, as in any IVF system.
    */
  def appendToIndex(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = newVecs.sparkSession
    val centroids = spark.read.parquet(s"$path/centroids")
    val cluster = newVecs.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", l2_dist(col(vecCol), col("centroid_vec")))
      .groupBy(idCol)
      .agg(min_by(col("centroid_id"),
        struct(col("cdist"), col("centroid_id"))).as("cluster"))
    // join the assignment back so EVERY caller column survives into
    // the inverted lists (the fit-time layout keeps them too) — a
    // batch-keyed hash join, nothing corpus-sized moves
    withCodes(newVecs.join(cluster, idCol), vecCol)
      .repartition(col("cluster")) // one file per touched list per batch
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$path/assigned")
  }

  /** Each probe's nProbes nearest centroids: (probe_id, probe_vec,
    * cluster). The window here is safe at any corpus size — a probe's
    * partition holds nCentroids rows, a chosen parameter, never
    * data-scaled.
    */
  private def probeLists(centroids: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, nProbes: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val wC = Window.partitionBy("probe_id").orderBy(col("cdist").asc, col("centroid_id").asc)
    p.crossJoin(broadcast(centroids))
      .withColumn("cdist", l2_dist(col("probe_vec"), col("centroid_vec")))
      .withColumn("crank", row_number().over(wC))
      .filter(col("crank") <= nProbes)
      .select(col("probe_id"), col("probe_vec"), col("centroid_id").as("cluster"))
  }

  /** The distinct cluster ids a probe batch will touch — the literals
    * of the partition filter. Driver-sized by construction: at most
    * nCentroids ints regardless of probe or corpus count (the ONE
    * driver-side step of a search, and the price of turning the
    * probed-cluster predicate into planning-time partition pruning).
    * Public so specs can assert the pruned file set against it.
    */
  def probedClusterIds(centroids: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, nProbes: Int): Seq[Int] =
    probeLists(centroids, probes, idCol, vecCol, nProbes)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq.sorted

  /** Approximate top-k over a prebuilt index (no refit): search the
    * nProbes nearest inverted lists, exact cosine re-rank. The
    * probed-cluster restriction is applied as `cluster IN (<ids>)` ON
    * THE INDEX SCAN — against the [[buildIndex]] layout that is a
    * partition filter, so planning elides every unprobed list's files
    * and the scan's I/O is O(probed lists), not O(corpus).
    */
  def searchTopK(
      assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Int): DataFrame = {
    val pl = probeLists(centroids, probes, idCol, vecCol, nProbes)
    // ONE tiny driver collect (≤ nCentroids ints) turns the probed-
    // cluster predicate into partition-filter literals
    val probed = pl.select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    // candidates: corpus rows in any probed list; exact re-rank with
    // the bounded-heap cut — a probe's candidate set is
    // corpus/nCentroids × nProbes rows, which a row_number window
    // would funnel into ONE sort task per probe at scale
    val c = assigned.filter(col("cluster").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
        col("cluster"))
    val cands = c.join(broadcast(pl), Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    SimilaritySearch.heapTopK(cands.select("probe_id", "neighbor_id", "cos"), "cos", k)
  }

  /** IVF-PQ-lite two-stage search over a [[buildIndex]] layout: the
    * coarse pass scores the PROBED lists' int8 codes (the same
    * `cluster IN` partition pruning as [[searchTopK]], but the scan
    * reads only the id/code/scale columns — a quarter of the float
    * vector's bytes), keeps nCandidates per probe with the bounded
    * heap, and only those candidates run the exact float cosine —
    * read from the embedding column OF THE SAME pruned index files,
    * so the entire query's input set is index files (inputFiles-
    * asserted in DedupSpec): the corpus table is never touched at
    * query time. Composition of `q_sim_rerank`'s two-stage cut with
    * the IVF layout: stage-1 I/O is O(probed lists)/4, stage-2 is a
    * broadcast-candidate semi-read, and the re-rank is exact over the
    * surviving ids. Zero-norm probes are dropped (cosine undefined),
    * matching [[SimilaritySearch.quantizedRerankTopK]].
    */
  def searchTopKQuantized(
      assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Int,
      nCandidates: Int): DataFrame = {
    val pq = withCodes(
        probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec")),
        "probe_vec")
      .filter(col("q_scale") > 0)
      .select(col("probe_id"), col("probe_vec"),
        col("q_scale").as("p_scale"), col("q_code").as("p_code"))
    val pl = probeLists(centroids, pq.select(col("probe_id").as("id"),
        col("probe_vec").as("v")), "id", "v", nProbes)
      .join(pq, "probe_id")
      .select("probe_id", "cluster", "p_scale", "p_code")
    val probed = pl.select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    // stage 1: int8 coarse scores over the pruned lists' code columns
    // only — the single biggest read of the query at 1/4 width
    val codes = assigned.filter(col("cluster").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col("q_code"), col("q_scale"),
        col("cluster"))
    val scored = codes.join(broadcast(pl), Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qdot",
        aggregate(zip_with(col("p_code"), col("q_code"),
          // explicit widening: tinyint × tinyint must not multiply in
          // byte arithmetic (−127·−127 overflows a byte)
          (a, b) => a.cast("long") * b.cast("long")), lit(0L), (acc, v) => acc + v))
      .withColumn("approx",
        col("qdot").cast("double") * col("p_scale") * col("q_scale") / lit(16129.0))
    val candIds = SimilaritySearch.heapTopK(
        scored.select("probe_id", "neighbor_id", "approx"), "approx", nCandidates)
      .select("probe_id", "neighbor_id")
    // stage 2: exact cosine for the candidates, floats read from the
    // SAME pruned partitions (column pruning gives this scan the
    // embedding column the coarse scan never read)
    val floats = assigned.filter(col("cluster").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val exact = floats.join(
        broadcast(candIds.join(pq.select("probe_id", "probe_vec"), "probe_id")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    SimilaritySearch.heapTopK(exact.select("probe_id", "neighbor_id", "cos"), "cos", k)
  }

  /** Convenience fit+search in one call (small corpora / tests). */
  def topK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbes: Int = 4): DataFrame = {
    val (assigned, centroids) = fit(corpus, idCol, vecCol, nCentroids)
    searchTopK(assigned, centroids, probes, idCol, vecCol, k, nProbes)
  }
}
