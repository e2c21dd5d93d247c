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
  * assignment and search are plain DataFrame ops, so the whole index
  * is a pair of columns (`cluster`) and survives as parquet.
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

  /** Persist a fitted index: cluster-assigned corpus + centroids as
    * parquet under `path`. Fit ONCE, search many — at scale a k-means
    * refit per lookup is the difference between an index and a scan.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, path: String, seed: Long = 42L): Unit = {
    val (assigned, centroids) = fit(corpus, idCol, vecCol, nCentroids, seed)
    assigned.write.mode("overwrite").parquet(s"$path/assigned")
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
    * Ties break by centroid id, matching the deterministic argmin the
    * fit-time transform computes. Centroid staleness under
    * distribution drift is the caller's rebuild-cadence policy, as in
    * any IVF system.
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
    newVecs.join(cluster, idCol)
      .write.mode("append").parquet(s"$path/assigned")
  }

  /** Approximate top-k over a prebuilt index (no refit): search the
    * nProbes nearest inverted lists, exact cosine re-rank.
    */
  def searchTopK(
      assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Int): DataFrame = {
    // probe → its nProbes nearest centroids (tiny crossJoin). The
    // window here is safe at any corpus size: a probe's partition holds
    // nCentroids rows — a chosen parameter, never data-scaled.
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val wC = Window.partitionBy("probe_id").orderBy(col("cdist").asc, col("centroid_id").asc)
    val probeLists = p.crossJoin(broadcast(centroids))
      .withColumn("cdist", l2_dist(col("probe_vec"), col("centroid_vec")))
      .withColumn("crank", row_number().over(wC))
      .filter(col("crank") <= nProbes)
      .select(col("probe_id"), col("probe_vec"), col("centroid_id").as("cluster"))
    // candidates: corpus rows in any probed list; exact re-rank with
    // the bounded-heap cut — a probe's candidate set is
    // corpus/nCentroids × nProbes rows, which a row_number window
    // would funnel into ONE sort task per probe at scale
    val c = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
      col("cluster"))
    val cands = c.join(broadcast(probeLists), Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    SimilaritySearch.heapTopK(cands.select("probe_id", "neighbor_id", "cos"), "cos", k)
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
