package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Exact cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding self). Probes must be small enough to
    * broadcast; corpus side streams through one codegen'd stage.
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }

  /** LSH-bucketed approximate top-k: `nTables` independent hyperplane
    * signatures; candidates = corpus vectors sharing a bucket with the
    * probe in any table; exact cosine re-rank of candidates only.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, nTables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) = {
      val tables = (0 until nTables).map { t =>
        // per-table plane seed → genuinely independent signatures; a
        // shared-prefix scheme (nBits + t planes from one set) makes
        // every table-t collision imply a table-0 collision, adding
        // cost but zero recall
        df.select(col(idCol).as(id), col(vecCol).as(vec))
          .withColumn("table", lit(t))
          .withColumn("bucket", hyperplane_bucket(col(vec), nBits, t))
      }
      tables.reduce(_ unionAll _)
    }
    val c = bucketed(corpus, "neighbor_id", "neighbor_vec")
    val p = bucketed(probes, "probe_id", "probe_vec")
    val cands = c.join(broadcast(p), Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")
      .withColumn("cos", cosine_sim(col("probe_vec"), col("neighbor_vec")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cos")
  }
}
