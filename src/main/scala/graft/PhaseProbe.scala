package graft

import graft.operators.{HybridSearch, IndexEpoch, IvfIndex, TextIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings INSIDE the pinned-hybrid drill (q_hybrid_asof) — the
  * [[ScaleProbe]] discipline applied to the round-19 top-of-bill query:
  * the per-query Bench can say the drill costs ~14 s but not which of
  * its 12 maintenance verbs the seconds sit in. Two rounds (cold, then
  * warm) so JIT/codegen effects are visible instead of folded in.
  *
  * Usage: scripts/run.sh graft.PhaseProbe [sfDir]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Tables.scratch("warehouse"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables(s, sfDir, "documents")
    val emb = Tables(s, sfDir, "embeddings")
    // warm pass (JIT) at sf0.001 equivalent: skip — run twice instead
    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      val tidx = Tables.scratch(s"probe_tidx_$round")
      val vidx = Tables.scratch(s"probe_vidx_$round")
      val root = Tables.scratch(s"probe_root_$round")
      val terms = Seq("hash", "merge", "vector")
      val probes = emb.filter(col("vec_id") < 5).localCheckpoint()
      timed("text build")(TextIndex.buildIndex(docs, "doc_id", "text", tidx))
      timed("ivf build")(IvfIndex.buildIndex(emb, "vec_id", "embedding",
        nCentroids = 16, path = vidx))
      timed("pre-pin deletes") {
        TextIndex.deleteDocs(docs.filter(col("doc_id") % 17 === 3)
          .select("doc_id"), "doc_id", tidx)
        IvfIndex.deleteFromIndex(emb.filter(col("vec_id") % 17 === 3)
          .select("vec_id"), "vec_id", vidx)
      }
      var tPin: Seq[String] = null; var vPin: Seq[String] = null
      timed("export+publish") {
        tPin = TextIndex.exportManifest(s, tidx)
        vPin = IvfIndex.exportPin(s, vidx)
        IndexEpoch.publish(s, root, tPin, vPin)
      }
      IndexEpoch.withRegisteredRoot(s, root) {
        def fused() = HybridSearch.rrfTopKAsOf(s, tidx, vidx, probes,
          terms, "vec_id", "embedding", n = 50, k = 10, nProbes = 16,
          tPin, vPin).orderBy("probe_id", "rank")
        timed("fused before")(fused().collect())
        timed("post-pin mutations") {
          TextIndex.deleteDocs(docs.filter(col("doc_id") % 13 === 0)
            .select("doc_id"), "doc_id", tidx)
          TextIndex.appendDocs(
            docs.filter(col("doc_id") % 11 === 0 && col("doc_id") % 13 =!= 0)
              .select(col("doc_id"), concat(col("text"), lit(" vector")).as("text")),
            "doc_id", "text", tidx)
          IvfIndex.deleteFromIndex(emb.filter(col("vec_id") % 13 === 0)
            .select("vec_id"), "vec_id", vidx)
          IvfIndex.appendToIndex(
            emb.filter(col("vec_id") % 11 === 0 && col("vec_id") % 13 =!= 0)
              .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
            "vec_id", "embedding", vidx)
        }
        timed("text compact x2 + vacuum") {
          TextIndex.compactIndex(s, tidx)
          TextIndex.compactIndex(s, tidx)
          TextIndex.vacuumIndex(s, tidx, olderThanMs = 0L)
        }
        timed("ivf rebal+compact+vacuum") {
          IvfIndex.rebalanceIndex(s, vidx, "vec_id", "embedding",
            maxListFactor = 1.25)
          IvfIndex.compactLists(s, vidx, "vec_id")
          IvfIndex.vacuumIndex(s, vidx, olderThanMs = 0L)
        }
        timed("fused after")(fused().collect())
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
