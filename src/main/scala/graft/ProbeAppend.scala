package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway timing probe — not part of the engine surface
object ProbeAppend {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.Tables.scratch("wh_probe"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Snapshots, TextIndex}
    val s = spark
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm one full cdc pass
    (0 until 2).foreach { rep =>
      println(s"pass $rep:")
      val docs = graft.Tables(spark, "/root/testdata/sf0.1", "documents")
        .select("doc_id", "text", "lang")
      val root = graft.Tables.scratch(s"p_cdc_tbl$rep")
      val idx = graft.Tables.scratch(s"p_cdc_idx$rep")
      t("snap create") { Snapshots.create(s, root, docs) }
      t("buildIndex v1") { TextIndex.buildIndex(Snapshots.read(s, root), "doc_id", "text", idx) }
      t("commitUpdate") { Snapshots.commitUpdate(s, root, col("doc_id") % 11 === 0,
        Map("text" -> concat(col("text"), lit(" vector")))): Unit }
      t("commitDelete") { Snapshots.commitDelete(s, root, col("doc_id") % 13 === 0): Unit }
      val ch = Snapshots.changes(s, root, 1, 3, "doc_id")
      t("deleteDocs") { TextIndex.deleteDocs(
        ch.filter(col("_change_type").isin("delete", "update_preimage")).select("doc_id"),
        "doc_id", idx) }
      t("compactIndex") { TextIndex.compactIndex(s, idx) }
      t("appendDocs") { TextIndex.appendDocs(
        ch.filter(col("_change_type") === "update_postimage").select("doc_id", "text"),
        "doc_id", "text", idx) }
      t("search+join") {
        TextIndex.searchAll(s, idx, Seq("hash", "merge", "vector"))
          .join(Snapshots.read(s, root).select(col("doc_id"), col("lang")), "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
