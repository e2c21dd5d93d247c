package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway instrumentation main (not shipped; deleted after use)
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextIndex
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
    // warm
    val wIdx = Tables.scratch("probe_warm")
    TextIndex.buildIndex(docs.limit(50), "doc_id", "text", wIdx)
    TextIndex.appendDocs(docs.filter(col("doc_id") >= 50).limit(50), "doc_id", "text", wIdx)
    TextIndex.compactIndex(spark, wIdx)
    val idx = Tables.scratch("probe_idx")
    time("append1 (bootstrap build)") {
      TextIndex.appendDocs(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", idx)
    }
    time("append2") {
      TextIndex.appendDocs(docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", idx)
    }
    time("append3") {
      TextIndex.appendDocs(docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", idx)
    }
    val terms = Seq("hash", "merge", "vector")
    time("search pre") {
      TextIndex.searchAll(spark, idx, terms).write.format("noop").mode("overwrite").save()
    }
    time("compact") { TextIndex.compactIndex(spark, idx) }
    time("search post") {
      TextIndex.searchAll(spark, idx, terms).write.format("noop").mode("overwrite").save()
    }
    // observe-listener latency: how long does obs.get block AFTER the
    // write action returned?
    (1 to 3).foreach { i =>
      val obs = org.apache.spark.sql.Observation(s"probe_obs_$i")
      val out = Tables.scratch(s"probe_obs_$i")
      val df = docs.limit(500).select(col("doc_id"), length(col("text")).as("n"))
        .observe(obs, count(lit(1)).as("n"), coalesce(sum("n"), lit(0L)).as("s"))
      time(s"obs write $i") { df.write.mode("overwrite").parquet(out) }
      time(s"obs get $i") { obs.get }
    }
    // how many times does the tokenizer regex appear in the postings plan?
    val tok = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.operators.Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val plan = tok.queryExecution.executedPlan.toString
    println(s"[probe] tokenizer occurrences in plan: ${"split|regexp".r.findAllIn(plan).length}")
    println(plan.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
