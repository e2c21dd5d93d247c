package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor locally by replicating a base SF
  * directory N times with key offsets — the standard way to probe
  * scaling behavior without a generator: each replica offsets every
  * key column by `replica * (max(key)+1)` CONSISTENTLY across fact and
  * dimension tables, so intra-replica join structure (orders→customer,
  * lineitem→orders/part/supplier, events per user) is preserved
  * exactly and all join/agg outputs scale linearly by construction.
  * Anything super-linear in a measured query is then attributable to
  * the ENGINE (a plan that degraded, a shuffle that spilled), not to
  * the data — which is the point of the exercise.
  *
  * Two columns get content perturbation so the workload's similarity
  * structure scales rather than degenerates:
  *  - `documents.text`: replica > 0 rotates vowels/consonant classes
  *    deterministically (per-replica `translate`), so cross-replica
  *    copies are NOT near-duplicates of each other; the dup RATE stays
  *    that of the base corpus instead of every doc gaining 9 clones
  *    (which would inflate LSH candidate pairs ~45× and measure the
  *    synthetic data, not the engine). Char/token counts preserved.
  *  - `embeddings.embedding`: deterministic per-(vec_id, dim) jitter
  *    of ±0.005, so replicas are not exact vector duplicates (brute
  *    force/ANN top-k would otherwise return 10-way ties).
  *
  * region/nation are fixed dimensions (as in TPC-H) and are copied
  * once, unreplicated.
  *
  * Usage: scripts/run.sh graft.ScaleUp <baseDir> <outDir> <factor>
  */
object ScaleUp {

  private def offsetBy(df: DataFrame, col0: String, step: Long, i: Int): DataFrame =
    df.withColumn(col0, col(col0) + lit(step * i))

  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(name: String): DataFrame =
      spark.read.parquet(Tables.path(baseDir, name))
    def keyStep(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // fixed dimensions: copy once
    Seq("region", "nation").foreach { n =>
      raw(n).write.mode(SaveMode.Overwrite).parquet(Tables.path(outDir, n))
    }

    val cust = raw("customer"); val custStep = keyStep(cust, "c_custkey")
    val supp = raw("supplier"); val suppStep = keyStep(supp, "s_suppkey")
    val part = raw("part"); val partStep = keyStep(part, "p_partkey")
    val ords = raw("orders"); val ordStep = keyStep(ords, "o_orderkey")
    val li = raw("lineitem")
    val ev = raw("events"); val evStep = keyStep(ev, "event_id")
    val userStep = keyStep(ev, "user_id")
    val docs = raw("documents"); val docStep = keyStep(docs, "doc_id")
    val emb = raw("embeddings"); val vecStep = keyStep(emb, "vec_id")

    // per-replica deterministic text transform: rotate two disjoint
    // char classes independently (5 × 5 = 25 distinct transforms ≥ any
    // sane factor), preserving string length and token boundaries
    def mutateText(c: org.apache.spark.sql.Column, i: Int) = {
      if (i == 0) c
      else {
        val vowels = "aeiou"; val cons = "stnrh"
        def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
        translate(translate(c, vowels, rot(vowels, i % 5)), cons, rot(cons, (i / 5) % 5))
      }
    }

    def replicate(name: String, one: Int => DataFrame): Unit = {
      val out = Tables.path(outDir, name)
      (0 until factor).foreach { i =>
        val mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append
        one(i).write.mode(mode).parquet(out)
      }
      println(s"[scaleup] $name x$factor -> $out")
    }

    replicate("customer", i => offsetBy(cust, "c_custkey", custStep, i))
    replicate("supplier", i => offsetBy(supp, "s_suppkey", suppStep, i))
    replicate("part", i => offsetBy(part, "p_partkey", partStep, i))
    replicate("orders", i =>
      offsetBy(offsetBy(ords, "o_orderkey", ordStep, i), "o_custkey", custStep, i))
    replicate("lineitem", i =>
      offsetBy(offsetBy(offsetBy(li, "l_orderkey", ordStep, i),
        "l_partkey", partStep, i), "l_suppkey", suppStep, i))
    // ts stays int64 nanos (read under nanosAsLong) — Tables applies
    // the same div-1000 conversion it applies to the base table
    replicate("events", i =>
      offsetBy(offsetBy(ev, "event_id", evStep, i), "user_id", userStep, i))
    replicate("documents", i =>
      offsetBy(docs, "doc_id", docStep, i)
        .withColumn("text", mutateText(col("text"), i)))
    // jitter in [-0.005, 0.005), deterministic in (vec_id, dim).
    // The per-element cast back to FLOAT is load-bearing: the division
    // promotes to double, and an uncast transform would silently
    // publish array<double> embeddings — a replica whose SCHEMA (not
    // just values) differs from the base table it claims to replicate.
    replicate("embeddings", i =>
      offsetBy(emb, "vec_id", vecStep, i)
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            (x + (pmod(hash(col("vec_id"), j, lit(i)), lit(1000)) - 500)
              .cast("float") / 100000.0f).cast("float"))))

    spark.stop()
    sys.exit(0)
  }
}
