package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog: resolves logical table names to parquet paths under a
  * data root and registers them as temp views.
  *
  * Mirrors the reference connector's config-driven mount — a volume root
  * plus path resolution (reference `CubefsFileSystem.java:62-117`,
  * `formatPath` at `154-156`) — re-expressed as Spark's
  * `DataFrameReader` over a directory of parquet tables. No custom I/O
  * layer: Spark's Hadoop-FS substrate is the same API surface the
  * reference plugs into (`fs.<scheme>.impl`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Per-JVM-unique scratch path for sink/index queries — two graft
    * processes (e.g. the test suite and a Verify run) must never race
    * on the same sink directory.
    */
  def scratch(name: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_scratch_${ProcessHandle.current().pid()}", name)
    java.nio.file.Files.createDirectories(p.getParent)
    registerScratchCleanup(p.getParent)
    p.toString
  }

  // delete the per-PID scratch root on JVM exit — repeated Bench/Verify/
  // test runs would otherwise steadily fill /tmp with sink output
  // (q_sink_clustered alone rewrites lineitem). One hook per JVM.
  // Registered through Hadoop's ShutdownHookManager (which Spark's own
  // shutdown hooks also route through, as one hook at priority 30, all
  // hooks run sequentially in descending priority): raw JVM hooks run
  // in parallel with Spark's, so a racing executor flush could
  // re-create files mid-delete and leave stragglers; priority 10 orders
  // the delete strictly after SparkContext stop, one pass is enough.
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def registerScratchCleanup(root: java.nio.file.Path): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable {
          override def run(): Unit =
            try rm(root.toFile) catch { case _: Throwable => () }
        }, 10)
    }

  /** Normalize `events.ts` to µs-precision TimestampType whatever the
    * parquet encoding. The driver has shipped the column two ways
    * across testdata generations:
    *   - TIMESTAMP(NANOS), which Spark's reader rejects; read as a
    *     long (legacy conf) and convert with integer division — nanos
    *     since epoch (~1.7e18) exceed a double's 2^53 mantissa, so
    *     `ts div 1000`, never `/ 1000.0`. DuckDB truncates ns→µs the
    *     same way, keeping the oracle comparable.
    *   - plain timestamp[us] (no tz), which Spark reads as
    *     TIMESTAMP_NTZ; cast to TimestampType — every graft session
    *     pins `spark.sql.session.timeZone=UTC`, so the wall-clock
    *     reinterpretation is the identity on the stored micros and
    *     matches DuckDB's naive read bit-for-bit.
    * Already-TimestampType input passes through untouched.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      // nanos since epoch are ~1.7e18; int64 MICROS (a plausible third
      // encoding the schema alone can't distinguish) would be ~1.7e15.
      // Dividing micros by 1000 silently yields seconds-scale garbage,
      // so refuse any value outside the unambiguous nanos range.
      // DECLARED FLOOR: abs(ts) >= 1e17 means nanos-scale timestamps
      // before ~1973-03 (including epoch 0) are refused too — this
      // loader serves the fixture corpus (1992+); a pre-1973 corpus
      // needs a whole-column heuristic (e.g. max(abs(ts))) instead of
      // this per-row rule.
      case LongType => df.withColumn("ts", expr(
        """timestamp_micros(case
          |  when ts is null then null
          |  when abs(ts) >= 100000000000000000 then ts div 1000
          |  else raise_error(concat('events.ts int64 value ', ts,
          |    ' is not nanos-since-epoch scale; refusing ambiguous conversion'))
          |end)""".stripMargin))
      case TimestampNTZType => df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }

  /** Load one table as a DataFrame (schema from parquet footer);
    * `events.ts` normalized to TimestampType via [[normalizeTs]].
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** Register every table as a temp view so SQL queries can run. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
