package graft.operators

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer intent lease for index maintenance verbs.
  *
  * The TextIndex/IvfIndex maintenance protocols were always documented
  * single-writer ("maintenance writers serialize, per the Snapshots
  * conflict-on-commit contract") — this object makes the contract
  * ENFORCED and LOUD instead of assumed. A verb acquires the intent
  * before its first write and releases it after its commit; a second
  * writer arriving mid-verb fails immediately with a clear message —
  * BEFORE it can corrupt shared state (two appends from the same base
  * state overwrite each other's sidecar generation; a compaction's
  * dynamic-overwrite rewrite silently drops a racing append's rows; a
  * compaction's marker hygiene strands a racing append's reservation).
  *
  * Mechanics (the reference's own rename/create-as-commit semantics,
  * `CubefsFileSystem.java:218-245`, applied to a lock file):
  *
  *   - ACQUIRE: `create(_maint_intent, overwrite=false)` — atomic
  *     fail-if-exists on HDFS-like stores; the file body is
  *     `<holder token (a UUID)>\n<acquisition epoch millis>`, so both
  *     ownership and age are checkable from the BODY (mtime is only
  *     the fallback — object stores and coarse-mtime filesystems
  *     round it, and a second-granularity mtime can make a
  *     freshly-stolen marker look expired to a third acquirer within
  *     the same second).
  *   - LEASE + HEARTBEAT: a marker older than
  *     `graft.index.writerLeaseMs` (default 15 min) is presumed
  *     crashed and STOLEN. [[withLock]] re-stamps the body timestamp
  *     every `graft.index.writerHeartbeatMs` (default lease/3) from a
  *     daemon thread, so a LIVE verb of any duration — a large
  *     compaction or rebalance easily outruns a fixed lease — never
  *     looks expired; only a genuinely dead holder's marker ages out.
  *     Liveness without a coordinator — the Delta/Iceberg-style
  *     answer to a dead writer's lock.
  *   - STEAL: read the expired marker's token FIRST, then delete only
  *     if a re-read still shows THAT token — a fresh marker a new
  *     holder created after the expired one released is never evicted
  *     (the naive age-check → delete → create is check-then-act).
  *   - ZOMBIE SAFETY: a stolen writer that is somehow still alive (a
  *     JVM paused past the full lease despite heartbeats) cannot
  *     corrupt the index: TextIndex manifest commits are CAS'd against
  *     the manifest number their state was read from
  *     ([[Snapshots.writeManifestLines]] `expectedNext`), IVF
  *     rebalance commits CAS the `_cgen_` marker, and IVF compaction
  *     re-asserts ownership ([[assertHeld]]) immediately before its
  *     destructive tail (the dynamic-overwrite rewrite, the retired-
  *     list purge, the tombstone clear, the seq-marker hygiene) and
  *     aborts if the token is no longer its own.
  *   - RELEASE: delete ONLY if the body still holds our token — a
  *     zombie's release must not evict the stealer.
  *
  * Cost: two driver FS metadata ops per maintenance verb plus one
  * marker rewrite per heartbeat interval — noise next to any index
  * write.
  */
private[graft] object MaintenanceLock {

  private val MarkerName = "_maint_intent"

  private def leaseMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.index.writerLeaseMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)

  private def heartbeatMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.index.writerHeartbeatMs")
      .map(_.toLong).getOrElse(math.max(1000L, leaseMs(spark) / 3))

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private[graft] def markerPath(path: String) = new Path(path, MarkerName)

  /** (token, body acquisition/heartbeat timestamp) parsed from the
    * marker body; None when the marker is unreadable (vanished, or a
    * pre-timestamp body is treated as token-only).
    */
  private def readBody(fs: org.apache.hadoop.fs.FileSystem,
      marker: Path): Option[(String, Option[Long])] =
    try {
      val in = fs.open(marker)
      val body = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
      val lines = body.split("\n", 2)
      Some((lines(0),
        lines.drop(1).headOption.flatMap(s =>
          scala.util.Try(s.trim.toLong).toOption)))
    } catch { case _: java.io.IOException => None }

  private def writeBody(fs: org.apache.hadoop.fs.FileSystem, marker: Path,
      token: String, createOnly: Boolean): Boolean = {
    val body = s"$token\n${System.currentTimeMillis()}"
      .getBytes(StandardCharsets.UTF_8)
    val uri = marker.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      // local scheme: Hadoop's create(overwrite=false) is
      // exists-then-create (TOCTOU); java's createNewFile is a real
      // O_CREAT|O_EXCL — atomic even under thread races. Heartbeats
      // truncate-in-place (the file never disappears, so a racing
      // acquirer's createNewFile still fails mid-rewrite).
      val f = new java.io.File(uri.getPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      try {
        if (createOnly && !f.createNewFile()) false
        else { java.nio.file.Files.write(f.toPath, body); true }
      } catch { case _: java.io.IOException => false }
    } else
      try {
        val out = fs.create(marker, !createOnly) // atomic fail-if-exists on HDFS
        try out.write(body) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  /** Acquire the writer intent for the index at `path`; returns the
    * holder token to pass to [[release]]. Throws IllegalStateException
    * if another writer holds a live (un-expired) intent.
    */
  def acquire(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val marker = markerPath(path)
    val token = java.util.UUID.randomUUID.toString
    if (writeBody(fs, marker, token, createOnly = true)) return token
    // held — steal only past the lease age (presumed-dead holder).
    // Age comes from the BODY timestamp the holder's heartbeats
    // re-stamp; mtime is the fallback for pre-timestamp markers only.
    val held = readBody(fs, marker)
    val now = System.currentTimeMillis()
    val age = held match {
      case Some((_, Some(ts))) => now - ts
      case Some((_, None)) =>
        try now - fs.getFileStatus(marker).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      case None => Long.MaxValue // vanished: retry the create below
    }
    if (age > leaseMs(spark)) {
      // conditional evict: delete ONLY if the marker still carries the
      // token we observed expired — a new holder's fresh marker
      // (created after the expired one released) must not be evicted
      // by this check-then-act window
      val stillExpiredToken = held match {
        case Some((t, _)) => readBody(fs, marker).forall(_._1 == t)
        case None => true // vanished both times: nothing to evict
      }
      if (stillExpiredToken)
        try fs.delete(marker, false) catch { case _: java.io.IOException => () }
      if (writeBody(fs, marker, token, createOnly = true)) return token
    }
    throw new IllegalStateException(
      s"concurrent index maintenance on $path: writer intent " +
        s"$marker is held (age ${math.min(age, Long.MaxValue)} ms, lease " +
        s"${leaseMs(spark)} ms) — maintenance verbs are single-writer; " +
        "retry after the holder commits, or raise " +
        "graft.index.writerLeaseMs stealing if the holder crashed")
  }

  /** Does the marker body still carry `token`? False once a stealer
    * replaced it (or the marker vanished).
    */
  def isHeld(spark: SparkSession, path: String, token: String): Boolean =
    readBody(fsOf(spark, path), markerPath(path)).exists(_._1 == token)

  /** Abort loudly if the intent is no longer ours — called by verbs
    * immediately before a destructive, non-CAS'd step (e.g. IVF
    * compaction's dynamic-overwrite rewrite and its tombstone/marker
    * hygiene tail), so a stolen-but-alive writer dies BEFORE it can
    * drop a successor's rows.
    */
  def assertHeld(spark: SparkSession, path: String, token: String): Unit =
    if (!isHeld(spark, path, token))
      throw new IllegalStateException(
        s"index maintenance on $path lost its writer intent (lease " +
          "stolen — this writer was presumed dead); aborting before " +
          "any destructive step. Re-run the verb.")

  /** Re-stamp the marker's body timestamp if we still own it. Returns
    * false (and stamps nothing) once the lease was stolen.
    */
  def heartbeat(spark: SparkSession, path: String, token: String): Boolean = {
    val fs = fsOf(spark, path)
    val marker = markerPath(path)
    if (!isHeld(spark, path, token)) false
    else writeBody(fs, marker, token, createOnly = false)
  }

  /** Release the intent if we still own it (a stolen marker belongs to
    * the stealer and is left alone).
    */
  def release(spark: SparkSession, path: String, token: String): Unit = {
    val fs = fsOf(spark, path)
    if (isHeld(spark, path, token))
      try fs.delete(markerPath(path), false) catch {
        case _: java.io.IOException => ()
      }
  }

  /** Run `f` holding the intent for `path`, heartbeating from a daemon
    * thread so a long verb never ages out of its own lease.
    */
  def withLock[T](spark: SparkSession, path: String)(f: => T): T =
    withLockToken(spark, path)(_ => f)

  /** [[withLock]] that hands the verb its token, for [[assertHeld]]
    * re-checks before destructive steps.
    */
  def withLockToken[T](spark: SparkSession, path: String)(f: String => T): T = {
    val token = acquire(spark, path)
    val hb = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, s"graft-maint-heartbeat-$token")
        t.setDaemon(true)
        t
      })
    val period = heartbeatMs(spark)
    hb.scheduleWithFixedDelay(
      () => try heartbeat(spark, path, token) catch { case _: Throwable => () },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try f(token)
    finally {
      hb.shutdownNow()
      release(spark, path, token)
    }
  }
}
