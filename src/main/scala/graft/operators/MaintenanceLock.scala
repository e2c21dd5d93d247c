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
  *     fail-if-exists on HDFS-like stores; the file body is the
  *     holder's token (a UUID), so ownership is checkable.
  *   - LEASE: a marker older than `graft.index.writerLeaseMs`
  *     (default 15 min) is presumed crashed and STOLEN (delete +
  *     re-create). Liveness without a coordinator — the
  *     Delta/Iceberg-style answer to a dead writer's lock. A stolen
  *     writer that is actually alive (a zombie) cannot corrupt the
  *     index: its manifest commit is CAS'd against the manifest
  *     number its state was read from ([[Snapshots.writeManifestLines]]
  *     `expectedNext`) and fails loudly once the stealer commits.
  *   - RELEASE: delete ONLY if the body still holds our token — a
  *     zombie's release must not evict the stealer.
  *
  * Cost: two driver FS metadata ops per maintenance verb — noise next
  * to any index write.
  */
private[graft] object MaintenanceLock {

  private val MarkerName = "_maint_intent"

  private def leaseMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.index.writerLeaseMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private[graft] def markerPath(path: String) = new Path(path, MarkerName)

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
    def tryCreate(): Boolean = {
      val uri = marker.toUri
      if (uri.getScheme == null || uri.getScheme == "file") {
        // local scheme: Hadoop's create(overwrite=false) is
        // exists-then-create (TOCTOU); java's createNewFile is a real
        // O_CREAT|O_EXCL — atomic even under thread races
        val f = new java.io.File(uri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        try {
          if (!f.createNewFile()) false
          else {
            java.nio.file.Files.write(f.toPath,
              token.getBytes(StandardCharsets.UTF_8))
            true
          }
        } catch { case _: java.io.IOException => false }
      } else
        try {
          val out = fs.create(marker, false) // atomic fail-if-exists on HDFS
          try out.write(token.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }
    if (tryCreate()) return token
    // held — steal only past the lease age (presumed-dead holder)
    val age = try {
      System.currentTimeMillis() - fs.getFileStatus(marker).getModificationTime
    } catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    if (age > leaseMs(spark)) {
      try fs.delete(marker, false) catch { case _: java.io.IOException => () }
      if (tryCreate()) return token
    }
    throw new IllegalStateException(
      s"concurrent index maintenance on $path: writer intent " +
        s"$marker is held (age ${math.min(age, Long.MaxValue)} ms, lease " +
        s"${leaseMs(spark)} ms) — maintenance verbs are single-writer; " +
        "retry after the holder commits, or raise " +
        "graft.index.writerLeaseMs stealing if the holder crashed")
  }

  /** Release the intent if we still own it (a stolen marker belongs to
    * the stealer and is left alone).
    */
  def release(spark: SparkSession, path: String, token: String): Unit = {
    val fs = fsOf(spark, path)
    val marker = markerPath(path)
    val mine = try {
      val in = fs.open(marker)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8) == token
      finally in.close()
    } catch { case _: java.io.IOException => false }
    if (mine) try fs.delete(marker, false) catch {
      case _: java.io.IOException => ()
    }
  }

  /** Run `f` holding the intent for `path`. */
  def withLock[T](spark: SparkSession, path: String)(f: => T): T = {
    val token = acquire(spark, path)
    try f finally release(spark, path, token)
  }
}
