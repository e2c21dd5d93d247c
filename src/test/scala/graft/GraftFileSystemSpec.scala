package graft

import graft.sources.GraftFileSystem
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.net.URI

/** The connector suite the reference runs against a live cluster
  * (`CubeFileSystemTest.java:30-244`), runnable hermetically here:
  * write/read-back round-trips, listStatus counts, rename semantics,
  * mkdirs, delete — all through the registered graft:// scheme, plus
  * the Spark-level parquet round-trip the reference only gets
  * indirectly via the engines that mount it.
  */
class GraftFileSystemSpec extends SparkSuite {
  import spark.implicits._

  private def mountedFs(name: String): (FileSystem, String) = {
    val root = Tables.scratch(s"graftfs_$name")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val conf = new Configuration()
    GraftFileSystem.mount(conf, name, root)
    (FileSystem.get(new URI(s"graft://$name/"), conf), root)
  }

  test("scheme registration resolves through fs.graft.impl") {
    val (fs, _) = mountedFs("reg")
    assert(fs.isInstanceOf[GraftFileSystem])
    assert(fs.getScheme === "graft")
    assert(fs.getUri === new URI("graft://reg"))
    // 128 MiB logical block size drives split sizing, like cfs.block.size
    assert(fs.getDefaultBlockSize(new Path("graft://reg/x")) === (128L << 20))
  }

  test("unmounted volume fails loudly at initialize") {
    val conf = new Configuration()
    conf.set("fs.graft.impl", classOf[GraftFileSystem].getName)
    conf.set("fs.graft.impl.disable.cache", "true")
    intercept[java.io.IOException] {
      FileSystem.get(new URI("graft://nowhere/"), conf)
    }
  }

  test("byte-level write/read-back round-trip (testFileIO analog)") {
    val (fs, _) = mountedFs("io")
    val p = new Path("graft://io/dir/sub/file.bin")
    val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val out = fs.create(p, true)
    out.write(payload); out.close()
    val st = fs.getFileStatus(p)
    assert(st.getLen === payload.length)
    assert(!st.isDirectory)
    assert(st.getPath.toUri.getScheme === "graft")
    val in = fs.open(p)
    val back = new Array[Byte](payload.length)
    in.readFully(0, back); in.close()
    assert(back === payload)
  }

  test("writeUTF/readUTF round-trip with seek (testReadWriter analog)") {
    val (fs, _) = mountedFs("utf")
    val p = new Path("graft://utf/notes.txt")
    val out = fs.create(p, true)
    (0 until 1200).foreach(i => out.writeUTF(s"line_$i;"))
    out.close()
    val in = fs.open(p)
    (0 until 1200).foreach(i => assert(in.readUTF() === s"line_$i;"))
    // seek back to the start and re-read the first record
    in.seek(0)
    assert(in.readUTF() === "line_0;")
    in.close()
  }

  test("mkdirs + listStatus counts track creates and deletes (testFilesForRelativePath analog)") {
    val (fs, _) = mountedFs("ls")
    val dir = new Path("graft://ls/d")
    assert(fs.mkdirs(dir))
    assert(fs.getFileStatus(dir).isDirectory)
    (1 to 10).foreach { i =>
      val o = fs.create(new Path(dir, s"f$i"), true); o.write(i); o.close()
    }
    val statuses = fs.listStatus(dir)
    assert(statuses.length === 10)
    // statuses come back in the graft:// namespace, never the backing store's
    assert(statuses.forall(_.getPath.toUri.getScheme === "graft"))
    assert(statuses.forall(_.getReplication === 3)) // fixed, like the reference
    assert(fs.delete(new Path(dir, "f1"), false))
    assert(fs.delete(new Path(dir, "f2"), false))
    assert(fs.listStatus(dir).length === 8)
    // non-recursive delete of a non-empty dir must refuse
    intercept[java.io.IOException] { fs.delete(dir, false) }
    assert(fs.delete(dir, true))
    assert(!fs.exists(dir))
  }

  test("rename: plain move and move-into-existing-dir (testRename analog)") {
    val (fs, _) = mountedFs("mv")
    val src = new Path("graft://mv/a.txt")
    val o = fs.create(src, true); o.write(7); o.close()
    // plain rename
    assert(fs.rename(src, new Path("graft://mv/b.txt")))
    assert(!fs.exists(src))
    assert(fs.exists(new Path("graft://mv/b.txt")))
    // rename into an existing directory lands as dir/srcName
    // (reference retry semantics, CubefsFileSystem.java:218-245)
    fs.mkdirs(new Path("graft://mv/sub"))
    assert(fs.rename(new Path("graft://mv/b.txt"), new Path("graft://mv/sub")))
    assert(fs.exists(new Path("graft://mv/sub/b.txt")))
  }

  test("Spark parquet write + read-back through graft:// (the engine-level round-trip)") {
    val root = Tables.scratch("graftfs_spark")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    GraftFileSystem.mount(spark.sparkContext.hadoopConfiguration, "vol", root)
    val df = (1 to 500).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    // the write commits through FileOutputCommitter: task-attempt dirs,
    // mkdirs, renames — all through the connector
    df.write.mode("overwrite").parquet("graft://vol/t.parquet")
    val back = spark.read.parquet("graft://vol/t.parquet")
    assert(back.count() === 500)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === (1 to 500).map(_.toLong).sum)
    // scans report graft:// identity to the engine
    val files = back.select(org.apache.spark.sql.functions.input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(_.startsWith("graft://vol/")))
  }

  test("q_fs_connector query runs green end-to-end") {
    val rows = SparkEntry.queries("q_fs_connector")(spark, sf).collect()
    assert(rows.length === 25) // every nation has customers above the bal filter at sf0.001
    assert(rows.forall(_.getAs[Long]("n_cust") > 0))
  }
}
