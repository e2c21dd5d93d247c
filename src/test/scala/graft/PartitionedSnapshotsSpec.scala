package graft

import graft.operators.PartitionedSnapshots
import org.apache.spark.sql.functions._

class PartitionedSnapshotsSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(name: String): String = Tables.scratch(name)

  test("create + read round-trips a partitioned table") {
    val root = freshRoot("psnap_basic")
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("k", "p", "v")
    assert(PartitionedSnapshots.create(spark, root, df, "p") === 1)
    assert(PartitionedSnapshots.versions(spark, root) === Seq(1))
    assert(PartitionedSnapshots.mapping(spark, root) === Map("__p=a" -> 1, "__p=b" -> 1))
    assert(PartitionedSnapshots.read(spark, root).orderBy("k")
      .select("k", "p", "v").as[(Long, String, Int)].collect()
      === Array((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)))
  }

  test("readPartitions resolves only matching partitions' files from the manifest") {
    val root = freshRoot("psnap_pruned")
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "c", 40))
      .toDF("k", "p", "v")
    PartitionedSnapshots.create(spark, root, df, "p")
    val pruned = PartitionedSnapshots.readPartitions(spark, root, _ == "b")
    assert(pruned.select("k", "v").as[(Long, Int)].collect().toSeq === Seq((3L, 30)))
    // the PLAN touches only partition b's files — metadata pruning,
    // not a post-scan filter
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.forall(_.contains("__p=b")))
    assert(pruned.inputFiles.length <
      PartitionedSnapshots.read(spark, root).inputFiles.length)
    // hive-escaped values decode before the predicate sees them
    val esc = Seq((1L, "x y/z", 1)).toDF("k", "p", "v")
    val root2 = freshRoot("psnap_pruned_esc")
    PartitionedSnapshots.create(spark, root2, esc, "p")
    assert(PartitionedSnapshots.readPartitions(spark, root2, _ == "x y/z")
      .count() === 1)
    // a literal '+' survives: hive escaping never encodes '+', so a
    // URL-style decode (which turns '+' into a space) would make this
    // partition unselectable
    val plus = Seq((1L, "a+b", 1)).toDF("k", "p", "v")
    val root3 = freshRoot("psnap_pruned_plus")
    PartitionedSnapshots.create(spark, root3, plus, "p")
    assert(PartitionedSnapshots.readPartitions(spark, root3, _ == "a+b")
      .count() === 1)
    // round-15 contract: a predicate matching no partition returns an
    // EMPTY TYPED frame (SQL semantics) via the create-time schema
    // sidecar — not an error
    val none = PartitionedSnapshots.readPartitions(spark, root, _ == "nope")
    assert(none.count() === 0L)
    assert(none.columns.toSeq === PartitionedSnapshots.read(spark, root).columns.toSeq)
    // and an EMPTY create stays readable end-to-end (zero partition
    // dirs — the schema sidecar is the only source of truth)
    val root4 = freshRoot("psnap_empty_create")
    PartitionedSnapshots.create(spark, root4,
      esc.limit(0), "p")
    assert(PartitionedSnapshots.read(spark, root4).count() === 0L)
    assert(PartitionedSnapshots.read(spark, root4).columns.toSeq ===
      Seq("k", "p", "v"))
  }

  test("commitMerge rewrites only touched partitions; untouched files byte-identical") {
    val root = freshRoot("psnap_sharded")
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "c", 40))
      .toDF("k", "p", "v")
    PartitionedSnapshots.create(spark, root, df, "p")
    val bBefore = PartitionedSnapshots.fileIdentity(spark, root, Some(1), Some("__p=b"))
    val cBefore = PartitionedSnapshots.fileIdentity(spark, root, Some(1), Some("__p=c"))
    // touch only partition a: one update + one insert
    val v2 = PartitionedSnapshots.commitMerge(spark, root,
      Seq((2L, "a", 99), (5L, "a", 50)).toDF("k", "p", "v"), "k", "p")
    assert(v2 === 2)
    // untouched partitions: same paths, same lengths, same mtimes
    assert(PartitionedSnapshots.fileIdentity(spark, root, Some(2), Some("__p=b")) === bBefore)
    assert(PartitionedSnapshots.fileIdentity(spark, root, Some(2), Some("__p=c")) === cBefore)
    // manifest: a bumped to v2, b/c carried at v1
    assert(PartitionedSnapshots.mapping(spark, root)
      === Map("__p=a" -> 2, "__p=b" -> 1, "__p=c" -> 1))
    // merged content
    assert(PartitionedSnapshots.read(spark, root).orderBy("k")
      .select("k", "v").as[(Long, Int)].collect()
      === Array((1L, 10), (2L, 99), (3L, 30), (4L, 40), (5L, 50)))
    // time travel: v1 is intact
    assert(PartitionedSnapshots.read(spark, root, Some(1)).orderBy("k")
      .select("k", "v").as[(Long, Int)].collect()
      === Array((1L, 10), (2L, 20), (3L, 30), (4L, 40)))
  }

  test("updates can open a brand-new partition") {
    val root = freshRoot("psnap_newpart")
    PartitionedSnapshots.create(spark, root,
      Seq((1L, "a", 10)).toDF("k", "p", "v"), "p")
    PartitionedSnapshots.commitMerge(spark, root,
      Seq((2L, "z", 20)).toDF("k", "p", "v"), "k", "p")
    assert(PartitionedSnapshots.mapping(spark, root)
      === Map("__p=a" -> 1, "__p=z" -> 2))
    assert(PartitionedSnapshots.read(spark, root).count() === 2)
    // v1 doesn't know partition z
    assert(PartitionedSnapshots.read(spark, root, Some(1)).count() === 1)
  }

  test("chained commits: every version resolves its own partition mapping") {
    val root = freshRoot("psnap_chain")
    PartitionedSnapshots.create(spark, root,
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "p", "v"), "p")
    PartitionedSnapshots.commitMerge(spark, root,
      Seq((1L, "a", 2)).toDF("k", "p", "v"), "k", "p")
    PartitionedSnapshots.commitMerge(spark, root,
      Seq((2L, "b", 3)).toDF("k", "p", "v"), "k", "p")
    assert(PartitionedSnapshots.versions(spark, root) === Seq(1, 2, 3))
    def vals(ver: Int) = PartitionedSnapshots.read(spark, root, Some(ver))
      .orderBy("k").select("v").as[Int].collect().toSeq
    assert(vals(1) === Seq(1, 1))
    assert(vals(2) === Seq(2, 1))
    assert(vals(3) === Seq(2, 3))
    assert(PartitionedSnapshots.mapping(spark, root, Some(3))
      === Map("__p=a" -> 2, "__p=b" -> 3))
  }

  test("q_table_partitioned_merge runs green with all invariant booleans true") {
    val rows = SparkEntry.queries("q_table_partitioned_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.map(r => r.getAs[String]("o_orderstatus") ->
      r.getAs[Boolean]("files_unchanged")).toMap
    assert(byStatus("F") === false) // touched partition was rewritten
    assert(byStatus.filter(_._1 != "F").values.forall(_ == true))
    assert(rows.forall(_.getAs[Boolean]("v1_intact")))
  }

  test("schema sidecar is refreshed on every commit; empty reads agree with non-empty reads") {
    // round-15 advice: a create-time-only sidecar hands empty reads a
    // schema that can disagree with later commits'. The sidecar is now
    // rewritten on every commitMerge (one driver file write) — assert
    // it tracks the latest commit, and that an empty partition-filter
    // read's schema equals a non-empty read's after commits.
    val root = freshRoot("psnap_sidecar")
    val df = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "p", "v")
    PartitionedSnapshots.create(spark, root, df, "p")
    val sidecar = new java.io.File(s"$root/_schema.json")
    assert(sidecar.exists())
    val m0 = sidecar.lastModified()
    Thread.sleep(5)
    PartitionedSnapshots.commitMerge(spark, root,
      Seq((3L, "a", 30)).toDF("k", "p", "v"), "k", "p")
    assert(sidecar.lastModified() >= m0, "sidecar not rewritten on commit")
    val empty = PartitionedSnapshots.readPartitions(spark, root, _ == "zzz")
    assert(empty.count() === 0L)
    assert(empty.schema === PartitionedSnapshots.read(spark, root).schema,
      "empty read's schema disagrees with a non-empty read")
  }
}
