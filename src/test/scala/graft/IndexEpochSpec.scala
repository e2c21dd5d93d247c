package graft

import graft.operators.{IndexEpoch, IvfIndex, TextIndex}
import org.apache.spark.sql.functions._

/** Two-index transactional epoch: pinned reads don't move under
  * post-pin maintenance, the flip is CAS'd, and a crash between index
  * commits leaves the epoch (and therefore every epoch reader) at the
  * previous consistent pair.
  */
class IndexEpochSpec extends SparkSuite {
  import spark.implicits._

  test("pinned reads are frozen: appends and deletes after the pin are invisible, including same-seq deletes") {
    val docs = Seq((1L, "alpha vector"), (2L, "beta vector"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("doc_id", "embedding")
    val tidx = Tables.scratch("epoch_spec_tidx")
    val vidx = Tables.scratch("epoch_spec_vidx")
    TextIndex.buildIndex(docs, "doc_id", "text", tidx)
    IvfIndex.buildIndex(emb, "doc_id", "embedding", nCentroids = 2, path = vidx)
    val tPin = TextIndex.exportManifest(spark, tidx)
    val vPin = IvfIndex.exportPin(spark, vidx)
    // post-pin maintenance: doc 2 deleted (a SAME-SEQ tombstone — the
    // case file-list pinning exists for), doc 4 appended
    TextIndex.deleteDocs(Seq(2L).toDF("doc_id"), "doc_id", tidx)
    TextIndex.appendDocs(Seq((4L, "delta vector")).toDF("doc_id", "text"),
      "doc_id", "text", tidx)
    IvfIndex.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", vidx)
    IvfIndex.appendToIndex(Seq((4L, Array(0.5f, 0.5f))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", vidx)
    // pinned text read: docs 1 AND 2 serve (the post-pin delete does
    // not reach back), doc 4 invisible
    val pinnedDocs = TextIndex.searchAllAsOf(spark, tidx, Seq("vector"), tPin)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(pinnedDocs === Seq(1L, 2L),
      s"pinned text read moved under post-pin maintenance: $pinnedDocs")
    // live read sees the mutation
    val liveDocs = TextIndex.searchAll(spark, tidx, Seq("vector"))
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(liveDocs === Seq(1L, 4L), s"$liveDocs")
    // pinned vector read: rows 1,2,3 — post-pin delete and append both
    // invisible
    val pinnedIds = IvfIndex.loadLiveAsOf(spark, vidx, "doc_id", vPin)._1
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pinnedIds === Seq(1L, 2L, 3L),
      s"pinned vector read moved under post-pin maintenance: $pinnedIds")
    val liveIds = IvfIndex.loadLive(spark, vidx, "doc_id")._1
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(liveIds === Seq(1L, 3L, 4L), s"$liveIds")
  }

  test("epoch flip is one CAS: a stale publisher loses; the crash window leaves the previous epoch served") {
    val root = Tables.scratch("epoch_spec_cas")
    assert(IndexEpoch.current(spark, root).isEmpty)
    val e1 = IndexEpoch.publish(spark, root, Seq("fmt=5", "seq=0"), Seq("seq=0"))
    assert(e1 === 1)
    // crash window: index commits may be durable, but until the next
    // publish lands every reader resolves epoch 1 — the previous
    // consistent pair
    assert(IndexEpoch.current(spark, root)
      .contains((1, Seq("fmt=5", "seq=0"), Seq("seq=0"))))
    val e2 = IndexEpoch.publish(spark, root, Seq("fmt=5", "seq=2"), Seq("seq=1"))
    assert(e2 === 2)
    // a publisher that derived its state from epoch 1 (stale) must
    // lose the CAS, not silently overwrite epoch 2
    val thrown = intercept[java.io.IOException] {
      graft.operators.Snapshots.writeManifestLines(spark, root,
        Seq("t:stale"), sweep = false, expectedNext = Some(2))
    }
    assert(thrown.getMessage.contains("conflict"))
    // the winner's epoch is intact
    assert(IndexEpoch.current(spark, root)
      .contains((2, Seq("fmt=5", "seq=2"), Seq("seq=1"))))
  }
}
