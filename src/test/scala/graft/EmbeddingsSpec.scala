package graft

import graft.operators.{Embeddings, SimilaritySearch}
import org.apache.spark.sql.functions._

/** In-engine PCA: recovers a planted dominant direction, components
  * are orthonormal with ordered explained variance, projections are
  * centered, and the moment pass is partitioning-invariant (the
  * exact-integer GramAgg contract).
  */
class EmbeddingsSpec extends SparkSuite {
  import spark.implicits._

  private def planted(n: Int, d: Int): Seq[(Long, Array[Float])] = {
    // variance concentrated on axis 0 (amplitude 1.0), a weaker signal
    // on axis 1 (0.3), tiny deterministic noise elsewhere — the top-2
    // eigenvectors are ±e0 and ±e1 up to noise
    (0L until n.toLong).map { i =>
      val v = new Array[Float](d)
      v(0) = (if (i % 2 == 0) 1.0f else -1.0f) * (1.0f + (i % 7) * 0.01f)
      v(1) = (if (i % 3 == 0) 0.3f else -0.3f)
      var j = 2
      while (j < d) { v(j) = ((i * 31 + j * 7) % 11 - 5) * 0.001f; j += 1 }
      (i, v)
    }
  }

  test("planted dominant directions are recovered; components orthonormal; evr ordered; projections centered") {
    val emb = planted(240, 16).toDF("vec_id", "embedding")
    val out = Embeddings.pcaProject(emb, "vec_id", "embedding", k = 2, iters = 30)
      .collect()
    assert(out.length === 240)
    val l1 = out.head.getAs[Double]("lambda1")
    val l2 = out.head.getAs[Double]("lambda2")
    val e1 = out.head.getAs[Double]("evr1")
    val e2 = out.head.getAs[Double]("evr2")
    assert(l1 > l2 && l2 > 0, s"eigenvalues not ordered: $l1, $l2")
    assert(e1 > e2 && e1 > 0.5, s"dominant axis should explain >50%: $e1")
    assert(e1 <= 1.0 + 1e-9 && e2 >= 0.0)
    // pc1 must separate the two planted sign groups on axis 0: the
    // projection carries essentially the axis-0 coordinate
    val bySign = out.groupBy(_.getAs[Long]("vec_id") % 2 == 0)
      .view.mapValues(_.map(_.getAs[Double]("pc1")).sum).toMap
    assert(math.signum(bySign(true)) != math.signum(bySign(false)),
      s"pc1 does not separate the planted groups: $bySign")
    // projections are centered: each component's mean is ~0
    Seq("pc1", "pc2").foreach { c =>
      val meanProj = out.map(_.getAs[Double](c)).sum / out.length
      assert(math.abs(meanProj) < 1e-6, s"$c not centered: $meanProj")
    }
  }

  test("moment pass is partitioning-invariant: 1-partition and 13-partition runs agree bit for bit") {
    val emb = planted(150, 8).toDF("vec_id", "embedding")
    def run(parts: Int) =
      Embeddings.pcaProject(emb.repartition(parts), "vec_id", "embedding",
          k = 2, iters = 20)
        .orderBy("vec_id").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pc1"),
          r.getAs[Double]("pc2"), r.getAs[Double]("lambda1")))
    // EXACT equality — the integer Gram triangle commutes, so the
    // covariance (and hence every downstream double) is identical
    assert(run(1).toSeq === run(13).toSeq,
      "PCA diverged across partitionings — the exact-moment contract broke")
  }

  test("streamed moment fold is bit-identical to the one-shot pass; batch split points don't matter") {
    val emb = planted(200, 12).toDF("vec_id", "embedding").localCheckpoint()
    val oneShot = Embeddings.moments(emb, "vec_id", "embedding")
    // two different batch partitionings of the same corpus — both folds
    // must equal the one-shot buffer EXACTLY (long sums commute)
    val f3 = Seq(0L, 1L, 2L).map { r =>
      Embeddings.moments(emb.filter(col("vec_id") % 3 === r),
        "vec_id", "embedding")
    }.foldLeft(Array.empty[Long])(Embeddings.mergeMoments)
    val f5 = Seq(0L, 1L, 2L, 3L, 4L).map { r =>
      Embeddings.moments(emb.filter(col("vec_id") % 5 === r),
        "vec_id", "embedding")
    }.foldLeft(Array.empty[Long])(Embeddings.mergeMoments)
    assert(f3.sameElements(oneShot) && f5.sameElements(oneShot),
      "incremental moment folds diverged from the one-shot pass")
    // and the projections computed from the folded buffer are the
    // batch answer verbatim
    val a = Embeddings.pcaProject(emb, "vec_id", "embedding", k = 2, iters = 20)
      .orderBy("vec_id").collect().map(_.getAs[Double]("pc1")).toSeq
    val b = Embeddings.pcaProjectFromMoments(emb, "vec_id", "embedding",
        f5, k = 2, iters = 20)
      .orderBy("vec_id").collect().map(_.getAs[Double]("pc1")).toSeq
    assert(a === b)
  }

  test("blocked exact near-dup equals the brute-force threshold join — completeness under adversarial cell-boundary pairs") {
    val rnd = new scala.util.Random(53)
    val organic = (0L until 300L).map(i =>
      (i, Array.fill(24)(rnd.nextFloat() - 0.5f)))
    // planted near-dups: jittered clones (some pairs will straddle grid
    // cell boundaries — the completeness theorem must carry them)
    val clones = organic.filter(_._1 % 9 == 0).map { case (i, v) =>
      (1000L + i, v.map(x => x + (if (i % 2 == 0) 1e-3f else -1e-3f)))
    }
    val emb = (organic ++ clones).toDF("vec_id", "embedding").localCheckpoint()
    val got = Embeddings.exactNearDupsBlocked(emb, "vec_id", "embedding", 0.95)
      .collect()
    // brute force over the SAME corpus via the broadcast exact machinery
    val n = emb.count().toInt
    val brute = SimilaritySearch.bruteForceTopK(emb, emb, "vec_id", "embedding",
        k = n - 1)
      .filter(col("cos") >= 0.95)
      .select(least(col("probe_id"), col("neighbor_id")).as("a"),
        greatest(col("probe_id"), col("neighbor_id")).as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val gotPairs = got.map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b")))
      .sorted.toSeq
    assert(gotPairs === brute,
      s"blocked dedup diverged from brute force: got ${gotPairs.size}, want ${brute.size}")
    // every planted clone pair surfaced
    clones.foreach { case (cid, _) =>
      assert(gotPairs.contains((cid - 1000L, cid)), s"planted pair for $cid missed")
    }
    assert(got.forall(_.getAs[Boolean]("blocking_effective")))
  }

  test("empty corpus short-circuits to an empty typed frame with the NON-EMPTY path's column order") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Embeddings.pcaProject(empty, "vec_id", "embedding", k = 2)
    assert(out.isEmpty)
    // same order as a populated run: all pc columns, then lambda/evr
    // pairs — positional consumers and unions across the two paths
    val populated = Embeddings.pcaProject(
      planted(10, 4).toDF("vec_id", "embedding"), "vec_id", "embedding", k = 2)
    assert(out.columns.toSeq === populated.columns.toSeq)
    assert(out.columns.toSeq === Seq("vec_id", "pc1", "pc2",
      "lambda1", "evr1", "lambda2", "evr2"))
    // blocked near-dup's empty short-circuit keeps its full schema too
    val blockedEmpty = Embeddings.exactNearDupsBlocked(
      empty, "vec_id", "embedding", 0.95)
    assert(blockedEmpty.isEmpty)
    assert(blockedEmpty.columns.toSeq === Seq("vid_a", "vid_b", "cos",
      "blocking_effective", "blocking_advised", "grid_pcs"))
  }

  /** `nFam` families of `perFam` near-identical unit vectors, every
    * family pointing (mostly) the same way: pairwise cosine within a
    * family ≈ 1, across families ≤ ~0.94 (sparse two-coordinate noise
    * directions with overlap ≤ 0.5) — yet all PCA projections
    * CONCENTRATE (the common direction centers out; what remains is
    * ε-scaled), so the grid degenerates by construction: the planted
    * isotropic fixture of the r17 verdict.
    */
  private def isotropicFamilies(nFam: Int, perFam: Int, d: Int)
      : Seq[(Long, Array[Float])] = {
    val eps = 0.35f
    val base = math.sqrt(1.0 - eps * eps).toFloat
    val combos = (for { a <- 1 until d; b <- a + 1 until d } yield (a, b))
    require(combos.length >= nFam, s"need d with C(d-1,2) >= $nFam")
    (0 until nFam).flatMap { f =>
      val (ca, cb) = combos(f)
      (0 until perFam).map { j =>
        val v = new Array[Float](d)
        v(0) = base
        val w = (eps / math.sqrt(2.0)).toFloat
        v(ca) = w; v(cb) = w
        // tiny intra-family jitter keeps clones distinct but ≥ 0.999 cos
        v(if (j % 2 == 0) ca else cb) += (j - 1) * 1e-3f
        (f.toLong * 10L + j, v)
      }
    }
  }

  test("isotropy guard: a grid-degenerate corpus is flagged BEFORE the join (blocking_advised=false) and the result stays exact") {
    val emb = isotropicFamilies(nFam = 120, perFam = 3, d = 64)
      .toDF("vec_id", "embedding").localCheckpoint()
    // pin the advisory cap low enough for a spec-sized corpus: 360
    // points in a handful of cells → Σcell² far above 2000
    spark.conf.set("graft.blocked.dedup.cap", "2000")
    try {
      val got = Embeddings.exactNearDupsBlocked(emb, "vec_id", "embedding", 0.95)
        .collect()
      assert(got.nonEmpty)
      assert(got.forall(!_.getAs[Boolean]("blocking_advised")),
        "a degenerate grid must be flagged inadvisable")
      // escalation must NOT fire: the tail eigenvalues are ε-scaled
      // (√λ ≪ r/2), so a finer grid would only pay the 3^k fan-out
      assert(got.forall(_.getAs[Int]("grid_pcs") === 3))
      // exactness holds regardless: exactly the within-family pairs
      val gotPairs = got.map(r =>
        (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b"))).sorted.toSeq
      val want = (0 until 120).flatMap { f =>
        val ids = (0 until 3).map(j => f.toLong * 10L + j)
        for { i <- ids.indices; j <- i + 1 until ids.length }
          yield (ids(i), ids(j))
      }.sorted
      assert(gotPairs === want,
        s"guarded run lost exactness: got ${gotPairs.size}, want ${want.size}")
    } finally spark.conf.unset("graft.blocked.dedup.cap")
  }

  test("escalation: when the tail axes discriminate, the grid widens to 6 PCs and stays exact") {
    // unit-normalized lattice points spread over SIX axes (6 levels
    // each): any 3-PC grid leaves Σcell² over the cap (the remaining
    // axes fold ~5 cells each into every grid cell), but axes 4..6
    // carry the same large spread (√λ > r/2) and resolve >27× more
    // cells — exactly the regime where the 3^k fan-out pays, so the
    // guard escalates instead of just flagging
    val levels = Array(-2.5f, -1.5f, -0.5f, 0.5f, 1.5f, 2.5f)
    val rnd = new scala.util.Random(71)
    val pts = (0L until 1500L).map { i =>
      val v = new Array[Float](8)
      val h = i * 2654435761L
      (0 until 6).foreach { ax =>
        v(ax) = levels(((h >>> (ax * 7)) % 6).toInt.abs)
      }
      v(6) = (rnd.nextFloat() - 0.5f) * 0.01f
      v(7) = (rnd.nextFloat() - 0.5f) * 0.01f
      (i, v)
    }
    // plant clone pairs so the output is non-empty and checkable
    val clones = pts.filter(_._1 % 30 == 0).map { case (i, v) =>
      (10000L + i, v.map(_ + 1e-4f))
    }
    val emb = (pts ++ clones).toDF("vec_id", "embedding").localCheckpoint()
    spark.conf.set("graft.blocked.dedup.cap", "10000")
    try {
      val got = Embeddings.exactNearDupsBlocked(emb, "vec_id", "embedding", 0.95)
        .collect()
      assert(got.forall(_.getAs[Int]("grid_pcs") === 6),
        "spread tail axes should have escalated the grid")
      val gotPairs = got.map(r =>
        (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b"))).toSet
      clones.foreach { case (cid, _) =>
        assert(gotPairs.contains((cid - 10000L, cid)),
          s"planted pair for $cid missed after escalation")
      }
      // exactness cross-check against brute force over the same corpus
      val n = emb.count().toInt
      val brute = SimilaritySearch.bruteForceTopK(emb, emb, "vec_id",
          "embedding", k = n - 1)
        .filter(col("cos") >= 0.95)
        .select(least(col("probe_id"), col("neighbor_id")).as("a"),
          greatest(col("probe_id"), col("neighbor_id")).as("b"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotPairs === brute,
        s"escalated run diverged from brute force: got ${gotPairs.size}, want ${brute.size}")
    } finally spark.conf.unset("graft.blocked.dedup.cap")
  }

  test("joint ball stays exact on a near-degenerate spectrum with threshold-boundary pairs (ortho inflation)") {
    // isotropic cloud: all eigenvalues near-equal, so the fixed-
    // iteration power solve is NOT guaranteed pairwise-orthogonal
    // components (λi/λj ≈ 1 stalls deflation separation) — the regime
    // where an un-inflated Σ Δpc² ≤ R² ball could silently drop a
    // TRUE pair sitting at the threshold boundary. Pairs are planted
    // at cos = τ + 1e-4..9e-4, as close to the cut as float inputs
    // keep stable, and the whole result must still equal brute force.
    val d = 32
    val tau = 0.95
    val rnd = new scala.util.Random(97)
    def unit(v: Array[Double]): Array[Double] = {
      val nm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nm)
    }
    val base = (0L until 400L).map(i =>
      (i, unit(Array.fill(d)(rnd.nextDouble() - 0.5))))
    val boundary = base.filter(_._1 % 8 == 0).map { case (i, u) =>
      val cosT = tau + 1e-4 * ((i % 9) + 1)
      val w0 = Array.fill(d)(rnd.nextDouble() - 0.5)
      val du = w0.zip(u).map { case (a, b) => a * b }.sum
      val w = unit(w0.zip(u).map { case (a, b) => a - du * b })
      val sinT = math.sqrt(1.0 - cosT * cosT)
      (2000L + i, u.zip(w).map { case (a, b) => cosT * a + sinT * b })
    }
    val emb = (base ++ boundary)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding").localCheckpoint()
    val got = Embeddings.exactNearDupsBlocked(emb, "vec_id", "embedding", tau)
      .collect()
    val gotPairs = got.map(r =>
      (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b"))).sorted.toSeq
    val n = emb.count().toInt
    val brute = SimilaritySearch.bruteForceTopK(emb, emb, "vec_id",
        "embedding", k = n - 1)
      .filter(col("cos") >= tau)
      .select(least(col("probe_id"), col("neighbor_id")).as("a"),
        greatest(col("probe_id"), col("neighbor_id")).as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotPairs === brute,
      s"boundary-pair run diverged from brute force: got ${gotPairs.size}, want ${brute.size}")
    // the float quantization of the planted vectors can push an
    // individual pair a hair under τ — brute force is the arbiter —
    // but the bulk of the planted set must have survived at the
    // boundary, or the fixture stopped testing anything
    assert(brute.count(_._2 >= 2000L) > boundary.size / 2,
      "fixture degenerated: boundary pairs fell below the threshold")
  }
}
