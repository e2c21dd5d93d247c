package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine LINEAR ALGEBRA over the embedding column — PCA by power
  * iteration (Pearson 1901 / the Mises–Pollaczek-Geiringer iteration;
  * the dimensionality-reduction and whitening primitive an embedding
  * pipeline runs before clustering, visualization, or
  * drift-monitoring: SemDeDup-style cluster work gets faster AND
  * better-conditioned in the top-variance subspace).
  *
  * Scale shape — the reason this is a ONE-PASS operator, not an ML-lib
  * dependency: a d-dimensional corpus's covariance is fully determined
  * by its first two moments, and those collapse to ONE parameter-sized
  * partial aggregate ([[graft.functions.Aggregators.GramAgg]]): each
  * task folds its rows into a d(d+1)/2-long EXACT integer triangle
  * (embeddings pre-quantized x_q = rint(x·scale) — the q_sim_rerank
  * int8 discipline applied to moments), the driver receives ONE
  * ~2 KB-per-dim² buffer, and every eigen-iteration is then d×d driver
  * arithmetic — zero further corpus passes. Projection back over the
  * corpus is one codegen'd per-row array fold (left-to-right, so any
  * engine reproduces it term for term). The integer moments make the
  * covariance BIT-IDENTICAL across engines and partitionings (long
  * sums commute); the iteration is then the same double arithmetic on
  * the same matrix everywhere, so a DuckDB oracle replays the whole
  * run — covariance, every iteration, deflation, and projection.
  *
  * Determinism: fixed iteration count (no convergence test — a
  * data-dependent stop would diverge across engines at the ulp level),
  * start vector 1/√d (deterministic; orthogonal-start degeneracy is
  * spec-guarded on the fixture), deflation A ← A − λvvᵀ between
  * components, eigenvalue λ = vᵀAv (Rayleigh quotient at the final
  * iterate).
  */
object Embeddings {

  /** Top-`k` principal components of the (centered) embedding
    * distribution, fitted in one distributed pass + driver iteration;
    * returns one row per input row: (idCol, pc_1..pc_k — the centered
    * projections, λ_1..λ_k and the explained-variance ratios as
    * constant columns). Empty corpus ⇒ empty (correctly-typed) frame.
    */
  /** The quantized corpus: (idCol, xq = rint(x·scale) as long). */
  private def quantized(emb: DataFrame, idCol: String, vecCol: String,
      scale: Int): DataFrame =
    emb.select(col(idCol),
      transform(col(vecCol), x =>
        round(x.cast("double") * scale).cast("long")).as("xq"))

  /** The ONE distributed moment pass: the corpus's exact integer
    * [count, Σx_q, Σx_q·x_qᵀ triangle] buffer. MERGEABLE — long sums
    * commute, so buffers accumulated per micro-batch and folded with
    * [[mergeMoments]] are bit-identical to this one-shot pass (the
    * property the streaming PCA verb is built on). Empty corpus ⇒
    * empty array.
    */
  def moments(emb: DataFrame, idCol: String, vecCol: String,
      scale: Int = 1000): Array[Long] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val gram = udaf(new graft.functions.Aggregators.GramAgg,
      ExpressionEncoder[Seq[Long]]())
    quantized(emb, idCol, vecCol, scale)
      .agg(gram(col("xq")).as("g")).head.getAs[Seq[Long]]("g").toArray
  }

  /** Exact fold of per-batch moment buffers (elementwise long adds —
    * the [[graft.functions.Aggregators.GramAgg]] merge, exposed for
    * driver-side folds over a persisted buffer log).
    */
  def mergeMoments(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { require(a.length == b.length, "moment buffers of different dims")
      Array.tabulate(a.length)(i => a(i) + b(i)) }

  /** EXACT embedding near-dup with sub-quadratic blocking — the
    * lossless counterpart of the LSH variant
    * ([[Dedup.embeddingNearDups]], which can miss pairs): every pair
    * with cosine ≥ `threshold` is returned, yet no all-pairs join ever
    * runs. The blocker is the top-2 PCA projection, which is
    * CONTRACTIVE on differences (projection onto a near-orthonormal
    * basis never lengthens a vector; centering cancels in
    * differences), so for unit-normalized x,y:
    *   cos(x,y) ≥ τ  ⇒  ‖x−y‖ ≤ √(2−2τ)  ⇒  |pc_i(x)−pc_i(y)| ≤ √(2−2τ).
    * Each point lands in one grid cell of side r = √(2−2τ) + slack
    * (the slack covers quantization of the moment pass and the ~1e-13
    * non-orthogonality of power-iteration components); any qualifying
    * pair is then in the SAME or an ADJACENT cell — a 9-cell
    * neighborhood equi-join, after which the exact full-dimension
    * cosine confirms. Completeness is a theorem, so the result set is
    * EXACTLY the threshold pair set and the oracle is a plain
    * threshold self-join; what the blocking buys is candidate volume:
    * O(Σ cell² ) instead of O(n²) pairs — at 100 TB the difference
    * between a spatial join and a cartesian product. Output:
    * (vid_a < vid_b, cos) + blocking_effective (engine-measured:
    * candidates enumerated < all pairs).
    */
  def exactNearDupsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.cosine_sim
    require(threshold > -1.0 && threshold < 1.0)
    val nrm = emb.select(col(idCol).as("vid"), col(vecCol).as("v0"))
      .withColumn("nm", sqrt(aggregate(col("v0"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .filter(col("nm") > 0)
      .withColumn("v", transform(col("v0"), x => x.cast("double") / col("nm")))
      .localCheckpoint() // PCA pass + projection + confirm re-join read it
    val proj = pcaProject(nrm.select(col("vid"), col("v")), "vid", "v",
      k = 3, iters = 30)
    val r = math.sqrt(2.0 - 2.0 * threshold) + 0.02
    // candidate enumeration carries IDS AND CELLS ONLY (24 bytes/row):
    // the 27-neighborhood join's volume is its row count — shipping the
    // vectors through it would multiply the shuffle by the embedding
    // width, which is what breaks first on a degenerate (isotropic)
    // corpus where linear projections concentrate. Vectors re-join
    // AFTER candidacy, against the (small, AQE-broadcastable) vector
    // table, and the fat rows exist only inside the confirm stage's
    // pipeline — never in a shuffle file.
    val pts = proj.select(col("vid"),
        floor(col("pc1") / r).cast("long").as("cx"),
        floor(col("pc2") / r).cast("long").as("cy"),
        floor(col("pc3") / r).cast("long").as("cz"))
      .localCheckpoint() // both join sides + the audit read it
    // each unordered pair is enumerated ONCE: same-cell pairs by id
    // order, cross-cell pairs at exactly one of the 13 lexicographically
    // POSITIVE offsets (the (p,q)/(q,p) symmetry means only half the
    // 26-neighborhood needs joining — halves the candidate volume)
    val aSide = pts.select(col("vid").as("vid_a"),
      col("cx"), col("cy"), col("cz"))
    val bRaw = pts.select(col("vid").as("vid_b"),
      col("cx").as("bcx"), col("cy").as("bcy"), col("cz").as("bcz"))
    val sameCell = aSide.join(
        bRaw.select(col("vid_b"), col("bcx").as("cx"), col("bcy").as("cy"),
          col("bcz").as("cz")),
        Seq("cx", "cy", "cz"))
      .filter(col("vid_a") < col("vid_b"))
      .select("vid_a", "vid_b")
    val deltas = for {
      dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1
      if dx > 0 || (dx == 0 && (dy > 0 || (dy == 0 && dz > 0)))
    } yield (dx, dy, dz)
    val deltaLit = array(deltas.map { case (x, y, z) =>
      struct(lit(x.toLong).as("dx"), lit(y.toLong).as("dy"),
        lit(z.toLong).as("dz")) }: _*)
    val crossCell = aSide.join(
        bRaw.withColumn("d", explode(deltaLit))
          .select(col("vid_b"), (col("bcx") - col("d.dx")).as("cx"),
            (col("bcy") - col("d.dy")).as("cy"),
            (col("bcz") - col("d.dz")).as("cz")),
        Seq("cx", "cy", "cz"))
      .select(least(col("vid_a"), col("vid_b")).as("vid_a"),
        greatest(col("vid_a"), col("vid_b")).as("vid_b"))
    val cands = sameCell.unionByName(crossCell)
    // candidates stream through ONE pass — the audit count rides it as
    // an observe() metric (a count job or checkpoint here would
    // re-enumerate or materialize the candidate volume, the dominant
    // term on a degenerate corpus)
    val obs = new org.apache.spark.sql.Observation(
      s"blocked_cands_${java.util.UUID.randomUUID}")
    val vecs = nrm.select(col("vid"), col("v0"))
    val outDir = graft.Tables.scratch(
      s"blocked_dedup_${System.nanoTime()}")
    cands
      .observe(obs, count(lit(1)).as("n_cands"))
      .join(vecs.select(col("vid").as("vid_a"), col("v0").as("v_a")), Seq("vid_a"))
      .join(vecs.select(col("vid").as("vid_b"), col("v0").as("v_b")), Seq("vid_b"))
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("vid_a"), col("vid_b"), col("cos"))
      .dropDuplicates("vid_a", "vid_b")
      .write.mode("overwrite").parquet(outDir)
    val n = pts.count()
    val nCands = scala.util.Try(obs.get("n_cands").asInstanceOf[Long])
      .getOrElse(Long.MaxValue)
    val effective = n < 2 || nCands < n * (n - 1) / 2
    nrm.sparkSession.read.parquet(outDir)
      .withColumn("blocking_effective", lit(effective))
  }

  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 30, scale: Int = 1000): DataFrame =
    pcaProjectFromMoments(emb, idCol, vecCol,
      moments(emb, idCol, vecCol, scale), k, iters, scale)

  /** The eigen-solve + projection over a PRE-ACCUMULATED moment buffer
    * — the serve path of the streaming/incremental moment log (and the
    * tail of [[pcaProject]]).
    */
  def pcaProjectFromMoments(emb: DataFrame, idCol: String, vecCol: String,
      g: Array[Long], k: Int, iters: Int = 30, scale: Int = 1000): DataFrame = {
    require(k >= 1 && iters >= 1)
    val q = quantized(emb, idCol, vecCol, scale)
    if (g.isEmpty) {
      // empty corpus: emit the typed spine with no rows
      var out = emb.select(col(idCol)).limit(0)
      (1 to k).foreach { c =>
        out = out.withColumn(s"pc$c", lit(0.0))
          .withColumn(s"lambda$c", lit(0.0)).withColumn(s"evr$c", lit(0.0))
      }
      return out
    }
    // solve 1 + d + d(d+1)/2 = len for d
    val d = (((math.sqrt(9.0 + 8.0 * (g.length - 1)) - 3.0) / 2.0) + 0.5).toInt
    val n = g(0).toDouble
    val s = scale.toDouble
    val mean = Array.tabulate(d)(i => g(1 + i) / n / s)
    // covariance from the exact integer triangle: C = E[xxᵀ] − μμᵀ
    val cov = Array.ofDim[Double](d, d)
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = g(p) / n / (s * s) - mean(i) * mean(j)
        cov(i)(j) = v; cov(j)(i) = v
        p += 1; j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    // power iteration with deflation — plain double loops in ascending
    // index order (the order the oracle's group-sums approximate to
    // within ulps; 6dp canonicalization absorbs the difference)
    val comps = Array.ofDim[Double](k, d)
    val lambdas = new Array[Double](k)
    val a = cov.map(_.clone())
    for (c <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        val w = new Array[Double](d)
        var i2 = 0
        while (i2 < d) {
          var acc = 0.0
          var j2 = 0
          while (j2 < d) { acc += a(i2)(j2) * v(j2); j2 += 1 }
          w(i2) = acc; i2 += 1
        }
        val nm = math.sqrt(w.map(x => x * x).sum)
        if (nm > 0) v = w.map(_ / nm)
      }
      var lam = 0.0
      for (i2 <- 0 until d; j2 <- 0 until d) lam += v(i2) * a(i2)(j2) * v(j2)
      comps(c) = v; lambdas(c) = lam
      for (i2 <- 0 until d; j2 <- 0 until d)
        a(i2)(j2) -= lam * v(i2) * v(j2)
    }
    // project: per-row LEFT fold over the array order — deterministic
    // term order, replayed identically by the oracle's list fold
    var out = q
    for (c <- 0 until k) {
      val vLit = typedlit(comps(c).toSeq)
      val mLit = typedlit(mean.toSeq)
      out = out.withColumn(s"pc${c + 1}",
        aggregate(
          zip_with(col("xq"), sequence(lit(1), lit(d)), (x, idx) =>
            (x.cast("double") / s - element_at(mLit, idx)) *
              element_at(vLit, idx)),
          lit(0.0), (acc, t) => acc + t))
    }
    for (c <- 0 until k) {
      out = out.withColumn(s"lambda${c + 1}", lit(lambdas(c)))
        .withColumn(s"evr${c + 1}",
          lit(if (trace > 0) lambdas(c) / trace else 0.0))
    }
    out.drop("xq")
  }
}
