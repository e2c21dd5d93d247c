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
    * runs. The blocker is a PCA-projection GRID, which is CONTRACTIVE
    * on differences (projection onto a near-orthonormal basis never
    * lengthens a vector; centering cancels in differences), so for
    * unit-normalized x, y and any component set:
    *   cos(x,y) ≥ τ ⇒ ‖x−y‖ ≤ R = √(2−2τ)
    *     ⇒ |pc_i(x)−pc_i(y)| ≤ R per axis (unit rows suffice)  AND
    *       Σ_i Δpc_i² ≤ λmax(VVᵀ)·R² jointly (the measured spectral
    *       norm of the solved components' Gram covers their imperfect
    *       pairwise orthogonality — see the orthoInfl block).
    * Each point lands in one grid cell of side r = R + slack; any
    * qualifying pair is then in the SAME or an ADJACENT cell — a
    * 3^k-neighborhood equi-join, after which the exact full-dimension
    * cosine confirms. The slack is DIMENSION-SCALED: the projection is
    * computed from the quantized moments (x_q = rint(x·scale)), so a
    * pair difference's projected coordinate can deviate from the true
    * one by up to 2·‖v_i‖₁·(0.5/scale) ≤ √d/scale — a fixed slack
    * would silently lose cell-boundary pairs past d ≈ (scale·slack)²,
    * breaking the EXACT contract exactly where production embeddings
    * live (768/1024-dim). Completeness is therefore a theorem at ANY
    * d, the result set is EXACTLY the threshold pair set, and the
    * oracle is a plain threshold self-join.
    *
    * Candidate volume is O(Σ cell²) instead of O(n²) — and two guards
    * keep the degenerate (isotropic/dense) corpus from silently
    * re-quadraticizing:
    *  - the EXACT candidate volume is computed from the cell HISTOGRAM
    *    BEFORE any point-level join (same-cell Σc(c−1)/2 plus the
    *    neighbor-pair Σc_p·c_q via a histogram self-join over ≤ n tiny
    *    rows): if it exceeds the advisory cap, `blocking_advised` =
    *    false on every output row — the `graft_ivf_skew` discipline,
    *    telling the pipeline this corpus wants the approximate LSH
    *    verb unless exactness is worth the price — and, when the tail
    *    eigenvalues show the extra axes actually discriminate
    *    (√λ_i > r/2), the grid AUTO-ESCALATES from 3 to up to 6 PCs,
    *    adjudicated by the measured trade (candidate rows saved vs
    *    3^k explode rows added) — never blind;
    *  - candidates carry the kF ≤ 6 projected coordinates (fixed-width
    *    floats, independent of embedding width d) and the JOINT ball
    *    constraint Σ Δpc² ≤ (R + ballSlack)² filters them inside the
    *    join stage, BEFORE any d-wide vector is shuffled or scored —
    *    on a dense corpus the per-axis boxes admit far more than the
    *    ball does, and this is the difference between confirming
    *    O(true pairs) and confirming O(Σ cell²) candidates.
    * Output: (vid_a < vid_b, cos) + blocking_effective
    * (engine-measured: candidates enumerated < all pairs) +
    * blocking_advised (the pre-join histogram verdict) + grid_pcs
    * (the component count the grid actually used — 6 marks an
    * escalated run).
    */
  def exactNearDupsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.cosine_sim
    require(threshold > -1.0 && threshold < 1.0)
    val spark = emb.sparkSession
    val scale = 1000
    val nrm = emb.select(col(idCol).as("vid"), col(vecCol).as("v0"))
      .withColumn("nm", sqrt(aggregate(col("v0"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .filter(col("nm") > 0)
      .withColumn("v", transform(col("v0"), x => x.cast("double") / col("nm")))
      .localCheckpoint() // PCA pass + projection + confirm re-join read it
    val g = moments(nrm, "vid", "v", scale)
    if (g.isEmpty) {
      import org.apache.spark.sql.types._
      val idT = nrm.schema("vid").dataType
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("vid_a", idT), StructField("vid_b", idT),
          StructField("cos", DoubleType),
          StructField("blocking_effective", BooleanType),
          StructField("blocking_advised", BooleanType),
          StructField("grid_pcs", IntegerType))))
    }
    val d = dimOf(g)
    val (mean, comps, lambdas, _) = eigSolve(g, k = math.min(6, d),
      iters = 30, scale = scale)
    val kF = comps.length // filter components (≤ 6, ≤ d)
    val bigR = math.sqrt(2.0 - 2.0 * threshold)
    val gridSlack = math.sqrt(d.toDouble) / scale + 1e-6
    val ballSlack = math.sqrt(kF.toDouble) * math.sqrt(d.toDouble) / scale + 1e-6
    // ── ball soundness under imperfect orthogonality ────────────────
    // The joint bound Σ_i (v_i·δ)² ≤ ‖δ‖² needs an ORTHONORMAL row set;
    // the fixed-iteration power solve guarantees unit rows but not
    // pairwise orthogonality — on a near-degenerate spectrum (λ_i ≈
    // λ_j, exactly the isotropic corpora the kF = 6 escalation
    // targets) v_i·v_j can reach ~1e-2, and then Σ Δpc² = δᵀVᵀVδ can
    // exceed ‖δ‖² for a true pair at the threshold boundary — a
    // silent drop that breaks the EXACT contract. The exact inflation
    // is the spectral norm: δᵀVᵀVδ ≤ λmax(VVᵀ)·‖δ‖², and VVᵀ is a
    // kF×kF driver matrix — measure λmax (fixed-iteration power
    // method, deterministic) and widen the ball radius by √λmax. The
    // per-axis grid cells need only unit rows and stay un-widened.
    val orthoInfl = {
      val gram = Array.tabulate(kF, kF) { (i, j) =>
        var acc = 0.0
        var t = 0
        while (t < d) { acc += comps(i)(t) * comps(j)(t); t += 1 }
        acc
      }
      var v = Array.fill(kF)(1.0 / math.sqrt(kF.toDouble))
      for (_ <- 0 until 64) {
        val w = Array.tabulate(kF)(i =>
          (0 until kF).map(j => gram(i)(j) * v(j)).sum)
        val nm = math.sqrt(w.map(x => x * x).sum)
        if (nm > 0) v = w.map(_ / nm)
      }
      val lam = (for (i <- 0 until kF; j <- 0 until kF)
        yield v(i) * gram(i)(j) * v(j)).sum
      // λmax of a Gram matrix is ≥ 0; guard against a ulp under 1 so
      // the perfectly-orthonormal case stays bit-compatible, and pad
      // the measured value by one part in 1e9 (the power method
      // converges from below on the dominant eigenvalue)
      math.sqrt(math.max(1.0, lam * (1.0 + 1e-9)))
    }
    val r = bigR + gridSlack
    // vid + the kF projected coordinates — computed ONCE, read by the
    // histogram, both join sides, and the audit
    val proj = projectOnto(
        quantized(nrm.select(col("vid"), col("v")), "vid", "v", scale),
        "vid", d, mean, comps, scale, prefix = "p")
      .localCheckpoint()
    val n = g(0)
    // ── pre-join isotropy guard ─────────────────────────────────────
    // The EXACT candidate volume of a k-PC grid is computable from the
    // CELL HISTOGRAM alone, before any point-level join runs: same-cell
    // pairs are Σ c(c−1)/2, cross-cell pairs are Σ c_p·c_q over the
    // positive-offset neighbor pairs — a histogram self-join over
    // #cells-sized rows (≤ n tiny rows; the points never move). One
    // histogram at the finest resolution serves every coarser k by
    // re-aggregation.
    val kGrid0 = math.min(3, kF)
    val hist = proj
      .groupBy((1 to kF).map(i =>
        floor(col(s"p$i") / r).cast("long").as(s"c$i")): _*)
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    def offsets(k: Int): Seq[Seq[Int]] = Seq.fill(k)(Seq(-1, 0, 1))
      .foldLeft(Seq(Seq.empty[Int]))((acc, ax) => acc.flatMap(p => ax.map(p :+ _)))
      .filter(_.dropWhile(_ == 0).headOption.exists(_ > 0))
    def candVolume(k: Int): Long = {
      val hk =
        if (k == kF) hist
        else hist.groupBy((1 to k).map(i => col(s"c$i")): _*)
          .agg(sum(col("c")).as("c"))
      // c(c−1) is even, so the halving is exact on the driver (the SQL
      // `/` would promote to double)
      val same = hk.agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)))
        .head.getLong(0) / 2
      val dLit = array(offsets(k).map(ds => struct(ds.zipWithIndex.map {
        case (v, i) => lit(v.toLong).as(s"d${i + 1}") }: _*)): _*)
      val shifted = hk.withColumn("d", explode(dLit))
        .select((1 to k).map(i => (col(s"c$i") - col(s"d.d$i")).as(s"c$i")) :+
          col("c").as("cb"): _*)
      val cross = hk.join(shifted, (1 to k).map(i => s"c$i"))
        .agg(coalesce(sum(col("c") * col("cb")), lit(0L))).head.getLong(0)
      same + cross
    }
    val cand0 = candVolume(kGrid0)
    // advisory cap: candidate volume past ~2048 per point stops reading
    // as "sub-quadratic blocking worked here" (overridable — specs pin
    // it to exercise the guard on small planted fixtures; the floor
    // keeps small corpora, where even all-pairs is cheap, unflagged)
    val cap = spark.conf.getOption("graft.blocked.dedup.cap")
      .map(_.toLong).getOrElse(math.max(2048L * n, 1L << 22))
    // escalating past 3 grid PCs only pays when the tail axes spread
    // points across multiple cells (√λ vs r) — on a truly isotropic
    // corpus they do not, and the 3^k offset fan-out would eat the win;
    // when they might, the decision is the measured one: candidate rows
    // saved vs explode rows added (an explode row is a fraction of a
    // candidate row's cost — shuffle-write only, no join probe, no
    // ball evaluation)
    val extraAxesHelp = (kGrid0 until kF).exists(i =>
      math.sqrt(math.max(lambdas(i), 0.0)) > r / 2.0)
    val explodeW = 0.25
    val (kGrid, candVol) =
      if (cand0 > cap && kF > kGrid0 && extraAxesHelp) {
        val candF = candVolume(kF)
        val costF = candF + explodeW * n * ((math.pow(3.0, kF) - 1) / 2)
        val cost0 = cand0 + explodeW * n * ((math.pow(3.0, kGrid0) - 1) / 2)
        if (costF < cost0) (kF, candF) else (kGrid0, cand0)
      } else (kGrid0, cand0)
    val advised = candVol <= cap
    if (sys.env.contains("GRAFT_DBG_BLOCKED"))
      println(s"DBGBLK n=$n cand0=$cand0 candVol=$candVol cap=$cap kGrid=$kGrid " +
        s"lam=${lambdas.map(l => f"${math.sqrt(math.max(l, 0))}%.3f").mkString(",")} r=$r")
    val cellCols = (1 to kGrid).map(i =>
      floor(col(s"p$i") / r).cast("long").as(s"c$i"))
    val pCols = (1 to kF).map(i => col(s"p$i").cast("float").as(s"p$i"))
    val pts = proj.select((col("vid") +: cellCols) ++ pCols: _*)
    // each unordered pair is enumerated ONCE: same-cell pairs by id
    // order, cross-cell pairs at exactly one of the (3^k−1)/2
    // lexicographically POSITIVE offsets (the (p,q)/(q,p) symmetry
    // halves the neighborhood join). Candidate rows stay FIXED-WIDTH:
    // ids + cells + the kF float projections (never the d-wide vector,
    // whose width is what breaks the shuffle first at 100 TB) — and
    // the joint ball filter below discharges most of them before any
    // vector is touched.
    def side(tag: String) = pts.select(
      (col("vid").as(s"vid_$tag") +:
        (1 to kGrid).map(i => col(s"c$i"))) ++
        (1 to kF).map(i => col(s"p$i").as(s"p${i}_$tag")): _*)
    val aSide = side("a")
    val cellNames = (1 to kGrid).map(i => s"c$i")
    val ballSq = (orthoInfl * bigR + ballSlack) * (orthoInfl * bigR + ballSlack)
    def ballFilter(df: DataFrame): DataFrame = df.filter(
      (1 to kF).map(i => (col(s"p${i}_a") - col(s"p${i}_b")) *
        (col(s"p${i}_a") - col(s"p${i}_b"))).reduce(_ + _) <= lit(ballSq))
    val sameCell = ballFilter(
        aSide.join(side("b"), cellNames)
          .filter(col("vid_a") < col("vid_b")))
      .select("vid_a", "vid_b")
    val deltaLit = array(offsets(kGrid).map(ds =>
      struct(ds.zipWithIndex.map { case (v, i) =>
        lit(v.toLong).as(s"d${i + 1}") }: _*)): _*)
    val bShift = pts.withColumn("d", explode(deltaLit))
      .select((col("vid").as("vid_b") +:
        (1 to kGrid).map(i => (col(s"c$i") - col(s"d.d$i")).as(s"c$i"))) ++
        (1 to kF).map(i => col(s"p$i").as(s"p${i}_b")): _*)
    val crossCell = ballFilter(aSide.join(bShift, cellNames))
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
    val nCands = scala.util.Try(obs.get("n_cands").asInstanceOf[Long])
      .getOrElse(Long.MaxValue)
    val effective = n < 2 || nCands < n * (n - 1) / 2
    spark.read.parquet(outDir)
      .withColumn("blocking_effective", lit(effective))
      .withColumn("blocking_advised", lit(advised))
      .withColumn("grid_pcs", lit(kGrid))
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
    if (g.isEmpty) {
      // empty corpus: the typed spine with no rows, in the SAME column
      // order as the non-empty path (all pc columns first, then the
      // lambda/evr pairs) — positional consumers and unions across the
      // two paths must see one schema
      var out = emb.select(col(idCol)).limit(0)
      (1 to k).foreach(c => out = out.withColumn(s"pc$c", lit(0.0)))
      (1 to k).foreach { c =>
        out = out.withColumn(s"lambda$c", lit(0.0)).withColumn(s"evr$c", lit(0.0))
      }
      return out
    }
    val d = dimOf(g)
    val (mean, comps, lambdas, trace) = eigSolve(g, k, iters, scale)
    var out = projectOnto(quantized(emb, idCol, vecCol, scale), idCol,
      d, mean, comps, scale, prefix = "pc")
    for (c <- 0 until k) {
      out = out.withColumn(s"lambda${c + 1}", lit(lambdas(c)))
        .withColumn(s"evr${c + 1}",
          lit(if (trace > 0) lambdas(c) / trace else 0.0))
    }
    out
  }

  /** Dimension from a moment buffer's length: 1 + d + d(d+1)/2 = len. */
  private[graft] def dimOf(g: Array[Long]): Int =
    (((math.sqrt(9.0 + 8.0 * (g.length - 1)) - 3.0) / 2.0) + 0.5).toInt

  /** The driver eigen-solve over an exact-integer moment buffer:
    * (mean, top-k components, eigenvalues, trace) — fixed-iteration
    * power method with deflation (determinism notes in the object
    * scaladoc). Pure d×d driver arithmetic, zero Spark jobs.
    */
  private[graft] def eigSolve(g: Array[Long], k: Int, iters: Int, scale: Int)
      : (Array[Double], Array[Array[Double]], Array[Double], Double) = {
    val d = dimOf(g)
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
    (mean, comps, lambdas, trace)
  }

  /** Project the quantized corpus onto pre-solved components: per-row
    * LEFT fold over the array order — deterministic term order,
    * replayed identically by the oracle's list fold. Emits
    * (idCol, <prefix>1..<prefix>k).
    */
  private def projectOnto(q: DataFrame, idCol: String, d: Int,
      mean: Array[Double], comps: Array[Array[Double]], scale: Int,
      prefix: String): DataFrame = {
    val s = scale.toDouble
    var out = q
    for (c <- comps.indices) {
      val vLit = typedlit(comps(c).toSeq)
      val mLit = typedlit(mean.toSeq)
      out = out.withColumn(s"$prefix${c + 1}",
        aggregate(
          zip_with(col("xq"), sequence(lit(1), lit(d)), (x, idx) =>
            (x.cast("double") / s - element_at(mLit, idx)) *
              element_at(vLit, idx)),
          lit(0.0), (acc, t) => acc + t))
    }
    out.drop("xq")
  }
}
