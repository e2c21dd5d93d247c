package graft.operators

import graft.functions.VectorExpressions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning
  * (SURVEY §2.B.9). All formulations are shuffle-bounded: candidate
  * generation is a groupBy/self-join on hash buckets (band keys), never
  * an all-pairs product, so they scale to billions of documents — the
  * candidate-pair count is driven by collision density, not n².
  */
object Dedup {

  /** Materialize-and-truncate-lineage point for the multi-consumer /
    * iterative plans below. Default is `localCheckpoint()` — eager,
    * no extra I/O, blocks live in executor storage — which is the
    * right tool in local mode but LOSSY on a real cluster: executor
    * failure discards the blocks and kills the job (there is no
    * lineage left to recompute). Opt into durable checkpoints with
    *
    *   spark.conf.set("graft.dedup.reliableCheckpoint", "true")
    *   // and optionally: graft.dedup.checkpointDir=<fault-tolerant dir>
    *
    * which routes every site through `df.checkpoint()` against the
    * SparkContext checkpoint dir — files survive executor loss, at the
    * cost of one write+read through the checkpoint store per site. The
    * `graft.dedup.checkpointDir` knob WINS when set: if something else
    * already installed a different SparkContext checkpoint dir, the
    * knob overrides it (with a logged warning) rather than being
    * silently ignored — a user who set the knob chose where durable
    * dedup state lives. Checkpoint files are not auto-deleted; the
    * connected-components loop writes one per iteration, so long-lived
    * sessions should enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (files
    * are then reclaimed once the checkpointed frames are GC'd). The
    * trade: localCheckpoint for interactive/local runs, reliable for
    * long CC iterations or multi-hour dedup jobs on clusters where
    * executor churn is expected.
    */
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption("graft.dedup.reliableCheckpoint")
      .exists(_.toBoolean)
    if (!reliable) df.localCheckpoint()
    else {
      val knob = spark.conf.getOption("graft.dedup.checkpointDir")
      val current = spark.sparkContext.getCheckpointDir
      // which knob value we last installed (setCheckpointDir nests a
      // UUID under the given dir, so the installed dir never string-
      // equals the knob — track application explicitly instead)
      val applied = spark.conf.getOption("graft.dedup.__checkpointDirApplied")
      (knob, current) match {
        case (Some(k), Some(_)) if applied.contains(k) => // already ours
        case (Some(k), Some(c)) =>
          // the documented knob must not be silently shadowed by a dir
          // someone else set first — explicit configuration wins
          log.warn(s"graft.dedup.checkpointDir=$k overrides the existing " +
            s"SparkContext checkpoint dir $c for reliable dedup checkpoints")
          spark.sparkContext.setCheckpointDir(k)
          spark.conf.set("graft.dedup.__checkpointDirApplied", k)
        case (Some(k), None) =>
          spark.sparkContext.setCheckpointDir(k)
          spark.conf.set("graft.dedup.__checkpointDirApplied", k)
        case (None, None) => spark.sparkContext.setCheckpointDir(
          graft.Tables.scratch("dedup_checkpoints"))
        case _ => // knob unset with a dir already installed
      }
      df.checkpoint()
    }
  }

  /** Exact dedup on content hash: keep the smallest id per distinct
    * value of `contentCol`. One hash-shuffle; deterministic keeper.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol).cast("binary"), 256).as("content_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Tokenize text for set-similarity: lowercase, split on non-word. */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\W+"), t => length(t) > 0)

  /** Word-level shingles (n-grams joined to strings) for minhash. */
  def shingles(tokensCol: Column, n: Int): Column = {
    if (n <= 1) tokensCol
    else {
      // transform over sliding offsets; drop tail windows short of n
      val sz = size(tokensCol)
      filter(
        transform(tokensCol, (_, i) =>
          when(i <= sz - n, array_join(slice(tokensCol, i + 1, lit(n)), " "))),
        s => s.isNotNull)
    }
  }

  /** MinHash-LSH candidate pairs with exact-jaccard verification.
    *
    * Pipeline: minhash signature (k hashes) per doc → band keys
    * (k/rowsPerBand bands) → explode bands → groupBy band key self-join
    * → distinct candidate pairs → exact token-set jaccard filter.
    * Probability a pair with jaccard s collides: 1-(1-s^r)^b — with
    * k=128, r=4, b=32 the S-curve midpoint sits near s≈0.42, so
    * near-dups ≥0.7 are caught with prob > 0.999.
    *
    * Scale: the only shuffles are the band-key groupBy and the pair
    * distinct; skewed bands (giant clusters) are bounded upstream by
    * `maxBucket` — buckets above it skip the quadratic self-join and
    * fall back to linear star pairing against the bucket's min-doc
    * representative, so a 1M-doc templated-page cluster costs O(1M)
    * candidate edges, not O(10¹²). Star edges only survive verification
    * when the member passes the similarity threshold vs the
    * representative, so connectivity is guaranteed for those members
    * only — partial recall by design, never a silent drop.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, rowsPerBand: Int = 4,
      shingleSize: Int = 1, maxBucket: Int = 1000): DataFrame = {
    // materialize the token array BEFORE shingling: higher-order
    // functions re-evaluate captured expressions per element (no CSE
    // inside lambdas), so shingling directly over tokens(text) would
    // re-tokenize the full text O(|tokens|) times per row.
    // localCheckpoint: the shingle table feeds the signature build AND
    // both verification sides — without it the tokenize+shingle
    // pipeline re-runs per consumer.
    val words = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("words"))
    val toks = materialize(words
      .select(col("doc"), array_distinct(shingles(col("words"), shingleSize)).as("toks")))
    // the band shuffle carries ONLY (doc, band): shipping ~KB token
    // arrays through a numBands× explode would multiply shuffle volume
    // by the band count; verification re-joins tokens by doc id instead
    val sigs = toks
      .withColumn("sig", minhash_sig(col("toks"), numHashes))
      .withColumn("band", explode(lsh_bands(col("sig"), rowsPerBand)))
      .select("doc", "band")
    // skew guard: band buckets larger than maxBucket never enter the
    // self-join — a degenerate bucket (giant all-dup cluster, common in
    // web crawls) would otherwise produce O(bucket²) candidate pairs.
    // Oversized buckets are NOT silently dropped: they fall back to
    // star pairing (every member vs the bucket's min-doc representative,
    // linear in bucket size). Verified star edges chain the cluster
    // together under duplicateClusters; only member↔member pairs whose
    // similarity to the representative falls below the threshold are
    // lost — documented partial recall instead of total loss.
    val bandStats = sigs.groupBy("band").agg(count(lit(1)).as("__bucket_n"))
    val okBands = bandStats.filter(col("__bucket_n") <= maxBucket).select("band")
    val bigBands = bandStats.filter(col("__bucket_n") > maxBucket).select("band")
    val banded = sigs.join(okBands, Seq("band"))
    val a = banded.select(col("band"), col("doc").as("doc_a"))
    val b = banded.select(col("band"), col("doc").as("doc_b"))
    val bucketPairs = a.join(b, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val bigMembers = sigs.join(bigBands, Seq("band"))
    val starPairs = bigMembers
      .join(bigMembers.groupBy("band").agg(min("doc").as("rep")), Seq("band"))
      .filter(col("doc") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc").as("doc_b"))
    bucketPairs.union(starPairs)
      .dropDuplicates("doc_a", "doc_b")
      .join(toks.select(col("doc").as("doc_a"), col("toks").as("toks_a")), Seq("doc_a"))
      .join(toks.select(col("doc").as("doc_b"), col("toks").as("toks_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard_tokens(col("toks_a"), col("toks_b")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Persistable dedup index: one row per doc with its distinct gram
    * array and minhash band keys. Write this to parquet once per
    * corpus slice; incremental ingestion then dedups a new batch
    * against it WITHOUT recomputing the existing corpus — the only
    * formulation that survives continuous ingestion at 100 TB (a full
    * recompute per batch is quadratic in total data over time).
    */
  def signatureIndex(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, rowsPerBand: Int = 4,
      shingleSize: Int = 1): DataFrame = {
    val words = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("words"))
    // store 64-bit gram hashes, not gram strings: jaccard over hashed
    // distinct grams equals jaccard over grams up to a ~|g|²/2⁶⁴
    // collision probability, and the persisted index shrinks by the
    // average gram length — the difference between an index you can
    // keep hot and one you can't
    words
      .select(col("doc"), array_distinct(shingles(col("words"), shingleSize)).as("grams"))
      .select(col("doc"),
        transform(col("grams"), g => xxhash64(g)).as("toks"),
        lsh_bands(minhash_sig(col("grams"), numHashes), rowsPerBand).as("bands"))
  }

  /** Near-dup pairs touching the NEW batch only: candidates are
    * new×old and new×new band collisions — existing-corpus pairs are
    * never regenerated. Both inputs are `signatureIndex` outputs
    * (the old one typically read back from parquet). Shares the
    * maxBucket skew guard: band counts over old ∪ new, oversized
    * bands fall back to star-pairing each NEW member against the
    * band's min-doc representative.
    */
  def incrementalNearDups(
      index: DataFrame, newIdx0: DataFrame,
      threshold: Double, maxBucket: Int = 1000): DataFrame = {
    // the new batch's plan feeds four consumers (band stats, both
    // candidate joins, verification) — materialize it once; the OLD
    // index is already parquet-backed, so re-reads are cheap
    val newIdx = materialize(newIdx0)
    val newB = newIdx.select(col("doc"), explode(col("bands")).as("band"))
    // every downstream consumer (band stats, both candidate joins)
    // only ever looks at bands the NEW batch occupies — restrict the
    // old∪new exploded view to those up front, so a batch's work is
    // O(new bands' postings), not O(index): without this, the stats
    // aggregation alone re-scans the whole persisted index per
    // incremental batch, which at streaming cadence is the corpus
    // re-scan the incremental path exists to avoid
    val allB = index.select(col("doc"), explode(col("bands")).as("band"))
      .union(newB)
      .join(newB.select("band").distinct(), Seq("band"), "left_semi")
    val stats = allB.groupBy("band").agg(count(lit(1)).as("__bucket_n"))
    val ok = stats.filter(col("__bucket_n") <= maxBucket).select("band")
    val big = stats.filter(col("__bucket_n") > maxBucket).select("band")
    val pairsOk = newB.join(ok, Seq("band"))
      .select(col("band"), col("doc").as("doc_n"))
      .join(allB.join(ok, Seq("band")).select(col("band"), col("doc").as("doc_o")),
        Seq("band"))
      .filter(col("doc_n") =!= col("doc_o"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
        greatest(col("doc_n"), col("doc_o")).as("doc_b"))
    val pairsBig = newB.join(big, Seq("band"))
      .join(allB.join(big, Seq("band")).groupBy("band").agg(min("doc").as("rep")),
        Seq("band"))
      .filter(col("doc") =!= col("rep"))
      .select(least(col("doc"), col("rep")).as("doc_a"),
        greatest(col("doc"), col("rep")).as("doc_b"))
    val toks = index.select("doc", "toks").union(newIdx.select("doc", "toks"))
    pairsOk.union(pairsBig)
      .dropDuplicates("doc_a", "doc_b")
      .join(toks.select(col("doc").as("doc_a"), col("toks").as("toks_a")), Seq("doc_a"))
      .join(toks.select(col("doc").as("doc_b"), col("toks").as("toks_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard_tokens(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Verified near-duplicate pairs at a jaccard threshold. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128,
      rowsPerBand: Int = 4, shingleSize: Int = 1,
      maxBucket: Int = 1000): DataFrame =
    minhashCandidatePairs(df, idCol, textCol, numHashes, rowsPerBand, shingleSize, maxBucket)
      .filter(col("jaccard") >= threshold)

  /** Exact set-similarity join via prefix filtering (the SSJoin /
    * PPJoin family — Chaudhuri et al. '06, Xiao et al. '08; public
    * algorithms). For each doc, grams are ordered by ascending global
    * document frequency (rarest first); any pair with
    * jaccard ≥ threshold MUST share a gram within the first
    * |g| − ⌈threshold·|g|⌉ + 1 grams of that order, so joining on
    * prefix grams is a COMPLETE candidate generator — unlike LSH there
    * is no probabilistic recall loss, which keeps results oracle-exact.
    *
    * Scale: shuffles are (1) gram document-frequency count, (2) df
    * lookup join on gram, (3) per-doc window sort (tiny partitions),
    * (4) prefix-gram equi-join, (5) candidate distinct. Rarest-first
    * ordering keeps hot grams out of prefixes, so the candidate count
    * is collision-driven, never O(n²).
    */
  def prefixJaccardJoin(
      df: DataFrame, idCol: String, gramsCol: String,
      threshold: Double): DataFrame = {
    // materialize the gram arrays ONCE: this plan is consumed four ways
    // (df counts, prefix build, and both sides of verification) — without
    // the checkpoint the upstream tokenize/shingle pipeline re-runs per
    // consumer (at scale you'd persist this table anyway)
    val d = materialize(df.select(col(idCol).as("doc"),
      array_distinct(col(gramsCol)).as("grams")))
    val exploded = d.select(col("doc"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    val dfCounts = exploded.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    // total order (gram_df asc, gram asc) — any total order preserves
    // completeness; rarest-first minimizes candidates. No global rank
    // needed (a global row_number would single-partition the dictionary).
    val w = Window.partitionBy("doc").orderBy(col("gram_df").asc, col("gram").asc)
    val prefixes = exploded.join(dfCounts, Seq("gram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc"), col("sz"), col("gram"), col("rn"))
    // length-ratio filter: jaccard ≥ t ⟹ t·max(|a|,|b|) ≤ min(|a|,|b|)
    // — prunes candidates before the (array-carrying) verification join.
    // Then PPJoin's positional filter (Xiao et al. '08): per pair,
    // aggregate the shared-prefix-gram count k and the LAST matched
    // prefix positions (imax, jmax). Positions are monotone in the
    // global (gram_df asc, gram asc) order within every doc, so any
    // common gram NOT matched prefix-to-prefix must sort after the last
    // matched gram in BOTH docs — hence
    //   |a ∩ b| ≤ k + min(sz_a − imax, sz_b − jmax)
    // while jaccard ≥ t needs |a ∩ b| ≥ ⌈t·(sz_a+sz_b)/(1+t)⌉. At low
    // thresholds (long prefixes, many shared hot grams) this kills most
    // candidates before the array re-intersection, which is the
    // dominant verification cost. The groupBy replaces the former
    // dropDuplicates — same single (doc_a, doc_b) shuffle.
    val minOverlap =
      ceil(lit(threshold) * (col("sz_a") + col("sz_b")) / lit(1.0 + threshold))
    val cands = prefixes
      .select(col("gram"), col("doc").as("doc_a"), col("sz").as("sz_a"), col("rn").as("rn_a"))
      .join(prefixes
        .select(col("gram"), col("doc").as("doc_b"), col("sz").as("sz_b"), col("rn").as("rn_b")),
        Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) >= lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("k"),
        max("rn_a").as("imax"), max("rn_b").as("jmax"),
        max("sz_a").as("sz_a"), max("sz_b").as("sz_b"))
      .filter(col("k") + least(col("sz_a") - col("imax"), col("sz_b") - col("jmax")) >= minOverlap)
      .select("doc_a", "doc_b")
    cands
      .join(d.select(col("doc").as("doc_a"), col("grams").as("g_a")), Seq("doc_a"))
      .join(d.select(col("doc").as("doc_b"), col("grams").as("g_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard_tokens(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** CROSS-TABLE exact similarity join — [[prefixJaccardJoin]]'s
    * prefix-filter completeness argument applied between two relations
    * (fuzzy decontamination: training corpus × benchmark set). Both
    * sides' prefixes are built under ONE shared global gram order
    * (document frequency over the union, gram as tiebreak) — the
    * prefix lemma requires the two documents of a qualifying pair to
    * order their grams identically, and then guarantees their prefixes
    * intersect, so joining LEFT prefixes against RIGHT prefixes only
    * is still a complete candidate generator while never materializing
    * within-side candidates — at scale the within-corpus near-dup
    * pairs (the dedup problem, solved elsewhere) vastly outnumber the
    * cross-side hits this operator is after. Length-ratio and PPJoin
    * positional filters apply unchanged; candidates verify by exact
    * jaccard, so results carry no LSH recall loss and are
    * oracle-exact. Output: (doc_a ∈ left, doc_b ∈ right, jaccard) —
    * ids may overlap across the two relations.
    */
  def crossJaccardJoin(
      left: DataFrame, right: DataFrame, idCol: String,
      gramsCol: String, threshold: Double): DataFrame = {
    def side(df: DataFrame, tag: Int) =
      df.select(col(idCol).as("doc"), array_distinct(col(gramsCol)).as("grams"),
        lit(tag).as("side"))
    // one materialization feeds df counts, both prefix builds, and
    // both verification sides (the prefixJaccardJoin rule)
    val u = materialize(side(left, 0).unionByName(side(right, 1)))
    val exploded = u.select(col("side"), col("doc"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    val dfCounts = exploded.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    val w = Window.partitionBy("side", "doc").orderBy(col("gram_df").asc, col("gram").asc)
    val prefixes = exploded.join(dfCounts, Seq("gram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
    val pa = prefixes.filter(col("side") === 0)
      .select(col("gram"), col("doc").as("doc_a"), col("sz").as("sz_a"), col("rn").as("rn_a"))
    val pb = prefixes.filter(col("side") === 1)
      .select(col("gram"), col("doc").as("doc_b"), col("sz").as("sz_b"), col("rn").as("rn_b"))
    val minOverlap =
      ceil(lit(threshold) * (col("sz_a") + col("sz_b")) / lit(1.0 + threshold))
    val cands = pa.join(pb, Seq("gram"))
      .filter(least(col("sz_a"), col("sz_b")) >= lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("k"),
        max("rn_a").as("imax"), max("rn_b").as("jmax"),
        max("sz_a").as("sz_a"), max("sz_b").as("sz_b"))
      .filter(col("k") + least(col("sz_a") - col("imax"), col("sz_b") - col("jmax")) >= minOverlap)
      .select("doc_a", "doc_b")
    cands
      .join(u.filter(col("side") === 0)
        .select(col("doc").as("doc_a"), col("grams").as("g_a")), Seq("doc_a"))
      .join(u.filter(col("side") === 1)
        .select(col("doc").as("doc_b"), col("grams").as("g_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard_tokens(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Persist the benchmark side of [[crossJaccardJoin]] as a reusable
    * contamination index, so STREAMING/batch ingest can be checked in
    * O(batch × collisions) without re-processing the benchmark set:
    * three artifacts — the gram document frequencies (the ORDER), the
    * per-doc prefix rows, and the verification gram arrays. The prefix
    * order is fixed at build time as (bench_df asc, gram asc); a gram
    * the benchmark never saw orders as df = 0 (checked side uses
    * coalesce(df, 0)), which is still ONE total order shared by both
    * sides — the prefix lemma's only requirement — so batch checks
    * remain COMPLETE: the union of per-batch results equals the
    * one-shot cross join bit-for-bit (q_decontaminate_incremental's
    * hash gate vs the one-shot oracle proves exactly that).
    */
  def buildContaminationIndex(bench: DataFrame, idCol: String,
      gramsCol: String, threshold: Double, path: String): Unit = {
    val d = materialize(bench.select(col(idCol).as("doc"),
      array_distinct(col(gramsCol)).as("grams")))
    val exploded = d.select(col("doc"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    val dfc = exploded.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    dfc.write.mode("overwrite").parquet(s"$path/gram_df")
    val w = Window.partitionBy("doc").orderBy(col("gram_df").asc, col("gram").asc)
    exploded.join(dfc, Seq("gram"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("gram", "doc", "sz", "rn")
      .write.mode("overwrite").parquet(s"$path/prefixes")
    d.write.mode("overwrite").parquet(s"$path/grams")
  }

  /** Check a batch against a [[buildContaminationIndex]] artifact:
    * batch prefixes under the index's frozen order join the persisted
    * bench prefixes on gram (cross-side candidates only), then the
    * length-ratio + PPJoin positional filters and the exact-jaccard
    * verification — identical semantics to [[crossJaccardJoin]] with
    * the bench side pre-computed. Output: (doc_a ∈ batch,
    * doc_b ∈ bench, jaccard ≥ threshold).
    */
  def checkContamination(batch: DataFrame, idCol: String,
      gramsCol: String, threshold: Double, path: String): DataFrame = {
    val spark = batch.sparkSession
    val dfc = spark.read.parquet(s"$path/gram_df")
    val pb = spark.read.parquet(s"$path/prefixes")
      .select(col("gram"), col("doc").as("doc_b"), col("sz").as("sz_b"),
        col("rn").as("rn_b"))
    val d = materialize(batch.select(col(idCol).as("doc"),
      array_distinct(col(gramsCol)).as("grams")))
    val exploded = d.select(col("doc"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    val w = Window.partitionBy("doc")
      .orderBy(col("__df").asc, col("gram").asc)
    val pa = exploded.join(dfc, Seq("gram"), "left_outer")
      .withColumn("__df", coalesce(col("gram_df"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("gram"), col("doc").as("doc_a"), col("sz").as("sz_a"),
        col("rn").as("rn_a"))
    val minOverlap =
      ceil(lit(threshold) * (col("sz_a") + col("sz_b")) / lit(1.0 + threshold))
    val cands = pa.join(pb, Seq("gram"))
      .filter(least(col("sz_a"), col("sz_b")) >= lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("k"),
        max("rn_a").as("imax"), max("rn_b").as("jmax"),
        max("sz_a").as("sz_a"), max("sz_b").as("sz_b"))
      .filter(col("k") + least(col("sz_a") - col("imax"), col("sz_b") - col("jmax")) >= minOverlap)
      .select("doc_a", "doc_b")
    cands
      .join(d.select(col("doc").as("doc_a"), col("grams").as("g_a")), Seq("doc_a"))
      .join(spark.read.parquet(s"$path/grams")
        .select(col("doc").as("doc_b"), col("grams").as("g_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard_tokens(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup: 64-bit simhash, banded into 4×16-bit chunks
    * (pigeonhole: hamming distance ≤3 ⇒ at least one chunk equal),
    * verified with bit_count(xor) ≤ maxHamming.
    *
    * `tokenHashMd5` switches the signature to the 60-bit md5-hashed
    * variant (4×15-bit chunks, same pigeonhole argument) whose values a
    * SQL oracle recomputes exactly; the default XXH64 kernel is the
    * faster choice at production scale (GraftHash.simhashMd5 doc).
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000,
      tokenHashMd5: Boolean = false): DataFrame = {
    val (sigFn, chunkBits) =
      if (tokenHashMd5) (simhash_md5 _, 15) else (simhash64 _, 16)
    val chunkMask = (1L << chunkBits) - 1
    val sh = df.select(col(idCol).as("doc"),
      sigFn(tokens(col(textCol))).as("sh"))
    val chunkedAll = sh.select(col("doc"), col("sh"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("key", concat_ws(":", col("chunk"),
        expr(s"shiftrightunsigned(sh, chunk * $chunkBits)").bitwiseAND(lit(chunkMask))))
    // same skew guard as minhash: bound chunk-key buckets pre-self-join,
    // with the same linear star-pairing fallback for oversized buckets
    // (see minhashCandidatePairs) instead of a silent drop
    val keyStats = chunkedAll.groupBy("key").agg(count(lit(1)).as("__bucket_n"))
    val okKeys = keyStats.filter(col("__bucket_n") <= maxBucket).select("key")
    val bigKeys = keyStats.filter(col("__bucket_n") > maxBucket).select("key")
    val chunked = chunkedAll.join(okKeys, Seq("key"))
    val a = chunked.select(col("key"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("key"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    val bucketPairs = a.join(b, Seq("key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
    val bigMembers = chunkedAll.join(bigKeys, Seq("key"))
    val starPairs = bigMembers
      .join(bigMembers.groupBy("key")
        .agg(min("doc").as("rep"), min_by(col("sh"), col("doc")).as("sh_rep")), Seq("key"))
      .filter(col("doc") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc").as("doc_b"),
        col("sh_rep").as("sh_a"), col("sh").as("sh_b"))
    bucketPairs.union(starPairs)
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Semantic dedup, SemDeDup-style (Abbas et al. '23,
    * arXiv:2303.09540 — public): a seeded k-means coarse quantizer
    * (reusing [[IvfIndex.fit]]) partitions the embedding space; within
    * each cluster, every vector whose exact cosine to a SMALLER-id
    * cluster-mate reaches `threshold` is removed (deterministic greedy
    * keep-lowest-id, the paper's ε-dedup with id tiebreak). Returns one
    * row per removed vector: (idCol, dup_of = smallest such mate,
    * max_cos = its best duplicate cosine).
    *
    * Scale shape: the pair join shuffles on `cluster` only; with
    * nClusters grown ∝ corpus size the per-cluster candidate count is
    * bounded, so total work is O(n·avg_cluster) — never global
    * all-pairs. Cross-cluster duplicates are the accepted recall loss
    * of the method (boundary-split pairs); DedupSpec measures planted
    * recall ≥ 0.9 and the query's derived oracle rechecks every
    * removal's exact cosine end to end.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nClusters: Int, seed: Long = 42L): DataFrame = {
    // an empty corpus has no duplicates — and no train set for the
    // blocking quantizer (k-means needs ≥1 point); short-circuit to
    // the empty result shape. The isEmpty probe is one limit-1 task,
    // noise next to the k-means fit it guards.
    if (df.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("dup_of",
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("max_cos",
            org.apache.spark.sql.types.DoubleType))))
    val (assigned, _) = IvfIndex.fit(df, idCol, vecCol, nClusters, seed)
    val a = assigned.select(col("cluster"), col(idCol).as("vid_a"), col(vecCol).as("v_a"))
    val b = assigned.select(col("cluster"), col(idCol).as("vid_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("vid_a") < col("vid_b"))
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .groupBy(col("vid_b").as(idCol))
      .agg(min("vid_a").as("dup_of"), max("cos").as("max_cos"))
  }

  /** [[semanticDedup]] with the blocking QUANTIZER fit in the top-`pcaK`
    * PCA subspace — SemDeDup's clustering is better-conditioned in the
    * top-variance subspace ([[Embeddings]]'s own scaladoc claim, now
    * wired): the k-means trains and assigns on pcaK-dim projections
    * (one exact-integer moment pass + a d→pcaK projection), which cuts
    * the fit/assign arithmetic by d/pcaK AND denoises the blocking
    * metric (low-variance axes contribute noise to centroid distances,
    * not signal). The in-cluster confirmation stays the EXACT
    * full-dimension cosine — conditioning changes only WHICH pairs get
    * compared, never what a duplicate means — so precision is exact by
    * construction and only recall (cluster-boundary splits) can move.
    * Output contract identical to [[semanticDedup]].
    *
    * ADVISORY (round-19 measured): the wall-clock claim does NOT hold
    * on this workload shape at any measured dimension — paired against
    * the raw-space form the ratio is 1.45 at d=64, 1.79 at d=256 and
    * 3.31 at d=768 (n≈85k, k=16). The O(n·d²/2) moment pass grows
    * QUADRATICALLY in d while the assign arithmetic it saves is only
    * O(n·iters·k·d) — linear — so widening d moves the pair AWAY from
    * parity, not toward it. Use the verb for its conditioning/recall
    * properties, or when the moment pass amortizes across many dedup
    * runs over one corpus, or at iters·k ≫ d/2 (many clusters); for
    * one-shot wall-clock, [[semanticDedup]] wins at every d measured.
    */
  def semanticDedupPca(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nClusters: Int, pcaK: Int,
      seed: Long = 42L): DataFrame = {
    if (df.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("dup_of",
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("max_cos",
            org.apache.spark.sql.types.DoubleType))))
    // clamp to the embedding dimension: past d the deflated residual
    // is numerical noise, and "components" solved from it would
    // silently degrade the k-means blocking space (the same min(·, d)
    // guard exactNearDupsBlocked applies)
    val dim = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .limit(1).collect()
      .headOption.map(_.getSeq[Any](0).length).getOrElse(pcaK)
    val k = math.min(pcaK, dim)
    val proj = Embeddings.pcaProject(df.select(col(idCol), col(vecCol)),
        idCol, vecCol, k = k, iters = 30)
      .select(col(idCol),
        array((1 to k).map(i => col(s"pc$i").cast("float")): _*).as("__pv"))
    val withProj = df.select(col(idCol), col(vecCol)).join(proj, Seq(idCol))
    val (assigned, _) = IvfIndex.fit(withProj, idCol, "__pv", nClusters, seed)
    val a = assigned.select(col("cluster"), col(idCol).as("vid_a"),
      col(vecCol).as("v_a"))
    val b = assigned.select(col("cluster"), col(idCol).as("vid_b"),
      col(vecCol).as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("vid_a") < col("vid_b"))
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .groupBy(col("vid_b").as(idCol))
      .agg(min("vid_a").as("dup_of"), max("cos").as("max_cos"))
  }

  /** SEMANTIC decontamination — the embedding-space twin of the n-gram
    * decontaminate family: flag every corpus row whose embedding is
    * `threshold`-close (exact cosine) to ANY benchmark/test-set vector.
    * Paraphrased or re-templated contamination survives the lexical
    * n-gram checks (no 13-gram overlaps) but not this one — the check
    * modern eval-hygiene pipelines run alongside the lexical pass.
    *
    * Scale shape: the benchmark side is eval-set-sized (thousands of
    * rows, never corpus-sized) so it BROADCASTS; the corpus streams
    * through one codegen'd scan scoring |tests| cosines per row with
    * the threshold applied inside the join condition — no shuffle, no
    * window, output sized by the contaminated set. Per flagged row the
    * best-matching test item is kept by a max_by partial aggregate
    * (ties → lowest test id). Exact by construction (every corpus ×
    * test pair is scored), so the oracle is an exact threshold join.
    * Returns (idCol, test_id = best match, cos = its cosine).
    */
  def semanticDecontaminate(
      corpus: DataFrame, idCol: String, vecCol: String,
      tests: DataFrame, testIdCol: String, testVecCol: String,
      threshold: Double): DataFrame = {
    val p = tests.select(col(testIdCol).as("test_id"), col(testVecCol).as("test_vec"))
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
    c.join(broadcast(p), cosine_sim(col("__cv"), col("test_vec")) >= threshold)
      .withColumn("cos", cosine_sim(col("__cv"), col("test_vec")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("test_id"), struct(col("cos"), negate(col("test_id")))).as("test_id"),
        max("cos").as("cos"))
  }

  /** Embedding near-dup via hyperplane LSH buckets + in-bucket cosine. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 12): DataFrame = {
    val bucketed = df.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplane_bucket(col("v"), nBits))
    val a = bucketed.select(col("bucket"), col("vid").as("vid_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("vid").as("vid_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vid_a") < col("vid_b"))
      .withColumn("cos", cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("vid_a", "vid_b", "cos")
      .dropDuplicates("vid_a", "vid_b")
  }

  /** Connected components over near-dup pairs → cluster id per doc
    * (large-star/small-star style label propagation, iterated to a
    * fixed point with a bounded iteration count). Used to pick one
    * representative per duplicate cluster.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) materializes the usually-expensive pair
    // lineage once AND truncates the logical plan — without it each
    // iteration nests one more level of plan, and a cache() recompute
    // after executor loss replays the full candidate pipeline per step
    val edges = materialize(pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))))
    var labels = materialize(edges.select(col("u").as("doc")).distinct()
      .withColumn("label", col("doc")))
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // (1) min-label propagation over neighbors
      val neighborMin = edges.join(labels, edges("v") === labels("doc"))
        .groupBy(col("u").as("doc2")).agg(min("label").as("nbr_label"))
      val prop = labels.join(neighborMin, labels("doc") === col("doc2"), "left_outer")
        .select(col("doc"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // (2) pointer jump (path halving): label ← label(label). Plain
      // min-propagation needs O(graph diameter) rounds — fatal on a
      // chain-shaped 100 TB cluster; halving brings it to O(log d).
      val parent = prop.select(col("doc").as("pdoc"), col("label").as("plabel"))
      val updated = materialize( // eager: one materializing job per iteration
        prop.join(parent, prop("label") === col("pdoc"), "left_outer")
          .select(prop("doc"), col("old"),
            least(prop("label"), coalesce(col("plabel"), prop("label"))).as("label")))
      // convergence probe runs over the checkpointed blocks — no plan replay
      val changed = updated.filter(col("label") =!= col("old")).count()
      labels = updated.select("doc", "label")
      converged = changed == 0
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] duplicateClusters did NOT converge in $maxIter iterations; labels may span components")
    // localCheckpoint blocks (edges + per-iteration states) are released
    // by the ContextCleaner once the returned plan stops referencing them
    labels
  }
}
