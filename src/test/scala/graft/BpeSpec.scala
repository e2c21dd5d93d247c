package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge training: hand-verified merge sequence pinning the three
  * contracts a tokenizer's consumers depend on — overlap-INCLUSIVE
  * pair statistics, greedy LEFT-TO-RIGHT non-overlapping application,
  * and the deterministic (n desc, pair asc) tie-break.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("hand corpus: overlap-inclusive counts, LTR application, tie-break, exhaustion") {
    // words: aa×2 [a,a]; ab×1 [a,b]; aaa×1 [a,a,a]; b×1 [b]
    val docs = Seq("aa aa ab", "aaa b").toDF("text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 4)
      .collect().map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("n"), r.getAs[Long]("tokens_after")))
      .sortBy(_._1).toSeq
    // round 1: (a,a) counts 2 (from aa×2) + 2 (OVERLAP-inclusive from
    //   aaa) = 4; apply LTR: aaa → [aa, a] (an RTL rewrite would give
    //   [a, aa] and change round 2's pair table). tokens: 2+2+2+1 = 7
    // round 2: (a,b)=1 ties (aa,a)=1 → lhs "a" < "aa" wins. tokens 6
    // round 3: only (aa,a)=1 → aaa fully merged. tokens 5
    // round 4: no pairs left → EXHAUSTED, only 3 rows despite nMerges=4
    assert(got === Seq(
      (1, "a", "a", 4L, 7L),
      (2, "a", "b", 1L, 6L),
      (3, "aa", "a", 1L, 5L)), s"merge sequence diverged: $got")
  }

  test("applyMerge kernel: greedy LTR rewrite exact against a reference fold, incl. a 512-char single-token word") {
    // reference implementation: the definitionally-greedy scalar loop
    def ref(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),            // odd run: [aa, a], never [a, aa]
      (Seq("a", "a", "a", "a"), "a", "a"),       // even run: [aa, aa]
      (Seq("a", "b", "a", "b"), "a", "b"),       // disjoint matches
      (Seq("x", "a", "b", "b", "a"), "a", "b"),  // interior match
      (Seq("a"), "a", "a"),                      // single symbol
      (Seq.empty[String], "a", "b"),             // empty array
      (Seq("ab", "c", "ab", "c"), "ab", "c"))    // multi-char symbols
    cases.foreach { case (syms, a, b) =>
      val got = Seq(syms).toDF("syms")
        .select(graft.operators.Bpe.applyMerge(col("syms"), a, b).as("r"))
        .head.getAs[scala.collection.Seq[String]]("r").toSeq
      assert(got === ref(syms, a, b), s"applyMerge($syms, $a, $b)")
    }
    // null elements: pass through untouched, and the OUTPUT schema
    // mirrors the child's element nullability — an unconditional
    // containsNull=false would promise codegen consumers a null-free
    // array this very row violates
    val nullDf = Seq(Seq("a", null, "a", "b", null)).toDF("syms")
      .select(graft.operators.Bpe.applyMerge(col("syms"), "a", "b").as("r"))
    val rType = nullDf.schema("r").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(rType.containsNull, "nullable input elements must stay declared")
    assert(nullDf.head.getAs[scala.collection.Seq[String]]("r").toSeq ===
      Seq("a", null, "ab", null))
    // and a null-free input (array() of literals) keeps the tight
    // containsNull=false schema
    val tight = spark.range(1)
      .select(graft.operators.Bpe.applyMerge(
        array(lit("a"), lit("b")), "a", "b").as("r"))
      .schema("r").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(!tight.containsNull)

    // the carried watch item: a no-delimiter 512-char token — one word
    // whose symbol array is corpus-length; the O(len) kernel rewrites
    // it without the quadratic accumulator copy, and the training loop
    // converges on it (9 doubling merges collapse 512 a's to 1 symbol)
    val long = "a" * 512
    val syms512 = long.map(_.toString)
    val got512 = Seq(syms512).toDF("syms")
      .select(graft.operators.Bpe.applyMerge(col("syms"), "a", "a").as("r"))
      .head.getAs[scala.collection.Seq[String]]("r").toSeq
    assert(got512 === ref(syms512, "a", "a") && got512.length === 256)
    val merges = Bpe.trainMerges(Seq(long).toDF("text"), "text", nMerges = 12)
      .collect().sortBy(_.getAs[Int]("merge_rank"))
    assert(merges.length === 9, "512 = 2^9 doubling merges then exhaustion")
    assert(merges.last.getAs[Long]("tokens_after") === 1L)
  }

  test("an all-single-symbol corpus yields zero merges; empty corpus yields zero merges") {
    val singles = Seq("a b c", "a b").toDF("text")
    assert(Bpe.trainMerges(singles, "text", nMerges = 3).count() === 0L)
    val empty = Seq.empty[String].toDF("text")
    assert(Bpe.trainMerges(empty, "text", nMerges = 3).count() === 0L)
  }

  test("encodeStats: per-doc subword totals reconcile with the training run's corpus total; merges shorten encodings") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aaa b")).toDF("doc_id", "text")
    val got = Bpe.encodeStats(docs, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"),
         r.getAs[Long]("max_word_syms"))).toMap
    // after the hand-verified 3 merges: aa→[aa], ab→[ab], aaa→[aaa], b→[b]
    assert(got === Map(1L -> ((3L, 3L, 1L)), 2L -> ((2L, 2L, 1L))), s"$got")
    // zero merges = character-level encoding: n_subwords == word lengths
    val raw = Bpe.encodeStats(docs, "doc_id", "text", nMerges = 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    assert(raw === Map(1L -> 6L, 2L -> 4L), s"$raw")
  }

  test("encodeWith: persisted artifact serves a held-out corpus; OOV words count as their character lengths, never drop") {
    // training corpus (the hand-verified 3-merge run: aa→[aa], ab→[ab],
    // aaa→[aaa], b→[b])
    val trainDocs = Seq((1L, "aa aa ab"), (2L, "aaa b")).toDF("doc_id", "text")
    val model = Tables.scratch("bpe_spec_model")
    Bpe.trainAndSave(trainDocs, "text", nMerges = 3, path = model)
    // artifact shape: ranked merges + final symbol table, both readable
    val merges = spark.read.parquet(model + "/merges")
    assert(merges.count() === 3L)
    // serve a corpus the tokenizer never saw: "aa" in-vocab (1 symbol),
    // "zq" (len 2) and "xyz" (len 3) OOV → character-length fallback
    val serve = Seq((9L, "aa zq xyz")).toDF("doc_id", "text")
    val got = Bpe.encodeWith(spark, model, serve, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"),
        r.getAs[Long]("max_word_syms"), r.getAs[Long]("n_oov")))
    assert(got.toSeq === Seq((3L, 6L, 3L, 2L)),
      s"OOV fallback diverged: ${got.toSeq}")
    // an all-OOV doc still encodes (the inner-join formulation would
    // silently emit nothing for it)
    val allOov = Seq((10L, "zz qq")).toDF("doc_id", "text")
    val oovRow = Bpe.encodeWith(spark, model, allOov, "doc_id", "text").collect()
    assert(oovRow.length === 1 && oovRow(0).getAs[Long]("n_subwords") === 4L &&
      oovRow(0).getAs[Long]("n_oov") === 2L)
  }

  test("real corpus: tokens_after strictly decreases and merged symbols compose from earlier ranks") {
    val docs = Tables(spark, sf, "documents")
    val rows = Bpe.trainMerges(docs, "text", nMerges = 5)
      .orderBy("merge_rank").collect()
    assert(rows.length === 5)
    val tokens = rows.map(_.getAs[Long]("tokens_after"))
    assert(tokens.zip(tokens.tail).forall { case (a, b) => b < a },
      s"compression curve not strictly decreasing: ${tokens.toSeq}")
    // every merge operand is either a single char or a previously
    // produced symbol (the merge-table well-formedness invariant a
    // tokenizer loader checks)
    val produced = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      Seq(r.getAs[String]("lhs"), r.getAs[String]("rhs")).foreach { s =>
        assert(s.length == 1 || produced(s),
          s"operand '$s' at rank ${r.getAs[Int]("merge_rank")} never produced")
      }
      produced += r.getAs[String]("lhs") + r.getAs[String]("rhs")
    }
    // counts are non-increasing in rank ONLY within same-composition
    // classes in general, but the corpus must give positive counts
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }
}
