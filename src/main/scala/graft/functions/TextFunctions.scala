package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for corpus pipelines (SURVEY §2.B.9):
  * language-ID heuristic, quality scoring, token counting. Built purely
  * from codegen'd built-in functions so every derived query is
  * SQL-expressible (and DuckDB-oracle-checkable) — no UDFs.
  */
object TextFunctions {

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword token estimate: word-piece matches of letter runs,
    * digit runs, and single punctuation — the classic GPT-2-style
    * pre-tokenizer shape approximated with one regexp scan.
    */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^\\w\\s]", ""))).cast("double")
          / length(text).cast("double"))

  /** Stopword hit ratio against a small embedded English stopword list. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\W+"), t => length(t) > 0)
    val hits = size(filter(toks, t => t.isin(EnStopwords.map(lit): _*)))
    when(size(toks) === 0, 0.0)
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length band + low punctuation +
    * mean word length sanity. Deterministic, SQL-twin-able.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = when(length(text).between(100, 10000), 1.0)
      .when(length(text) < 100, length(text).cast("double") / 100.0)
      .otherwise(0.5)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val words = wordCount(text)
    val meanWordLen = when(words === 0, 0.0)
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / words.cast("double"))
    val wordScore = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    round((lenScore + punctScore + wordScore) / 3.0, 6)
  }

  /** Structural-CSE quality report: every text scan (punct strip,
    * tokenize, whitespace split, space strip) runs EXACTLY once in a
    * lower projection, and all ratios/scores derive from the
    * materialized counts. Semantically identical to composing
    * punctRatio/stopwordRatio/qualityScore in one projection, but the
    * composite form re-evaluates the regexp scans per reference —
    * subexpression elimination does not reach across when/HOF branches,
    * so on a wide corpus the single-projection form costs ~4× more.
    */
  def qualityReport(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    df.select(
        col(idCol),
        length(text).as("n_chars_actual"),
        length(regexp_replace(text, "[^\\w\\s]", "")).as("__n_keep"),
        filter(split(lower(text), "\\W+"), t => length(t) > 0).as("__toks"),
        size(filter(split(text, "\\s+"), t => length(t) > 0)).as("__n_words"),
        length(regexp_replace(text, "\\s+", "")).as("__n_nospace"))
      .withColumn("punct_ratio",
        when(col("n_chars_actual") === 0, 0.0)
          .otherwise((col("n_chars_actual") - col("__n_keep")).cast("double")
            / col("n_chars_actual").cast("double")))
      .withColumn("stop_ratio",
        when(size(col("__toks")) === 0, 0.0)
          .otherwise(
            size(filter(col("__toks"), t => t.isin(EnStopwords.map(lit): _*))).cast("double")
              / size(col("__toks")).cast("double")))
      .withColumn("quality", {
        val lenScore = when(col("n_chars_actual").between(100, 10000), 1.0)
          .when(col("n_chars_actual") < 100, col("n_chars_actual").cast("double") / 100.0)
          .otherwise(0.5)
        val punctScore = greatest(lit(0.0), lit(1.0) - col("punct_ratio") * 5.0)
        val meanWordLen = when(col("__n_words") === 0, 0.0)
          .otherwise(col("__n_nospace").cast("double") / col("__n_words").cast("double"))
        val wordScore = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
        round((lenScore + punctScore + wordScore) / 3.0, 6)
      })
      .select(idCol, "n_chars_actual", "punct_ratio", "stop_ratio", "quality")
  }

  /** Heuristic language ID: CJK codepoints → zh; else highest stopword
    * hit count among small per-language function-word lists; 'und' when
    * nothing matches. Deliberately simple and deterministic.
    */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    def hits(words: Seq[String]): Column =
      size(filter(split(lowered, "\\W+"), t => t.isin(words.map(lit): _*)))
    val en = hits(Seq("the", "and", "of", "is", "to"))
    val es = hits(Seq("el", "la", "los", "que", "y"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val top = greatest(en, es, fr, de)
    when(lowered.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(top === 0, "und")
      .when(en === top, "en")
      .when(de === top, "de")
      .when(fr === top, "fr")
      .otherwise("es")
  }
}
