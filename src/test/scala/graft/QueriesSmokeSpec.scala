package graft

/** Every declared query runs end-to-end at sf0.001 (schemas resolve,
  * plans execute); known-nonempty queries return rows. The value-level
  * gate is the DuckDB oracle (Verify + scripts/check.py), not this.
  */
class QueriesSmokeSpec extends SparkSuite {

  private val mayBeEmpty = Set(
    "q_except", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding",
    "q_join_anti", "q_text_ngram_jaccard")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows for the driver smoke check") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
