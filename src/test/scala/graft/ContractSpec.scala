package graft

/** Driver-contract consistency: every oracle key must name a registered
  * query, rows-only keys are the expected set, and the flagship entry
  * returns rows on the smoke scale factor.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("rows-only queries are exactly the documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("multimodal_meta", "events_approx_stats", "text_topk_approx",
      "text_decontam_bloom", "events_dau_wau_hll",
      "doc_point_ids_sha3")) // sha3 unavailable in DuckDB; fixture-spec'd instead
  }

  test("entry (flagship search pipeline) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, fn) =>
      fn(spark, "/root/testdata/sf0.001").isEmpty
    }.map(_._1)
    // candidate-pair queries may legitimately be empty at tiny SF —
    // everything else must produce rows
    val allowedEmpty = Set("dedup_ngram_jaccard", "dedup_jaccard_prefix",
      "dedup_minhash_lsh", "dedup_minhash_est", "dedup_simhash_pairs",
      "dedup_embedding", "q_antijoin")
    assert((empty.toSet -- allowedEmpty).isEmpty,
      s"unexpectedly empty at sf0.001: ${empty.toSet -- allowedEmpty}")
  }
}
