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
      "doc_point_ids_sha3", // sha3 unavailable in DuckDB; fixture-spec'd instead
      "multimodal_decode", // SQL engines can't decode PNG; fixture-spec'd instead
      "multimodal_phash", // same: real decode inside; aHash + pairs spec'd
      "multimodal_phash_pairs")) // same: end-to-end pair query, spec-recomputed
  }

  test("dedup_embedding's exact oracle is valid at every verify scale") {
    // dedup_embedding auto-routes to LSH above embeddingRouteThreshold
    // vectors; LSH output is a recall<1 SUBSET of the exact all-pairs
    // answer, so the registered exact DuckDB oracle is only sound while
    // verify corpora stay below the threshold. If the driver's verify
    // scale ever grows past it, this must fail LOUDLY here rather than
    // surface as an unexplained hash mismatch (or worse, pass by luck).
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val n = Graft.tableRows(spark, s"/root/testdata/$sf", "embeddings")
      assert(n <= graft.operators.Dedup.embeddingRouteThreshold,
        s"$sf embeddings corpus ($n vectors) crossed the exact-vs-LSH route " +
          "threshold: dedup_embedding now returns the LSH subset and its exact " +
          "all-pairs oracle is invalid — split the registered query into exact " +
          "(oracle) and auto (rows-only) entries")
    }
  }

  test("dedup_embedding LSH route is an exact-precision subset of the exact route") {
    // both routes share the exact-cosine >= tau verify, so every LSH
    // pair must appear in the exact answer with an identical cosine
    // (precision 1 by construction). Recall is NOT 1 at the registered
    // tau: SRP band recall is ~0.95 only at dup-grade cosines (>= 0.9);
    // at this corpus's loose tau = 0.35 the surviving pairs sit at
    // cos 0.35-0.45 where 4 bands of 4 bits recall ~0.2-0.45 —
    // measured 3/14 here. That is exactly why the auto-route threshold
    // is a loud ContractSpec-pinned constant: above it the answer is a
    // subset, which an exact oracle must never be asked to verify.
    val dir = "/root/testdata/sf0.001"
    val exact = graft.operators.Dedup.embeddingNearDup(spark, dir)
      .collect().map(_.toSeq).toSet
    val lsh = graft.operators.Dedup.embeddingNearDupLsh(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty, "spec corpus yields no near-dup pairs at tau")
    assert(lsh.nonEmpty, "LSH route recalled nothing at tau")
    assert(lsh.subsetOf(exact),
      s"LSH route invented pairs outside the exact answer: ${lsh -- exact}")
    info(s"LSH recall at tau=0.35 on this corpus: ${lsh.size}/${exact.size}")
  }

  test("NSW/HNSW centroid broadcast refuses past the named budget") {
    import graft.operators.Ann
    // the curve: √N x ~300 B. Every corpus that broadcasts under the
    // 64 MiB budget must pass...
    Ann.requireCentroidBudget(Ann.sqrtFanout(1000L * 1000 * 1000), "spec") // 10^9: ~9.5 MB
    // ...and a 10^11-vector flat build (~95 MB) must refuse LOUDLY with
    // the retune path in the message, never driver-OOM downstream
    val e = intercept[IllegalArgumentException] {
      Ann.requireCentroidBudget(Ann.sqrtFanout(100L * 1000 * 1000 * 1000), "spec")
    }
    assert(e.getMessage.contains("ann_nsw_cell_stats"),
      s"refusal must point at the occupancy report for retuning: ${e.getMessage}")
    // the layered build stacks ~2x the flat fanout, so its refusal
    // threshold sits ~4x lower in N
    intercept[IllegalArgumentException] {
      Ann.requireCentroidBudget(2L * Ann.sqrtFanout(30L * 1000 * 1000 * 1000), "spec")
    }
    // budget must not creep: the contract is bytes, not a row count
    assert(Ann.sqrtFanout(1000000L) * Ann.centroidRowBytes < Ann.centroidBroadcastBudgetBytes)
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
