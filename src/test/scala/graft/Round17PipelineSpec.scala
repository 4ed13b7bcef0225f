package graft

import graft.operators.{Ann, Dedup, Reranker, TextAnalysis}

/** Round-17 training-pipeline additions: exhaustive duplicated-substring
  * detection (the ExactSubstr pass) and greedy training-sequence packing.
  * Both are pinned on a planted corpus where the expected output is
  * computable by hand, plus corpus-level invariants on the test data.
  */
class Round17PipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docsFrame(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "cast(length(text) as bigint) AS n_chars")
  }

  test("dedup_substring counts planted duplicated spans exactly") {
    // shared: an 8-token span present verbatim in docs 0 and 1 (offset
    // differs); doc 2 is disjoint. k=8 grams: doc0 has 10-8+1=3
    // positions of which exactly 1 (the planted span) recurs cross-doc;
    // doc1 has 9-8+1=2 positions, 1 duplicated; doc2: 8 positions at
    // len 15, 0 duplicated.
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val corpus = docsFrame(Seq(
      0L -> s"alpha beta $span",
      1L -> s"$span gamma",
      2L -> (1 to 15).map(i => s"uniq$i").mkString(" ")))
    val d = tempSfDir("documents" -> corpus)
    val got = Dedup.substringDup(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((3L, 1L, 333333L)),
      1L -> ((2L, 1L, 500000L)),
      2L -> ((8L, 0L, 0L))))
  }

  test("dedup_substring_cut removes planted spans, keeps the canonical occurrence") {
    // docs 0 and 1 share an 8-token span; the keeper is doc 0's
    // occurrence (min (doc_id, pos)), so doc 0 keeps everything and
    // doc 1 loses exactly the span's 8 tokens; doc 2 is untouched.
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val corpus = docsFrame(Seq(
      0L -> s"alpha beta $span",
      1L -> s"$span gamma tail",
      2L -> (1 to 15).map(i => s"uniq$i").mkString(" ")))
    val d = tempSfDir("documents" -> corpus)
    val got = Dedup.substringCut(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(0L) === ((10L, 0L, s"alpha beta $span")))
    assert(got(1L) === ((10L, 8L, "gamma tail")))
    assert(got(2L) === ((15L, 0L, (1 to 15).map(i => s"uniq$i").mkString(" "))))
  }

  test("dedup_substring_cut drops a fully duplicated non-canonical document") {
    // doc 1 IS doc 0 verbatim: every position duplicates, doc 0's
    // occurrences are all keepers, doc 1 loses every token and drops
    // out of the output — the dedup decision as a rewrite
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = tempSfDir("documents" -> docsFrame(Seq(0L -> text, 1L -> text)))
    val got = Dedup.substringCut(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === Map(0L -> ((12L, 0L, text))))
  }

  test("dedup_substring has cross-doc signal on the corpus and bounds hold") {
    val rows = Dedup.substringDup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup) = (r.getLong(1), r.getLong(2))
      assert(dup >= 0L && dup <= n, s"doc ${r.getLong(0)}: n_dup $dup outside [0, $n]")
    }
    assert(rows.map(_.getLong(2)).sum > 0L,
      "test corpus plants near-duplicates but no duplicated 8-gram position was found")
  }

  test("pack_sequences matches a hand-rolled greedy packer on a planted corpus") {
    // one shard (doc_ids all ≡ 1 mod 8), budget 256; token counts
    // 100, 100, 100, 300, 50: greedy → seq0 = {100, 100}, seq1 = {100},
    // (300 overflows alone) seq1 gets 100 then 300 overflows → seq2 =
    // {300}, seq3 = {50}.
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val corpus = docsFrame(Seq(
      1L -> words(100), 9L -> words(100), 17L -> words(100),
      25L -> words(300), 33L -> words(50)))
    val d = tempSfDir("documents" -> corpus)
    val got = TextAnalysis.packSequences(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      (1L, 0L) -> ((2L, 200L, 1L)),
      (1L, 1L) -> ((1L, 100L, 17L)),
      (1L, 2L) -> ((1L, 300L, 25L)),
      (1L, 3L) -> ((1L, 50L, 33L))))
  }

  test("pack_sequences partitions the corpus exactly once within budget") {
    val out = TextAnalysis.packSequences(spark, dir).collect()
    val nDocs = Graft.documents(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === nDocs,
      "every document must land in exactly one training sequence")
    out.filter(_.getLong(2) > 1L).foreach { r =>
      assert(r.getLong(3) <= 256L,
        s"multi-doc sequence (${r.getLong(0)}, ${r.getLong(1)}) exceeds the token budget")
    }
    // greedy never leaves a sequence so empty that the NEXT sequence's
    // whole load would have fit (weak but partitioning-independent)
    assert(out.forall(_.getLong(2) >= 1L))
  }

  test("rerank scorePairs is batch-boundary independent and honors the batch cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cands = (0L until 37L).map(i =>
      (i, "data model results", s"passage $i " + (if (i % 3 == 0) "data model" else "other")))
      .toDF("id", "query", "passage")
    def run(bs: Int): Map[Long, Double] = {
      // recording scorer: counts pairs per invocation via an exception
      // on violation (assertions can't cross executors; require can)
      val capped: Reranker.BatchScorer = pairs => {
        require(pairs.size <= bs, s"scorer saw ${pairs.size} pairs > batch $bs")
        Reranker.lexicalStandIn(pairs)
      }
      Reranker.scorePairs(spark, cands, capped, bs)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val ref = run(1)
    assert(ref.size === 37)
    assert(run(7) === ref, "batchSize 7 changed the scores")
    assert(run(1000) === ref, "one big batch changed the scores")
  }

  test("rerank reorders bm25 candidates by cross-scorer relevance") {
    // doc 1: four query terms, tf=2 each, very short (wins BM25 via tf
    // + length normalization); doc 2: ALL FIVE terms once, heavily
    // diluted (wins the cross scorer's coverage) — the rerank stage
    // must put doc 2 first even though bm25 put doc 1 first
    val corpus = docsFrame(Seq(
      1L -> "data model results analysis data model results analysis",
      2L -> ("data model results analysis method " +
        (1 to 40).map(i => s"pad$i").mkString(" ")),
      3L -> (1 to 20).map(i => s"noise$i").mkString(" ")))
    val d = tempSfDir("documents" -> corpus)
    val bm25Order = graft.operators.KeywordSearch.bm25(spark, d, 3).collect().map(_.getLong(0))
    assert(bm25Order.head === 1L,
      s"planted corpus must have bm25 prefer the compact high-tf doc, got ${bm25Order.toSeq}")
    val out = Reranker.rerankBm25(spark, d, k = 3, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.head._1 === 2L, s"full-coverage doc must rerank first, got ${out.toSeq}")
    assert(out.head._2 === 1000000L)
    assert(out(1) === ((1L, 800000L)), s"4/5-coverage doc must rank second, got ${out.toSeq}")
  }

  test("centroid pruning never alters a surviving candidate's MaxSim score") {
    // the PLAID contract: pruning selects WHICH label groups get scored,
    // but a candidate's score is the exact MaxSim over all its vectors —
    // so every pruned-result row must appear in the brute-force ranking
    // with an identical score
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val full = scores(Ann.maxSim(spark, dir, k = 1000))
    val pruned = scores(Ann.maxSimPruned(spark, dir, k = 1000))
    assert(pruned.nonEmpty)
    pruned.foreach { case (label, micros) =>
      assert(full.get(label).contains(micros),
        s"label $label scored $micros pruned vs ${full.get(label)} brute-force")
    }
    info(s"${pruned.size}/${full.size} label groups survived pruning, " +
      "all surviving scores identical to brute force")
  }
}
