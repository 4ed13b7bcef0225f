package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.operators._

/** Degenerate-input robustness: operators must return empty results
  * (not throw) on empty tables — at 100 TB some partition, date slice,
  * or tenant will always be empty.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val dir = {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
    tempSfDir(
      "documents" -> spark.createDataFrame(new java.util.ArrayList[Row](), docSchema),
      "events" -> spark.createDataFrame(new java.util.ArrayList[Row](), evSchema),
      "embeddings" -> spark.createDataFrame(new java.util.ArrayList[Row](), embSchema))
  }

  test("text/dedup operators return empty on an empty corpus") {
    assert(Dedup.exact(spark, dir).count() === 0)
    assert(Dedup.ngramJaccard(spark, dir).count() === 0)
    assert(Dedup.jaccardPrefix(spark, dir).count() === 0)
    assert(Dedup.minhashLsh(spark, dir).count() === 0)
    assert(Chunking.words(spark, dir).count() === 0)
    assert(TextAnalysis.repetition(spark, dir).count() === 0)
    assert(TextAnalysis.winnow(spark, dir).count() === 0)
    assert(KeywordSearch.bm25(spark, dir).count() === 0)
  }

  test("event operators return empty on an empty stream") {
    assert(Events.sessionize(spark, dir).count() === 0)
    assert(Events.hourly(spark, dir).count() === 0)
    assert(Analytics.zscoreOutliers(spark, dir).count() === 0)
    assert(Analytics.funnel(spark, dir).count() === 0)
  }

  test("vector operators return empty on an empty embedding table") {
    assert(Ann.bruteForce(spark, dir).count() === 0)
    assert(Dedup.embeddingNearDup(spark, dir).count() === 0)
    assert(Dedup.embeddingNearDupLsh(spark, dir).count() === 0)
    assert(SemanticSearch.docVectors(spark, dir).count() === 0)
  }

  test("round-3 operators return empty on empty tables") {
    assert(Dedup.chunkDedup(spark, dir).count() === 0)
    assert(Dedup.docDupFraction(spark, dir).count() === 0)
    assert(Dedup.containment(spark, dir).count() === 0)
    assert(Dedup.pagerank(spark, dir).count() === 0)
    assert(TextAnalysis.tfidfTopk(spark, dir).count() === 0)
    assert(TextAnalysis.cooccurPmi(spark, dir).count() === 0)
    assert(TextAnalysis.unigramLogprob(spark, dir).count() === 0)
    assert(Analytics.madOutliers(spark, dir).count() === 0)
    assert(Analytics.eventTransitions(spark, dir).count() === 0)
    assert(Analytics.slidingCounts(spark, dir).count() === 0)
    assert(Analytics.dauWau(spark, dir).count() === 0)
    assert(Analytics.gapfillHourly(spark, dir).count() === 0)
    assert(Ann.kmeansStep(spark, dir).count() === 0)
    assert(Ann.pq(spark, dir).count() === 0)
    assert(Ann.pqRefine(spark, dir).count() === 0)
  }

  test("round-11 operators are safe on empty tables") {
    assert(TextAnalysis.gopherQuality(spark, dir).count() === 0)
    assert(TextAnalysis.bpePairs(spark, dir).count() === 0)
    assert(TextAnalysis.dsirWeights(spark, dir).count() === 0)
    assert(TextAnalysis.ccnetBuckets(spark, dir).count() === 0)
    assert(Ann.pcaPowerStep(spark, dir).count() === 0)
    assert(Ann.knnOutliers(spark, dir).count() === 0)
    assert(TextAnalysis.oovRate(spark, dir).count() === 0)
    assert(Ann.driftSplit(spark, dir).count() === 0)
    assert(Ann.pcaIterate(spark, dir).count() === 0)
    assert(TextAnalysis.shardPlan(spark, dir).count() === 0)
  }

  test("round-12 operators are safe on empty tables") {
    assert(TextAnalysis.bpeMergeSteps(spark, dir).count() === 0)
    assert(TextAnalysis.topNgramFrac(spark, dir).count() === 0)
    assert(Ann.semanticDedup(spark, dir).count() === 0)
    assert(Multimodal.decodeStats(spark, dir).count() === 0)
    assert(Analytics.streaks(spark, dir).count() === 0)
    assert(TextAnalysis.jsdDrift(spark, dir).count() === 0)
    assert(Ann.kcenterSample(spark, dir).count() === 0)
    assert(Dedup.splitAssign(spark, dir).count() === 0)
    assert(Ann.isotropy(spark, dir).count() === 0)
    assert(TextAnalysis.heapsLaw(spark, dir).count() === 0)
  }

  test("round-5 operators are safe on empty tables") {
    assert(Events.attribution(spark, dir).count() === 0)
    assert(TextAnalysis.samplePerKey(spark, dir).count() === 0)
    // a count aggregate over an empty graph yields one zero row
    assert(Dedup.triangles(spark, dir).head().getLong(0) === 0L)
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType)))
    val partDir = tempSfDir(
      "part" -> spark.createDataFrame(new java.util.ArrayList[Row](), partSchema))
    assert(Dedup.fuzzyNames(spark, partDir).count() === 0)
  }

  test("round-6 operators are safe on empty tables") {
    assert(Ann.rangeSearch(spark, dir).count() === 0)
    assert(Ann.maxSim(spark, dir).count() === 0)
    assert(Ann.normOutliers(spark, dir).count() === 0)
    assert(Dedup.lshStats(spark, dir).count() === 0)
    assert(TextAnalysis.entropy(spark, dir).count() === 0)
    assert(TextAnalysis.lengthHistogram(spark, dir).count() === 0)
  }

  test("round-6 second-session operators are safe on empty tables") {
    assert(TextAnalysis.decontamBloom(spark, dir).count() === 0)
    assert(TextAnalysis.contamFraction(spark, dir).count() === 0)
    assert(TextAnalysis.moreLikeThis(spark, dir).count() === 0)
    assert(TextAnalysis.zipfSlope(spark, dir).count() === 0)
    assert(TextAnalysis.mixReport(spark, dir).count() === 0)
    assert(TextAnalysis.readability(spark, dir).count() === 0)
    assert(TextAnalysis.ttr(spark, dir).count() === 0)
    assert(Chunking.budgetPack(spark, dir).count() === 0)
    assert(Ann.binarySearch(spark, dir).count() === 0)
    assert(Ann.dimStats(spark, dir).count() === 0)
    assert(Dedup.incremental(spark, dir).count() === 0)
    assert(Analytics.ewmaHourly(spark, dir).count() === 0)
    assert(Analytics.typeOverlap(spark, dir).count() === 0)
    assert(Analytics.rfm(spark, dir).count() === 0)
    assert(Events.sessionStats(spark, dir).count() === 0)
  }

  test("round-8 operators are safe on empty tables") {
    assert(Ann.hnswLevels(spark, dir).count() === 0)
    assert(Ann.hnswLayerHistogram(spark, dir).count() === 0)
    assert(Ann.hnswGraph(spark, dir).count() === 0)
    assert(Ann.nswCellStats(spark, dir).count() === 0)
  }

  test("round-13 operators are safe on empty tables") {
    assert(Ann.nswGraphSharded(spark, dir).count() === 0)
    assert(Dedup.lshRecallEval(spark, dir).collect().head.getLong(0) === 0L)
    assert(Ann.recallSweep(spark, dir).collect().forall(_.getLong(2) === 0L))
    assert(Ann.matryoshkaEval(spark, dir).collect().forall(_.getLong(2) === 0L))
    assert(Ann.pqRecallEval(spark, dir).collect().forall(_.getLong(2) === 0L))
    assert(Dedup.clusterPurity(spark, dir).count() === 0)
  }

  test("round-14 operators are safe on empty tables") {
    assert(Ann.graphSearch(spark, dir).count() === 0)
    // recall on zero queries: a single all-zero report row, no div-by-0 throw
    val rec = Ann.graphSearchRecall(spark, dir).collect()
    assert(rec.length === 1 && rec.head.getLong(2) === 0L)
    assert(Ann.nswGraphInsert(spark, dir).count() === 0)
    assert(TextAnalysis.bpeApply(spark, dir).count() === 0)
    assert(Multimodal.phashPairsQuery(spark, dir).count() === 0)
    assert(TextAnalysis.tfidfCosineCandidates(spark, dir).count() === 0)
    // wave-2 serving ops: empty corpus → empty result / all-zero report
    assert(Ann.hnswSearch(spark, dir).count() === 0)
    val hrec = Ann.hnswSearchRecall(spark, dir).collect()
    assert(hrec.length === 1 && hrec.head.getLong(2) === 0L)
    assert(Ann.graphSearchInt8(spark, dir).count() === 0)
    assert(Ann.graphSearchFiltered(spark, dir).count() === 0)
    // the r15 selectivity CURVE: one all-zero row per selectivity point
    val frec = Ann.graphSearchFilteredRecall(spark, dir).collect()
    assert(frec.length === Ann.FilterCurveMods.length)
    assert(frec.forall(_.getLong(4) === 0L), "n_overlap must be 0 on an empty corpus")
    assert(Ann.graphSearchFromGen(spark, dir).count() === 0)
  }

  test("round-15 operators are safe on empty tables") {
    assert(Ann.hnswGraphInsert(spark, dir).count() === 0)
    assert(graft.operators.KeywordSearch.hybridRrfGraph(spark, dir).count() === 0)
  }

  test("round-19 operators are safe on empty tables") {
    assert(Ann.nswGraphDeduped(spark, dir).count() === 0)
    val conn = Ann.graphConnectivityDeduped(spark, dir).collect()
    assert(conn.length === Ann.GraphConnRounds + 1)
    assert(conn.forall(r => r.getLong(1) === 0L && r.getLong(3) === 0L),
      "empty corpus: deduped census reports zero reach, no div-by-zero")
    assert(Ann.dedupCanonMap(spark, dir).count() === 0)
    assert(Ann.dedupCanonWeights(spark, dir).count() === 0)
    assert(Ann.graphSearchDeduped(spark, dir).count() === 0)
  }

  test("round-20 operators are safe on empty tables") {
    assert(Ann.hnswGraphDeduped(spark, dir).count() === 0)
    val conn = Ann.hnswConnectivityDeduped(spark, dir).collect()
    assert(conn.length === Ann.GraphConnRounds + 1)
    assert(conn.forall(r => r.getLong(1) === 0L && r.getLong(3) === 0L),
      "empty corpus: layered deduped census reports zero reach, no div-by-zero")
    assert(Ann.hnswSearchDeduped(spark, dir).count() === 0)
  }

  test("round-18 operators are safe on empty tables") {
    assert(Dedup.decontaminate(spark, dir).count() === 0)
    assert(TextAnalysis.curriculumInterleave(spark, dir).count() === 0)
    // connectivity census on an empty corpus: one row per round with
    // zero reach and zero micros (guarded divisor — ANSI mode would
    // otherwise throw DIVIDE_BY_ZERO on the 0-total corpus)
    val conn = Ann.graphConnectivity(spark, dir).collect()
    assert(conn.length === Ann.GraphConnRounds + 1)
    assert(conn.forall(r => r.getLong(1) === 0L && r.getLong(3) === 0L),
      "reach and micros must be 0 on an empty corpus")
  }
}
