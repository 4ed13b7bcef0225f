package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-6 wave 2: dedup post-processing (cluster-size histogram,
  * canonical member selection), langid confusion matrix, and the two
  * search-results operators (facets, diversified top-k).
  */
class CurationSearchOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("clusterSizes histogram accounts for every document exactly once") {
    val nDocs = Graft.documents(spark, dir).count()
    val covered = Dedup.clusterSizes(spark, dir)
      .agg(sum(col("cluster_size") * col("n_clusters"))).head().getLong(0)
    assert(covered === nDocs)
  }

  test("canonical picks the longest member (ties -> min doc_id) of its own cluster") {
    val canon = Dedup.canonical(spark, dir)
    val clusters = Dedup.clusters(spark, dir)
    // every canonical_id is a member of the cluster it represents
    val misOwned = canon.join(clusters,
        canon("canonical_id") === clusters("doc_id") &&
          canon("cluster_rep") === clusters("cluster_rep"), "left_anti")
    assert(misOwned.isEmpty, "canonical_id must belong to its cluster")
    // no member of any cluster strictly beats its canonical (longer, or
    // equal-length with a smaller id)
    val beaten = clusters
      .join(Graft.documents(spark, dir).select(col("doc_id").as("d_id"), col("n_chars")),
        col("doc_id") === col("d_id"))
      .join(canon.select(col("cluster_rep").as("c_rep"), col("canonical_id"),
          col("canonical_chars")),
        col("cluster_rep") === col("c_rep"))
      .filter(col("n_chars") > col("canonical_chars") ||
        (col("n_chars") === col("canonical_chars") && col("doc_id") < col("canonical_id")))
    assert(beaten.isEmpty)
    // membership counts partition the corpus
    assert(canon.agg(sum(col("n_docs"))).head().getLong(0) ===
      Graft.documents(spark, dir).count())
  }

  test("langidConfusion marginals match the per-doc langid output") {
    val conf = TextAnalysis.langidConfusion(spark, dir)
    val direct = TextAnalysis.langid(spark, dir)
      .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n_docs"))
    assert(conf.exceptAll(direct).isEmpty && direct.exceptAll(conf).isEmpty)
    assert(conf.agg(sum(col("n_docs"))).head().getLong(0) ===
      Graft.documents(spark, dir).count())
  }

  test("facets partition the BM25 result page") {
    val page = KeywordSearch.bm25(spark, dir, 50)
    val facets = KeywordSearch.facets(spark, dir, 50)
    assert(facets.agg(sum(col("n_docs"))).head().getLong(0) === page.count())
    // best_bm25 over all facets is the page's best score
    val best = facets.agg(max(col("best_bm25"))).head().getDouble(0)
    assert(best === page.agg(max(col("bm25"))).head().getDouble(0))
  }

  test("bigramLogprob scores every multi-token doc with a non-negative NLL") {
    val got = TextAnalysis.bigramLogprob(spark, dir)
    val eligible = Graft.documents(spark, dir)
      .filter(size(split(lower(col("text")), "\\s+")) >= 2).count()
    assert(got.count() === eligible)
    assert(got.filter(col("nll_per_bigram_micros") < 0).isEmpty,
      "MLE bigram probs are <= 1, so NLL must be >= 0")
    assert(got.filter(col("n_bigrams") < 1).isEmpty)
  }

  test("lengthPercentiles picks real per-source values with p50 <= p90") {
    val got = TextAnalysis.lengthPercentiles(spark, dir)
    assert(got.agg(sum(col("n_docs"))).head().getLong(0) ===
      Graft.documents(spark, dir).count())
    assert(got.filter(col("p50_chars") > col("p90_chars")).isEmpty)
    // each percentile is an actual document length of its source
    val misP50 = got.join(Graft.documents(spark, dir),
      Seq("source"), "inner")
      .groupBy(col("source"), col("p50_chars"))
      .agg(max(when(col("n_chars") === col("p50_chars"), 1).otherwise(0)).as("hit"))
      .filter(col("hit") === 0)
    assert(misP50.isEmpty)
  }

  test("winnowPairs respects the share threshold and id ordering") {
    val got = Dedup.winnowPairs(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 10L)
    }
  }

  test("revenueSlope matches a driver-side OLS recomputation") {
    val months = Graft.lineitem(spark, dir)
      .groupBy(((year(col("l_shipdate")) - 1990) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("x"))
      .agg((sum(expr("cast(round(l_extendedprice * 100) as bigint)" +
        " * (100 - cast(round(l_discount * 100) as bigint))")) / 10000).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = months.length.toLong
    val sx = months.map(_._1).sum; val sy = months.map(_._2).sum
    val sxx = months.map(m => m._1 * m._1).sum
    val sxy = months.map(m => m._1 * m._2).sum
    val expected = (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx)
    val row = Relational.revenueSlope(spark, dir).head()
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === expected)
  }

  test("ivfPq results are PQ-scored members of the probed cluster") {
    val got = Ann.ivfPq(spark, dir, 5).collect()
    assert(got.nonEmpty)
    // every result must come from the query's own IVF cluster
    val clusterIds = Ann.ivf(spark, dir, Int.MaxValue).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    got.foreach(r => assert(clusterIds.contains(r.getLong(0))))
    // ADC scores agree with the full-corpus PQ scoring for those vectors
    val pqScores = Ann.pq(spark, dir, Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(1) === pqScores(r.getLong(0))))
  }

  test("yearlyGrowth lags within nation and rescales in integer space") {
    val got = Relational.yearlyGrowth(spark, dir)
    // no first-year rows survive, and growth is exactly reproducible from
    // the revenue columns of consecutive rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nation")).orderBy(col("o_year"))
    val recheck = got
      .withColumn("next_rev", lead(col("revenue_e4"), 1).over(w))
      .withColumn("next_growth", lead(col("growth_micros"), 1).over(w))
      .withColumn("next_year", lead(col("o_year"), 1).over(w))
      .filter(col("next_rev").isNotNull && col("next_year") === col("o_year") + 1)
      .filter(col("next_growth") =!=
        expr("""(next_rev div 10000 - revenue_e4 div 10000) * 1000000
               | div greatest(revenue_e4 div 10000, 1)""".stripMargin))
    assert(recheck.isEmpty)
    assert(got.count() > 0)
  }

  test("diverseTopK returns distinct documents ranked by their best chunk") {
    val got = SemanticSearch.diverseTopK(spark, dir, 5).collect()
    assert(got.map(_.getInt(0)).distinct.length === got.length,
      "each label may take at most one slot")
    // scores must be non-increasing and each equal to that label's max
    val scores = got.map(_.getDouble(2))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val maxPerLabel = SemanticSearch.topChunksPerDoc(spark, dir, 1)
      .select(col("label"), col("chunk_score")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(2) === maxPerLabel(r.getInt(0))))
  }
}
