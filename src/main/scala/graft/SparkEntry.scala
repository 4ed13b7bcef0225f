package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SemanticSearch.searchPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference surface: chunking + semantic search
    "chunk_sentences" -> (Chunking.sentences _),
    "chunk_paragraphs" -> (Chunking.paragraphs _),
    "chunk_words" -> (Chunking.words _),
    "chunk_fixed" -> ((s: SparkSession, d: String) => Chunking.fixedWindows(s, d)),
    "strip_citations" -> (Chunking.stripCitations _),
    "doc_point_ids" -> (Chunking.pointIds _),
    "doc_embed_meanpool" -> (SemanticSearch.meanPoolPositional _),
    "topk_docs_cosine" -> ((s: SparkSession, d: String) => SemanticSearch.topDocs(s, d)),
    "topk_chunks_filtered" -> ((s: SparkSession, d: String) => SemanticSearch.topChunksPerDoc(s, d)),
    "topk_chunks_plan" -> ((s: SparkSession, d: String) => SemanticSearch.topChunksPerDocPlan(s, d)),
    "highlight_window" -> (SemanticSearch.highlightWindow _),
    "search_pipeline" -> (SemanticSearch.searchPipeline _),
    // multimodal plumbing (rows-only: no SQL-expressible oracle)
    "multimodal_meta" -> (Multimodal.meta _),
    // dedup family
    "dedup_exact" -> (Dedup.exact _),
    "dedup_fingerprint" -> (Dedup.fingerprint _),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_jaccard_prefix" -> ((s: SparkSession, d: String) => Dedup.jaccardPrefix(s, d)),
    "dedup_jaccard_ppjoin" -> ((s: SparkSession, d: String) => Dedup.jaccardPpjoin(s, d)),
    "dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "dedup_minhash_verified" -> ((s: SparkSession, d: String) => Dedup.minhashVerified(s, d)),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    "dedup_embedding" -> ((s: SparkSession, d: String) => Dedup.embeddingNearDup(s, d)),
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => Dedup.embeddingNearDupLsh(s, d)),
    "dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.clusters(s, d)),
    // similarity search
    "ann_bruteforce" -> ((s: SparkSession, d: String) => Ann.bruteForce(s, d)),
    "ann_ivf" -> ((s: SparkSession, d: String) => Ann.ivf(s, d)),
    "knn_join" -> ((s: SparkSession, d: String) => Ann.knnJoin(s, d)),
    "embed_cluster_stats" -> (Ann.clusterStats _),
    // relational core
    "q1_agg" -> (Relational.q1 _),
    "q3_join" -> (Relational.q3 _),
    "q5_multijoin" -> (Relational.q5 _),
    "window_topn" -> (Relational.windowTopN _),
    // analytics second wave
    "q_rollup" -> (Analytics.rollupRevenue _),
    "events_quantiles" -> (Analytics.eventQuantiles _),
    "q_antijoin" -> (Analytics.customersNoOrders _),
    "q_semijoin" -> (Analytics.customersWithOrders _),
    "q_distinct" -> (Analytics.segmentDistinct _),
    "window_running" -> (Analytics.runningSpend _),
    "text_topk_tokens" -> (Analytics.topTokens _),
    "events_funnel" -> (Analytics.funnel _),
    "events_approx_stats" -> (Analytics.approxStats _),
    "events_retention" -> (Analytics.retention _),
    "dedup_minhash_est" -> (Dedup.minhashJaccardEst _),
    "ann_ivf_multiprobe" -> ((s: SparkSession, d: String) => Ann.ivfMultiProbe(s, d)),
    // events
    "events_hourly" -> (Events.hourly _),
    "events_asof" -> (Events.asofClickPurchase _),
    "events_sessionize" -> (Events.sessionize _),
    "events_topk_plan" -> ((s: SparkSession, d: String) => Events.topEventsPlan(s, d)),
    // text analysis
    "text_tokens" -> (TextAnalysis.tokens _),
    "text_quality" -> (TextAnalysis.quality _),
    "text_langid" -> (TextAnalysis.langid _),
    "text_winnow" -> (TextAnalysis.winnow _),
    // training-data pipeline second wave
    "text_repetition" -> (TextAnalysis.repetition _),
    "text_normalize" -> (TextAnalysis.normalize _),
    "text_curation" -> ((s: SparkSession, d: String) => TextAnalysis.curate(s, d)),
    "q_cube" -> (Analytics.cubeOrders _),
    "events_zscore" -> (Analytics.zscoreOutliers _),
    "events_histogram" -> (Analytics.valueHistogram _),
    "events_props_json" -> (Analytics.propsJson _),
    "text_redact_pii" -> (TextAnalysis.redactPii _),
    "sample_stratified" -> (TextAnalysis.sampleStratified _),
    "text_decontam" -> ((s: SparkSession, d: String) => TextAnalysis.decontaminate(s, d)),
    "ann_lsh" -> ((s: SparkSession, d: String) => Ann.lsh(s, d)),
    "bm25_search" -> ((s: SparkSession, d: String) => KeywordSearch.bm25(s, d)),
    "embed_quantize" -> (Ann.quantize _),
    "ann_quantized" -> ((s: SparkSession, d: String) => Ann.quantizedSearch(s, d)),
    "hybrid_rrf" -> ((s: SparkSession, d: String) => KeywordSearch.hybridRrf(s, d)),
    "ann_recall_eval" -> ((s: SparkSession, d: String) => Ann.recallEval(s, d)),
    "ann_filtered" -> ((s: SparkSession, d: String) => Ann.filteredSearch(s, d)),
    // round-3 wave: robust stats, window frames, decorrelated subqueries
    "events_mad" -> (Analytics.madOutliers _),
    "window_range" -> (Analytics.trailingSpend _),
    "q_above_avg" -> (Analytics.aboveCustomerAvg _),
    "q_argmin_join" -> (Analytics.cheapestPerPart _),
    "tfidf_topk" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTopk(s, d)),
    "cooccur_pmi" -> ((s: SparkSession, d: String) => TextAnalysis.cooccurPmi(s, d)),
    "chunk_dedup" -> (Dedup.chunkDedup _),
    "doc_dup_fraction" -> (Dedup.docDupFraction _),
    "dedup_containment" -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "kmeans_step" -> (Ann.kmeansStep _),
    "ann_pq" -> ((s: SparkSession, d: String) => Ann.pq(s, d)),
    "events_transitions" -> (Analytics.eventTransitions _),
    "events_sliding" -> (Analytics.slidingCounts _),
    "q_spend_quartiles" -> (Analytics.spendQuartiles _),
    "text_unigram_logprob" -> (TextAnalysis.unigramLogprob _),
    "q_market_share" -> (Relational.marketShare _),
    "q_nation_traffic" -> (Relational.nationTraffic _),
    "events_dau_wau" -> (Analytics.dauWau _),
    "graph_pagerank" -> ((s: SparkSession, d: String) => Dedup.pagerank(s, d)),
    "ann_pq_refine" -> ((s: SparkSession, d: String) => Ann.pqRefine(s, d)),
    "q_pivot" -> (Analytics.pivotOrders _),
    "text_topk_approx" -> (Analytics.topTokensApprox _),
    "events_gapfill" -> (Analytics.gapfillHourly _),
    "q_set_ops" -> (Analytics.userSetOps _),
    "profile_docs" -> (TextAnalysis.profileDocs _),
    "q_grouping_sets" -> (Analytics.groupingSetsRevenue _),
    // round-4 wave
    "q_cust_dist" -> (Relational.custDist _),
    "q_promo_share" -> (Relational.promoShare _),
    "q_top_supplier" -> (Relational.topSupplier _),
    // round-5 wave: decorrelation depth, interval attribution,
    // hash-reservoir sampling, graph density, fuzzy entity resolution
    "q_small_qty" -> (Relational.smallQtyRevenue _),
    "q_large_orders" -> (Relational.largeOrders _),
    "q_disjunctive" -> (Relational.disjunctiveRevenue _),
    "q_sole_late_supplier" -> (Relational.soleLateSupplier _),
    "q_idle_cust" -> (Relational.idleRichCustomers _),
    "events_attribution" -> (Events.attribution _),
    "sample_per_key" -> ((s: SparkSession, d: String) => TextAnalysis.samplePerKey(s, d)),
    "graph_triangles" -> (Dedup.triangles _),
    "dedup_fuzzy_names" -> ((s: SparkSession, d: String) => Dedup.fuzzyNames(s, d)),
    // round-6 wave: range/multi-vector search, embedding + LSH index QA,
    // corpus profiling, returned-item / priority-check / cadence analytics
    "ann_range_search" -> ((s: SparkSession, d: String) => Ann.rangeSearch(s, d)),
    "ann_maxsim" -> ((s: SparkSession, d: String) => Ann.maxSim(s, d)),
    "embed_norm_outliers" -> (Ann.normOutliers _),
    "dedup_lsh_stats" -> (Dedup.lshStats _),
    "text_entropy" -> (TextAnalysis.entropy _),
    "doc_length_histogram" -> (TextAnalysis.lengthHistogram _),
    "q_returned_cust" -> ((s: SparkSession, d: String) => Relational.returnedCustomers(s, d)),
    "q_priority_late" -> (Relational.priorityLate _),
    "q_reorder_gap" -> (Relational.reorderGap _),
    "q6_forecast" -> (Relational.forecastRevenue _),
    "sample_temperature" -> (TextAnalysis.sampleTemperature _),
    "dedup_cluster_sizes" -> (Dedup.clusterSizes _),
    "dedup_canonical" -> (Dedup.canonical _),
    "langid_confusion" -> (TextAnalysis.langidConfusion _),
    "search_facets" -> ((s: SparkSession, d: String) => KeywordSearch.facets(s, d)),
    "search_diverse" -> ((s: SparkSession, d: String) => SemanticSearch.diverseTopK(s, d)),
    "text_bigram_logprob" -> (TextAnalysis.bigramLogprob _),
    "profile_length_pcts" -> (TextAnalysis.lengthPercentiles _),
    "dedup_winnow_pairs" -> ((s: SparkSession, d: String) => Dedup.winnowPairs(s, d)),
    "q_revenue_slope" -> (Relational.revenueSlope _),
    "ann_ivf_pq" -> ((s: SparkSession, d: String) => Ann.ivfPq(s, d)),
    "q_yearly_growth" -> (Relational.yearlyGrowth _),
    // round-6 wave 4: derived-partsupp TPC-H flavors (Q2/Q9/Q11/Q16/Q20),
    // budget-packed chunking, Zipf fit, per-doc contamination fraction,
    // quality-weighted sampling, training-mix report, session stats
    "q_min_cost_supp" -> (Relational.minCostSupplier _),
    "q_product_profit" -> (Relational.productProfit _),
    "q_important_parts" -> (Relational.importantParts _),
    "q_supplier_cnt" -> (Relational.supplierCnt _),
    "q_dominant_supp" -> (Relational.dominantSupplier _),
    "chunk_budget" -> ((s: SparkSession, d: String) => Chunking.budgetPack(s, d)),
    "text_zipf" -> ((s: SparkSession, d: String) => TextAnalysis.zipfSlope(s, d)),
    "text_contam_frac" -> (TextAnalysis.contamFraction _),
    "sample_quality" -> (TextAnalysis.sampleQuality _),
    "doc_mix_report" -> (TextAnalysis.mixReport _),
    "events_session_stats" -> (Events.sessionStats _),
  )

  /** DuckDB-runnable oracle SQL per query key (same column names!). */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Events.oracle ++ TextAnalysis.oracle ++
      Chunking.oracle ++ SemanticSearch.oracle ++ Dedup.oracle ++ Ann.oracle ++
      Analytics.oracle ++ KeywordSearch.oracle
}
