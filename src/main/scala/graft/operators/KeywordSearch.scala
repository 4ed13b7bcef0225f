package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft

/** BM25 keyword ranking over `documents` — the lexical complement to the
  * embedding pipeline (hybrid search = BM25 ∪ cosine, fused downstream).
  *
  * Scale design: one scan builds (doc, term, tf, dl); document frequency
  * and corpus stats are tiny aggregates that broadcast back; the score is
  * a single projection + per-doc sum — no shuffle carries text. The
  * query-term filter prunes the exploded token stream immediately, so
  * inverted-index volume is O(matching tokens), not O(corpus tokens).
  *
  * Every float constant is cast to double IDENTICALLY in the Spark plan
  * and the oracle: bare literals parse as DECIMAL in both engines and
  * decimal arithmetic diverges between them (see SURVEY.md §6).
  */
object KeywordSearch {

  val QueryTerms = Seq("data", "model", "results", "analysis", "method")

  /** BM25 (k1=1.2, b=0.75) of the fixed query against every document,
    * top-k by (rounded score desc, doc_id).
    */
  def bm25(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25Scores(s, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** BM25 score per matching document (unranked). Document-at-a-time:
    * the term_counts kernel emits [dl, tf_1..tf_k] in one pass per doc,
    * so the corpus token stream is never exploded or shuffled — only
    * k rows per matching doc flow into the (broadcast-sized) df join.
    */
  def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val termsArr = array(QueryTerms.map(lit): _*)
    val tc = Graft.documents(s, dir)
      .select(col("doc_id"),
        call_function("term_counts", coalesce(col("text"), lit("")), termsArr).as("tc"))
    // ONE corpus pass for every global: doc count, total length, and the
    // per-term document frequencies (as one array column) — broadcast as
    // a single row, so scoring is the only other scan.
    val dfSums = QueryTerms.indices.map(i =>
      sum(when(element_at(col("tc"), i + 2) > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = tc.agg(count(lit(1)).as("n_docs"),
        (sum(element_at(col("tc"), 1)).as("sum_dl") +: dfSums): _*)
      .select(col("n_docs"), col("sum_dl"),
        array(QueryTerms.indices.map(i => col(s"df_$i")): _*).as("dfs"))
    tc.select(col("doc_id"), element_at(col("tc"), 1).as("dl"),
        posexplode(expr("slice(tc, 2, size(tc) - 1)")).as(Seq("pos", "tf")))
      .filter(col("tf") > 0)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr(
          """ln(cast(1 as double) +
            |   (cast(n_docs as double) - cast(element_at(dfs, pos + 1) as double) + cast(0.5 as double))
            |   / (cast(element_at(dfs, pos + 1) as double) + cast(0.5 as double)))
            |* (cast(tf as double) * cast(2.2 as double))
            |/ (cast(tf as double) + cast(1.2 as double)
            |   * (cast(0.25 as double) + cast(0.75 as double)
            |      * (cast(dl as double) * cast(n_docs as double) / cast(sum_dl as double))))""".stripMargin)
          .as("term_score"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("term_score")), 6).as("bm25"))
  }

  /** Hybrid search: reciprocal-rank fusion (c=60) of the lexical BM25
    * ranking and the semantic cosine ranking, at the document-group
    * level (label = doc_id % 10 is the corpus's doc->group bridge).
    * The standard fusion when neither score is calibrated against the
    * other.
    *
    * Scale shape: RRF by definition fuses bounded top-N lists, so each
    * side is cut to its top `n` by TakeOrderedAndProject (distributed
    * heap top-k, no global sort, SinglePartition output) BEFORE the
    * ranking window runs — the row_number then orders <= n rows that
    * already sit presorted on one partition, instead of forcing every
    * group in the corpus through an Exchange(SinglePartition) + sort.
    */
  def hybridRrf(s: SparkSession, dir: String, k: Int = 10, n: Int = 1000): DataFrame = {
    val cosRank = SemanticSearch.docVectors(s, dir)
      .crossJoin(broadcast(SemanticSearch.queryVec(s, dir)))
      .select(col("label").cast("long").as("c_label"),
        graft.functions.VectorOps.cosine6(col("dvec"), col("qvec")).as("score"))
      .orderBy(col("score").desc, col("c_label")).limit(n) // bounded list
      .withColumn("r_cos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("c_label"))).cast("long"))
    val bmRank = bm25Scores(s, dir)
      .groupBy((col("doc_id") % 10).as("b_label"))
      .agg(max(col("bm25")).as("bm"))
      .orderBy(col("bm").desc, col("b_label")).limit(n) // bounded list
      .withColumn("r_bm",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm").desc, col("b_label"))).cast("long"))
    cosRank.join(bmRank, col("c_label") === col("b_label"), "full_outer")
      .select(coalesce(col("c_label"), col("b_label")).as("label"),
        (coalesce(expr("cast(1 as double) / (cast(60 as double) + r_cos)"), expr("cast(0 as double)"))
          + coalesce(expr("cast(1 as double) / (cast(60 as double) + r_bm)"), expr("cast(0 as double)")))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("label"))
      .limit(k)
  }

  /** Hybrid search THROUGH THE ANN GRAPH — the production fusion shape:
    * where [[hybridRrf]] fuses BM25 with a brute-force cosine ranking,
    * this fuses it with [[Ann.graphSearch]]'s beam walk over the built
    * NSW serving index (the reference's deployment pairs a lexical
    * ranker with Qdrant's HNSW, never with a corpus scan). Per query of
    * the walk's keyed batch: the walk's hits map to their doc groups
    * (label), keep the best walk rank per (query, group), then RRF
    * (c=60) against the shared BM25 group ranking; top-`k` fused groups
    * per query.
    *
    * Scale shape: every fused frame is bounded — the walk output is
    * Q·k rows by construction, the BM25 side is the same
    * TakeOrderedAndProject-bounded list `hybrid_rrf` fuses, and the
    * per-query replication is Q × top-N. Nothing corpus-sized enters
    * the fusion; the corpus work is the walk (N-independent per round)
    * and the one BM25 scoring pass.
    */
  def hybridRrfGraph(s: SparkSession, dir: String, k: Int = 3, n: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val walk = Ann.graphSearch(s, dir)
    val lab = Graft.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("a_label"))
    val annRank = walk.join(lab, "vec_id")
      .groupBy(col("q_id").as("a_q"), col("a_label"))
      .agg(min(col("rn")).as("r_ann"))
    val bmRank = bm25Scores(s, dir)
      .groupBy((col("doc_id") % 10).as("b_label"))
      .agg(max(col("bm25")).as("bm"))
      .orderBy(col("bm").desc, col("b_label")).limit(n)
      .withColumn("r_bm",
        row_number().over(Window.orderBy(col("bm").desc, col("b_label"))).cast("long"))
      .select(col("b_label"), col("r_bm"))
    val bmPerQ = walk.select(col("q_id").as("b_q")).distinct().crossJoin(bmRank)
    annRank.join(bmPerQ,
        col("a_q") === col("b_q") && col("a_label") === col("b_label"), "full_outer")
      .select(coalesce(col("a_q"), col("b_q")).as("q_id"),
        coalesce(col("a_label"), col("b_label")).as("label"),
        (coalesce(expr("cast(1 as double) / (cast(60 as double) + r_ann)"), expr("cast(0 as double)"))
          + coalesce(expr("cast(1 as double) / (cast(60 as double) + r_bm)"), expr("cast(0 as double)")))
          .as("rrf"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("label"))).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Facet counts for a search-results page: (source, lang) buckets over
    * the BM25 top-k with hit count and best score — the sidebar a search
    * UI renders next to the hits. The k-row result page broadcasts (it
    * is bounded by the limit, not corpus-sized), so facet assembly adds
    * zero shuffle beyond the scoring pass; the facet agg itself is
    * map-side combinable on <= k rows.
    */
  def facets(s: SparkSession, dir: String, k: Int = 50): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id").as("d_id"), col("source"), col("lang"))
      .join(broadcast(bm25(s, dir, k)), col("d_id") === col("doc_id"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), max(col("bm25")).as("best_bm25"))

  private def bmCtes(terms: String): String =
    s"""t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
       |d AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
       |       FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
       |       WHERE tok IN ($terms) GROUP BY 1, 2, 3),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT doc_id, round(sum(
       |  ln(CAST(1 AS DOUBLE) +
       |     (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |     / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |  * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
       |  / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
       |     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
       |        * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))), 6)
       |  AS bm25
       | FROM tf JOIN dft USING (tok), st GROUP BY doc_id)""".stripMargin

  /** Ranking-quality evaluation: NDCG@k of the BM25 ranking under a
    * graded editorial relevance (rel = number of distinct query terms
    * the document contains, 0..5 — the classic graded-judgment shape).
    * DCG = Σ (2^rel − 1)/log2(pos+1) with every position's term
    * quantized to integer micros BEFORE the sum; IDCG comes from the
    * corpus's ideal top-k grades (TakeOrderedAndProject), so the final
    * ratio is exact integer micros. Completes the evaluation suite:
    * ann_recall_eval scores the vector index, this scores the lexical
    * ranker. All ranked frames are k-bounded; the rel scan is the same
    * one-pass term_counts kernel BM25 itself uses.
    */
  def ndcgEval(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val termsArr = array(QueryTerms.map(lit): _*)
    val rel = Graft.documents(s, dir)
      .select(col("doc_id"),
        call_function("term_counts", coalesce(col("text"), lit("")), termsArr).as("tc"))
      .select(col("doc_id"),
        expr("aggregate(slice(tc, 2, size(tc) - 1), cast(0 as bigint)," +
          " (a, t) -> a + IF(t > 0, cast(1 as bigint), cast(0 as bigint)))").as("rel"))
    val gainMicros =
      """cast(round((pow(cast(2 as double), cast(rel as double)) - cast(1 as double))
        |  / (ln(cast(pos as double) + cast(1 as double)) / ln(cast(2 as double)))
        |  * 1000000) as bigint)""".stripMargin
    val wSys = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id")) // k-bounded post-limit
    val dcg = bm25(s, dir, k)
      .withColumn("pos", row_number().over(wSys).cast("long"))
      .join(rel, "doc_id")
      .agg(sum(expr(gainMicros)).as("dcg_micros"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .orderBy(col("rel").desc, col("doc_id")) // k-bounded post-limit
    val idcg = rel.orderBy(col("rel").desc, col("doc_id")).limit(k)
      .withColumn("pos", row_number().over(wIdeal).cast("long"))
      .agg(sum(expr(gainMicros)).as("idcg_micros"))
    dcg.crossJoin(broadcast(idcg))
      .select(col("dcg_micros"), col("idcg_micros"),
        expr("dcg_micros * 1000000 div idcg_micros").as("ndcg_micros"))
  }

  val oracle: Map[String, String] = Map(
    "search_ndcg" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |d AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
         |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
         |       WHERE tok IN ($terms) GROUP BY 1, 2, 3),
         |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |bm AS (SELECT doc_id, round(sum(
         |  ln(CAST(1 AS DOUBLE) +
         |     (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |     / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |  * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |  / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
         |     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
         |        * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))), 6)
         | AS bm25
         | FROM tf JOIN dft USING (tok), st GROUP BY doc_id),
         |rel AS (SELECT d.doc_id,
         |  COALESCE((SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM tf
         |            WHERE tf.doc_id = d.doc_id), 0) AS rel FROM d),
         |ranked AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS pos
         |           FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
         |dcg AS (SELECT CAST(sum(CAST(round((pow(2, rel) - 1)
         |   / (ln(CAST(pos AS DOUBLE) + 1) / ln(CAST(2 AS DOUBLE))) * 1000000) AS BIGINT)) AS BIGINT)
         |  AS dcg_micros FROM ranked JOIN rel USING (doc_id)),
         |ideal AS (SELECT rel, CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS pos
         |          FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
         |idcg AS (SELECT CAST(sum(CAST(round((pow(2, rel) - 1)
         |   / (ln(CAST(pos AS DOUBLE) + 1) / ln(CAST(2 AS DOUBLE))) * 1000000) AS BIGINT)) AS BIGINT)
         |  AS idcg_micros FROM ideal)
         |SELECT dcg_micros, idcg_micros,
         | dcg_micros * 1000000 // idcg_micros AS ndcg_micros
         |FROM dcg, idcg""".stripMargin
    },
    "hybrid_rrf" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${bmCtes(terms)},
         |bl AS (SELECT CAST(doc_id % 10 AS BIGINT) AS b_label, max(bm25) AS bm
         |       FROM scored GROUP BY 1),
         |br AS (SELECT b_label, CAST(row_number() OVER (ORDER BY bm DESC, b_label) AS BIGINT) AS r_bm
         |       FROM (SELECT * FROM bl ORDER BY bm DESC, b_label LIMIT 1000)),
         |e AS (SELECT vec_id, label,
         |       list_transform(embedding, z -> CAST(z AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |qn AS (SELECT sqrt(list_sum(list_transform(range(1,65),
         |        i -> qv[i] * qv[i]))) AS nq FROM q),
         |md AS (SELECT label, i AS pos, avg(v[i]) AS mv
         |       FROM e, range(1,65) t2(i) GROUP BY 1, 2),
         |ds AS (SELECT label,
         |        sum(md.mv * q.qv[md.pos]) AS dot,
         |        sqrt(sum(md.mv * md.mv)) AS nd
         |       FROM md, q GROUP BY label),
         |cs AS (SELECT CAST(label AS BIGINT) AS c_label,
         |        round(dot / (nd * (SELECT nq FROM qn)), 6) AS score FROM ds),
         |cr AS (SELECT c_label, CAST(row_number() OVER (ORDER BY score DESC, c_label) AS BIGINT) AS r_cos
         |       FROM (SELECT * FROM cs ORDER BY score DESC, c_label LIMIT 1000))
         |SELECT coalesce(c_label, b_label) AS label,
         | coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_cos), CAST(0 AS DOUBLE))
         | + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_bm), CAST(0 AS DOUBLE)) AS rrf
         |FROM cr FULL OUTER JOIN br ON c_label = b_label
         |ORDER BY rrf DESC, label LIMIT 10""".stripMargin
    },
    "hybrid_rrf_graph" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${Ann.duckE},
         |${Ann.duckGraphSearchCtes},
         |${bmCtes(terms)},
         |bl AS (SELECT CAST(doc_id % 10 AS BIGINT) AS b_label, max(bm25) AS bm
         |       FROM scored GROUP BY 1),
         |br AS (SELECT b_label, CAST(row_number() OVER (ORDER BY bm DESC, b_label) AS BIGINT) AS r_bm
         |       FROM (SELECT * FROM bl ORDER BY bm DESC, b_label LIMIT 1000)),
         |ar AS (SELECT f.q_id AS a_q, CAST(e.label AS BIGINT) AS a_label, min(f.rn) AS r_ann
         |       FROM fin f JOIN e ON e.vec_id = f.vec_id GROUP BY 1, 2),
         |bpq AS (SELECT b_q, b_label, r_bm
         |        FROM (SELECT DISTINCT q_id AS b_q FROM fin), br),
         |fu AS (SELECT coalesce(a_q, b_q) AS q_id, coalesce(a_label, b_label) AS label,
         |  coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_ann), CAST(0 AS DOUBLE))
         |  + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_bm), CAST(0 AS DOUBLE)) AS rrf
         |  FROM ar FULL OUTER JOIN bpq ON a_q = b_q AND a_label = b_label)
         |SELECT q_id, label, rrf, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT q_id, label, rrf, row_number() OVER (PARTITION BY q_id
         |          ORDER BY rrf DESC, label) AS rk FROM fu) WHERE rk <= 3""".stripMargin
    },
    "search_facets" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${bmCtes(terms)},
         |top AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 50)
         |SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       max(t2.bm25) AS best_bm25
         |FROM top t2 JOIN documents d ON t2.doc_id = d.doc_id
         |GROUP BY 1, 2""".stripMargin
    },
    "bm25_search" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |d AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
         |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
         |       WHERE tok IN ($terms) GROUP BY 1, 2, 3),
         |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
         |SELECT doc_id, round(sum(
         |  ln(CAST(1 AS DOUBLE) +
         |     (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |     / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |  * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |  / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
         |     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
         |        * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))), 6)
         | AS bm25
         |FROM tf JOIN dft USING (tok), st
         |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
    })
}
