package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.VectorOps

/** The reference's two-level semantic search re-expressed Spark-first
  * (reference: src/backend/database/qdrant.py:210-246 +
  * src/frontend/responses.py:77-84):
  *
  *   query vec → cosine top-k over document vectors (MAIN collection)
  *             → per-hit top-n chunks filtered to the document (CHUNKS)
  *             → ±1-chunk context window.
  *
  * Spark-first differences from the reference's execution:
  *  - the reference issues one filtered vector query *per document* in a
  *    Python loop; here the per-document top-chunk is ONE window rank over
  *    a single broadcast-join pass — no N+1 queries, one shuffle on the
  *    partition key.
  *  - document vectors (mean of chunk vectors) are a partial-aggregatable
  *    groupBy, not a driver-side numpy mean.
  *  - top-k documents go through TakeOrderedAndProject (per-partition
  *    heaps + driver merge of k), never a global sort.
  *
  * Data mapping: `embeddings` rows are chunk vectors; `label` is the
  * owning document. The query vector is the embedding of the smallest
  * vec_id (deterministic stand-in for "encode the query string" — the
  * encoder itself is model inference, out of engine scope).
  */
object SemanticSearch {

  val Dim = 64

  /** 1-row broadcastable frame holding the query vector. */
  def queryVec(s: SparkSession, dir: String): DataFrame =
    Graft.embeddings(s, dir).orderBy(col("vec_id")).limit(1)
      .select(col("embedding").as("qvec"))

  /** Document vectors: mean-pool of chunk vectors per label
    * (reference qdrant.py:123).
    */
  def docVectors(s: SparkSession, dir: String): DataFrame =
    // fvec_avg: partial-aggregatable elementwise mean — only
    // labels x (dim+1) doubles shuffle, vs collect_list shipping every
    // vector to its group and folding with an interpreted lambda
    Graft.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(call_function("fvec_avg", col("embedding"), lit(Dim)).as("dvec"))

  /** Mean-pool exposed positionally for the oracle: (label, pos, v).
    * Aggregates FIRST (fvec_avg partial agg), explodes the C x dim
    * result — the posexplode-then-group formulation multiplies shuffle
    * rows by the dimension.
    */
  def meanPoolPositional(s: SparkSession, dir: String): DataFrame =
    Graft.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(call_function("fvec_avg", col("embedding"), lit(Dim)).as("dvec"))
      .select(col("label"), posexplode(col("dvec")).as(Seq("pos0", "v0")))
      .select(col("label"), (col("pos0") + 1).as("pos"), round(col("v0"), 6).as("v"))

  /** Top-k documents by cosine for the query vector. */
  def topDocs(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    docVectors(s, dir)
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("label"), VectorOps.cosine6(col("dvec"), col("qvec")).as("doc_score"))
      .orderBy(col("doc_score").desc, col("label"))
      .limit(k)

  /** Per-document top-n chunks by cosine, id-filtered — ONE window over a
    * single scan instead of the reference's per-document query loop.
    */
  def topChunksPerDoc(s: SparkSession, dir: String, n: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chunk_score").desc, col("vec_id"))
    Graft.embeddings(s, dir)
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("label"), col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("chunk_score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  /** Chunk scores against the query vector (shared by the window-rank
    * and custom-plan top-k variants).
    */
  private def chunkScores(s: SparkSession, dir: String): DataFrame =
    Graft.embeddings(s, dir)
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("label"), col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("chunk_score"))

  /** Same result set as [[topChunksPerDoc]] (minus the rank column),
    * through the custom TopKPerKey physical operator — bounded per-key
    * heaps instead of a full window sort per document group.
    */
  def topChunksPerDocPlan(s: SparkSession, dir: String, n: Int = 2): DataFrame =
    graft.plans.TopKPerKey(chunkScores(s, dir), Seq("label"),
      Seq(("chunk_score", false), ("vec_id", true)), n)

  /** Diversified top-k: the best chunk PER DOCUMENT first (window rank 1
    * within label), then the global k best of those — so no document
    * occupies two result slots (the cluster-pruned cousin of MMR
    * diversification, deterministic where greedy MMR is sequential).
    * Per-label rank is one window over the scoring scan; the global k
    * plans TakeOrderedAndProject over <= |labels| rows, never a full sort.
    */
  def diverseTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    topChunksPerDoc(s, dir, 1)
      .select(col("label"), col("vec_id"), col("chunk_score"))
      .orderBy(col("chunk_score").desc, col("vec_id"))
      .limit(k)

  /** ±1-chunk context window around the most-relevant chunk of each doc
    * (reference responses.py:77-84), over word chunks of `documents`.
    * "Relevance" here is a deterministic surrogate (min md5 of the token)
    * — the windowing is the operator under test, not the scorer.
    */
  def highlightWindow(s: SparkSession, dir: String): DataFrame =
    // argmin over (md5(tok), pos) inside one projection + an array slice:
    // no explode, no window sort, no join, NO SHUFFLE — same rows as the
    // rank/join formulation, as a pure map over documents.
    Graft.documents(s, dir)
      .select(col("doc_id"), expr("split(text, '\\\\s+')").as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("array_min(transform(toks, (t, i) -> struct(md5(t) as m, i as pos))).pos")
          .as("center_pos"))
      .select(col("doc_id"), col("center_pos").cast("long").as("center_pos"),
        expr("""array_join(slice(toks, greatest(center_pos, 1),
                | least(center_pos + 2, size(toks)) - greatest(center_pos, 1) + 1), ' ')""".stripMargin)
          .as("context"))

  /** End-to-end flagship: query vec → top-3 docs → best chunk per doc →
    * ±1 neighbor chunk ids. One broadcast of the query, one window, one
    * co-partitioned neighbor join.
    */
  def searchPipeline(s: SparkSession, dir: String): DataFrame = {
    val top = topDocs(s, dir, 3)
    val best = topChunksPerDoc(s, dir, 1)
      .select(col("label").as("b_label"), col("vec_id").as("center_vec"), col("chunk_score"))
    val emb = Graft.embeddings(s, dir).select(col("label").as("e_label"), col("vec_id"))
    val ctx = best
      .join(emb, col("e_label") === col("b_label") &&
        abs(col("vec_id") - col("center_vec")) <= 1)
      .groupBy(col("b_label"), col("center_vec"))
      .agg(array_join(
        transform(array_sort(collect_list(col("vec_id"))), _.cast("string")), ",")
        .as("ctx_vecs"))
    top
      .join(best, col("label") === col("b_label"))
      .join(ctx.select(col("b_label").as("x_label"), col("center_vec").as("x_center"), col("ctx_vecs")),
        col("label") === col("x_label") && col("center_vec") === col("x_center"))
      .select(col("label"), col("doc_score"), col("center_vec"), col("chunk_score"), col("ctx_vecs"))
      // explicit result ranking: join output order is not a contract; the
      // limit (joins preserve top's <= 3 rows) plans TakeOrderedAndProject
      // — per-partition heaps — instead of a global sort
      .orderBy(col("doc_score").desc, col("label"))
      .limit(3)
  }

  /** The flagship search run OFF THE WRITTEN INDEX GENERATION — the
    * [[searchPipeline]] semantics reading [[IndexBuilder.writtenIndex]]'s
    * MAIN + bucketed CHUNKS instead of the raw embeddings table (the
    * deployment shape: build job writes, serving reads; the reference's
    * Qdrant collections qdrant.py:139-176 are exactly this split).
    * Read-equivalence means the result is IDENTICAL to searchPipeline's
    * (same oracle verifies both); the layout's value shows in the plan:
    * the per-doc best-chunk window, the ±1-chunk context self-join and
    * the context groupBy all run on CHUNKS' bucket partitioning
    * (hash(doc_key, 16) from the scan) — ZERO shuffles of chunk rows,
    * where the raw-table pipeline exchanges them once per consumer
    * (IndexBuilderSpec asserts no shuffle above the bucketed scan).
    */
  def searchFromIndex(s: SparkSession, dir: String): DataFrame = {
    val (main, chunks) = IndexBuilder.writtenIndex(s, dir)
    val qv = chunks.orderBy(col("chunk_id")).limit(1).select(col("embedding").as("qvec"))
    val top = main.crossJoin(broadcast(qv))
      .select(col("doc_key").as("label"),
        VectorOps.cosine6(col("doc_vec"), col("qvec")).as("doc_score"))
      .orderBy(col("doc_score").desc, col("label"))
      .limit(3)
    val w = Window.partitionBy(col("b_label"))
      .orderBy(col("chunk_score").desc, col("center_vec"))
    val best = chunks.crossJoin(broadcast(qv))
      .select(col("doc_key").as("b_label"), col("chunk_id").as("center_vec"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("chunk_score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val emb = chunks.select(col("doc_key").as("e_label"), col("chunk_id").as("vec_id"))
    val ctx = best
      .join(emb, col("e_label") === col("b_label") &&
        abs(col("vec_id") - col("center_vec")) <= 1)
      .groupBy(col("b_label"), col("center_vec"))
      .agg(array_join(
        transform(array_sort(collect_list(col("vec_id"))), _.cast("string")), ",")
        .as("ctx_vecs"))
    // final assembly BROADCASTS the ≤3-row top-docs side into the
    // per-doc frames (best, ctx), which both stream on the bucketed
    // hash(doc_key) partitioning — chunk-derived rows never shuffle
    // (a top-side build would ENSURE_REQUIREMENTS-exchange the
    // corpus-sized ctx frame instead)
    val tb = best.join(broadcast(top), col("b_label") === col("label"))
      .select(col("label").as("t_label"), col("doc_score"),
        col("center_vec").as("t_center"), col("chunk_score"))
    ctx
      .join(broadcast(tb),
        col("b_label") === col("t_label") && col("center_vec") === col("t_center"))
      .select(col("t_label").as("label"), col("doc_score"),
        col("t_center").as("center_vec"), col("chunk_score"), col("ctx_vecs"))
      .orderBy(col("doc_score").desc, col("label"))
      .limit(3)
  }

  /** DuckDB-side cosine of a list column vs the query list, all-double. */
  private def duckCos(v: String): String =
    s"""round(
       | list_sum(list_transform(range(1,65), i -> CAST($v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1,65), i -> CAST($v[i] AS DOUBLE) * CAST($v[i] AS DOUBLE))))
       |    * (SELECT nq FROM qn)), 6)""".stripMargin

  private val duckQuery =
    """q AS (SELECT embedding AS qv FROM embeddings
      |      WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
      |qn AS (SELECT sqrt(list_sum(list_transform(range(1,65),
      |        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS nq FROM q)""".stripMargin

  private val duckDocScores =
    s"""d AS (SELECT label, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS v
       |      FROM embeddings, range(1,65) t(i) GROUP BY 1, 2),
       |ds AS (SELECT label,
       |        sum(d.v * CAST(q.qv[d.pos] AS DOUBLE)) AS dot,
       |        sqrt(sum(d.v * d.v)) AS nd
       |       FROM d, q GROUP BY label),
       |top AS (SELECT label, round(dot / (nd * (SELECT nq FROM qn)), 6) AS doc_score
       |        FROM ds ORDER BY doc_score DESC, label LIMIT 3)""".stripMargin

  val oracle: Map[String, String] = Map(
    "doc_embed_meanpool" ->
      """SELECT label, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS v
        |FROM embeddings, range(1,65) t(i) GROUP BY label, i""".stripMargin,
    "topk_docs_cosine" ->
      s"""WITH $duckQuery,
         |$duckDocScores
         |SELECT label, doc_score FROM top""".stripMargin,
    "topk_chunks_filtered" ->
      s"""WITH $duckQuery,
         |cs AS (SELECT e.label, e.vec_id, ${duckCos("e.embedding")} AS chunk_score
         |       FROM embeddings e, q)
         |SELECT label, vec_id, chunk_score, rn FROM (
         | SELECT *, row_number() OVER (PARTITION BY label
         |            ORDER BY chunk_score DESC, vec_id) AS rn FROM cs)
         |WHERE rn <= 2""".stripMargin,
    "topk_chunks_plan" ->
      s"""WITH $duckQuery,
         |cs AS (SELECT e.label, e.vec_id, ${duckCos("e.embedding")} AS chunk_score
         |       FROM embeddings e, q)
         |SELECT label, vec_id, chunk_score FROM (
         | SELECT *, row_number() OVER (PARTITION BY label
         |            ORDER BY chunk_score DESC, vec_id) AS rn FROM cs)
         |WHERE rn <= 2""".stripMargin,
    "search_diverse" ->
      s"""WITH $duckQuery,
         |cs AS (SELECT e.label, e.vec_id, ${duckCos("e.embedding")} AS chunk_score
         |       FROM embeddings e, q),
         |best AS (SELECT label, vec_id, chunk_score,
         |          row_number() OVER (PARTITION BY label
         |            ORDER BY chunk_score DESC, vec_id) AS rn FROM cs)
         |SELECT label, vec_id, chunk_score FROM best WHERE rn = 1
         |ORDER BY chunk_score DESC, vec_id LIMIT 5""".stripMargin,
    "highlight_window" ->
      """WITH c AS (SELECT doc_id, generate_subscripts(parts, 1) - 1 AS pos, unnest(parts) AS tok
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS parts FROM documents)),
        |r AS (SELECT doc_id, pos,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY md5(tok), pos) AS rn FROM c),
        |ctr AS (SELECT doc_id, pos AS center_pos FROM r WHERE rn = 1)
        |SELECT c.doc_id, center_pos, string_agg(tok, ' ' ORDER BY c.pos) AS context
        |FROM c JOIN ctr ON c.doc_id = ctr.doc_id AND abs(c.pos - ctr.center_pos) <= 1
        |GROUP BY c.doc_id, center_pos""".stripMargin,
    "search_pipeline" -> duckSearchPipelineSql,
    // the written-index search is READ-EQUIVALENT to the raw-table
    // pipeline by construction — one oracle verifies both, which is the
    // point: same answers, bucketed-layout plan
    "search_from_index" -> duckSearchPipelineSql,
  )

  private lazy val duckSearchPipelineSql: String =
    s"""WITH $duckQuery,
       |$duckDocScores,
       |cs AS (SELECT e.label, e.vec_id, ${duckCos("e.embedding")} AS chunk_score
       |       FROM embeddings e, q),
       |best AS (SELECT label, vec_id AS center_vec, chunk_score,
       |          row_number() OVER (PARTITION BY label
       |            ORDER BY chunk_score DESC, vec_id) AS rn FROM cs),
       |b1 AS (SELECT label, center_vec, chunk_score FROM best WHERE rn = 1),
       |ctx AS (SELECT b1.label, b1.center_vec,
       |         string_agg(CAST(e.vec_id AS VARCHAR), ',' ORDER BY e.vec_id) AS ctx_vecs
       |        FROM b1 JOIN embeddings e
       |          ON e.label = b1.label AND abs(e.vec_id - b1.center_vec) <= 1
       |        GROUP BY 1, 2)
       |SELECT t.label, t.doc_score, b.center_vec, b.chunk_score, c.ctx_vecs
       |FROM top t JOIN b1 b ON t.label = b.label
       | JOIN ctx c ON t.label = c.label AND b.center_vec = c.center_vec""".stripMargin
}
