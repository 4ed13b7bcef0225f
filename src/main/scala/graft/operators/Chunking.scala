package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft

/** Document chunkers — the reference's ChunkLevel splitters
  * (src/backend/data_fetching/data_fetcher.py:7-30: sentence='. ',
  * paragraph='\n', section marker) re-expressed as a split + posexplode
  * projection. One narrow map stage: chunking 100 TB is
  * embarrassingly parallel and never shuffles.
  */
object Chunking {

  /** Generic: one row per chunk with its 0-based position. */
  def chunks(df: DataFrame, idCol: String, sepRegex: String): DataFrame =
    df.select(col(idCol), posexplode(split(col("text"), sepRegex)).as(Seq("chunk_id", "chunk")))

  /** Sentence-level chunks (reference ChunkLevel.SENTENCE, sep = '. '). */
  def sentences(s: SparkSession, dir: String): DataFrame =
    chunks(Graft.documents(s, dir), "doc_id", "\\. ")

  /** Paragraph-level chunks (reference ChunkLevel.PARAGRAPH, sep = '\n'). */
  def paragraphs(s: SparkSession, dir: String): DataFrame =
    chunks(Graft.documents(s, dir), "doc_id", "\n")

  /** Word/token-level chunks (finest granularity). */
  def words(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))

  /** Fixed-size sliding-window chunks with overlap (window tokens,
    * stride tokens) — the RAG-era chunker: every token is covered, each
    * chunk shares window-stride tokens with its neighbor so retrieval
    * never loses boundary context. Pure map stage (sequence + slice).
    */
  def fixedWindows(s: SparkSession, dir: String, window: Int = 32, stride: Int = 24): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        expr(s"greatest(cast(ceil(cast(size(toks) - $window as double) / $stride) as int), 0)")
          .as("extra"))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, extra), i -> " +
          s"array_join(slice(toks, i * $stride + 1, $window), ' '))"))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"), col("chunk"))

  /** Token-budget chunk packing: sentences are packed greedily into
    * chunks of ~`budget` whitespace tokens — the RAG chunker that
    * respects sentence boundaries (vs [[fixedWindows]]' hard token
    * cuts). A sentence's chunk is floor(cumulative tokens BEFORE it /
    * budget): a running-sum window per document (the sentence split is
    * already ordered by position), then one grouped aggregate on the
    * window's own (doc_id) partitioning — a single shuffle total.
    */
  def budgetPack(s: SparkSession, dir: String, budget: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("sent_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sentences(s, dir)
      .select(col("doc_id"), col("chunk_id").cast("long").as("sent_id"),
        expr("cast(size(split(chunk, '\\\\s+')) as bigint)").as("n_toks"))
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"cum_before div $budget"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"), sum(col("n_toks")).as("n_tokens"),
        min(col("sent_id")).as("first_sent"))
  }

  /** The reference's ChunkLevel.SECTION sentinel: 24 literal '$'s
    * (data_fetcher.py:9) — the marker its pipeline joins SECTIONS with
    * before a plain str.split.
    */
  val SectionSep: String = "$" * 24

  /** Section-level chunks (reference ChunkLevel.SECTION), completing
    * the reference's three chunk levels. The corpus stores flat text
    * with no section markers, so — like [[stripCitations]] — the
    * reference's sentinel-joined form is synthesized first (50-token
    * blocks joined by the 24-'$' marker, standing in for DataFields
    * .SECTIONS) and then split on the sentinel, exercising the same
    * literal-separator split semantics end to end. Pure map stage,
    * never shuffles.
    */
  def sections(s: SparkSession, dir: String, secTokens: Int = 50): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"),
        expr(s"array_join(transform(sequence(0, (size(toks) - 1) div $secTokens), i -> " +
          s"array_join(slice(toks, i * $secTokens + 1, $secTokens), ' ')), '" +
          SectionSep + "')").as("joined"))
      .select(col("doc_id"),
        posexplode(split(col("joined"), "[$]{24}")).as(Seq("section_id", "section")))

  /** Citation-bracket stripping (reference fetch_pmcid.py:24's
    * `\[[^\]]*\]` regex). The corpus has no brackets, so brackets are
    * synthesized from metadata first, then stripped — exercising the
    * same regex semantics end-to-end.
    */
  def stripCitations(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("["), col("source"), lit("] "), col("text"), lit(" ["), col("lang"), lit("]"))
          .as("bracketed"))
      .select(col("doc_id"),
        regexp_replace(col("bracketed"), "\\[[^\\]]*\\]", "").as("stripped"))
      .select(col("doc_id"),
        length(col("stripped")).cast("long").as("n_chars"),
        md5(col("stripped")).as("digest"))

  /** Deterministic point ids from the article id hash (reference
    * qdrant.py:137 uses sha3-512 first 8 bytes; here: sha2-256 hex
    * prefix — same idea, available in both engines).
    */
  def pointIds(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"),
        substring(sha2(col("doc_id").cast("string"), 256), 1, 16).as("point_id"))

  /** Reference-EXACT point ids: sha3-512 of the id string, first 8
    * bytes little-endian (qdrant.py:137) via the native sha3_point_id
    * kernel — the ids a user migrating an existing reference collection
    * must reproduce bit-for-bit. DuckDB has no sha3, so this variant is
    * fixture-verified in TextHashesSpec against reference-computed ids
    * and registered rows-only; [[pointIds]] (sha2-256 hex prefix) stays
    * as the cross-engine oracle twin.
    */
  def pointIdsSha3(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(col("doc_id"),
        call_function("sha3_point_id", col("doc_id").cast("string")).as("point_id"))

  val oracle: Map[String, String] = Map(
    "chunk_sections" ->
      ("""WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |j AS (SELECT doc_id, array_to_string(
        |        list_transform(range(0, (len(toks) - 1) // 50 + 1),
        |          i -> array_to_string(list_slice(toks, i * 50 + 1, i * 50 + 50), ' ')),
        |        '""" + ("$" * 24) + """') AS joined FROM t)
        |SELECT doc_id, generate_subscripts(parts, 1) - 1 AS section_id,
        | unnest(parts) AS section
        |FROM (SELECT doc_id, string_split(joined, '""" + ("$" * 24) + """') AS parts FROM j)""").stripMargin,
    "chunk_budget" ->
      """WITH c AS (SELECT doc_id, generate_subscripts(parts, 1) - 1 AS sent_id,
        |  unnest(parts) AS chunk
        | FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents)),
        |t AS (SELECT doc_id, CAST(sent_id AS BIGINT) AS sent_id,
        |  CAST(len(string_split_regex(chunk, '\s+')) AS BIGINT) AS n_toks FROM c),
        |cb AS (SELECT doc_id, sent_id, n_toks,
        |  COALESCE(sum(n_toks) OVER (PARTITION BY doc_id ORDER BY sent_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        | FROM t)
        |SELECT doc_id, CAST(cum_before // 64 AS BIGINT) AS chunk_id,
        | count(*) AS n_sentences, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        | CAST(min(sent_id) AS BIGINT) AS first_sent
        |FROM cb GROUP BY 1, 2""".stripMargin,
    "chunk_fixed" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |        greatest(CAST(ceil(CAST(len(toks) - 32 AS DOUBLE) / 24) AS INT), 0) AS extra
        |      FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        | array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk
        |FROM (SELECT doc_id, toks, unnest(range(0, extra + 1)) AS i FROM g)""".stripMargin,
    "chunk_sentences" ->
      """SELECT doc_id, generate_subscripts(parts, 1) - 1 AS chunk_id, unnest(parts) AS chunk
        |FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents)""".stripMargin,
    "chunk_paragraphs" ->
      """SELECT doc_id, generate_subscripts(parts, 1) - 1 AS chunk_id, unnest(parts) AS chunk
        |FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents)""".stripMargin,
    "chunk_words" ->
      """SELECT doc_id, generate_subscripts(parts, 1) - 1 AS pos, unnest(parts) AS tok
        |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS parts FROM documents)""".stripMargin,
    "strip_citations" ->
      """SELECT doc_id,
        | CAST(length(stripped) AS BIGINT) AS n_chars, md5(stripped) AS digest
        |FROM (SELECT doc_id,
        |  regexp_replace('[' || source || '] ' || text || ' [' || lang || ']',
        |                 '\[[^\]]*\]', '', 'g') AS stripped
        | FROM documents)""".stripMargin,
    "doc_point_ids" ->
      """SELECT doc_id, substring(sha256(CAST(doc_id AS VARCHAR)), 1, 16) AS point_id
        |FROM documents""".stripMargin,
  )
}
