package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.operators.IndexBuilder
import graft.sources.Articles

/** The reference's full lifecycle in one pass: JSONL ingest →
  * normalization → chunk explosion → (stubbed deterministic) embedding →
  * MAIN/CHUNKS index build → two-level cosine search → best chunk.
  * Mirrors data_fetcher.py → qdrant.py upload → qdrant.py search without
  * leaving DataFrames; the encoder is the only stub (byte-histogram
  * vectors — deterministic, distinct per document here).
  */
/** Embedding stub: 64-bucket byte histogram, length-normalized — the
  * same shape a real encoder UDF would produce (array<float>, fixed
  * dim). Top-level object so the UDF closure stays serializable.
  */
object E2EEmbed extends Serializable {
  val Dim = 64
  val fn: String => Array[Float] = { text =>
    val bytes = text.getBytes("UTF-8")
    val h = new Array[Float](Dim)
    bytes.foreach(b => h((b & 0xff) % Dim) += 1.0f)
    if (bytes.nonEmpty) (0 until Dim).foreach(i => h(i) /= bytes.length)
    h
  }
}

class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val embed = udf(E2EEmbed.fn)

  test("ingest -> chunk -> embed -> index -> search finds the planted paragraph") {
    // three articles with visibly different byte distributions
    val jsonl = Seq(
      """{"article_id":"pmc1","abstract_text":["<S>alpha beta gamma</S>"],"section_names":["Intro"],"sections":[["alpha alpha beta","beta gamma alpha"]]}""",
      """{"article_id":"pmc2","abstract_text":["<S>zeta omega omega</S>"],"section_names":["Intro"],"sections":[["omega omega zeta","zeta zeta omega"]]}""",
      """{"article_id":"pmc3","abstract_text":["<S>12345 67890</S>"],"section_names":["Results"],"sections":[["12345 12345","67890 67890 12345"]]}""")
    val dir = Files.createTempDirectory("graft-e2e").toString
    Files.write(java.nio.file.Paths.get(s"$dir/articles.jsonl"),
      jsonl.mkString("\n").getBytes("UTF-8"))

    // ingest + chunk (reference: data_fetcher.py / qdrant.py:126-133)
    val chunks = Articles.chunkRows(Articles.fromJsonl(spark, s"$dir/articles.jsonl"))
    assert(chunks.count() === 9) // 3 abstracts + 6 body paragraphs
    assert(chunks.filter(col("section_name") === "Abstract").count() === 3)

    // embed + build the two collections (reference: qdrant.py:139-176)
    val embedded = chunks.select(
      col("article_id").as("doc_key"),
      (col("paragraph_id") + when(col("section_name") === "Abstract", 0).otherwise(100))
        .cast("long").as("chunk_id"),
      col("paragraph"),
      embed(col("paragraph")).as("embedding"))
    val (main, chunkCol) = IndexBuilder.buildFrom(
      embedded.select(col("doc_key"), col("chunk_id"), col("embedding")))
    assert(main.count() === 3)
    assert(main.collect().forall(_.getAs[String]("point_id").matches("[0-9a-f]{16}")))

    // query = the exact text of a planted pmc2 paragraph
    val qvec = embedded.filter(col("paragraph") === "zeta zeta omega")
      .select(col("embedding").as("qvec")).limit(1)

    // two-level search (reference qdrant.py:210-239): top doc by cosine
    // over MAIN, then best chunk within that doc over CHUNKS
    val topDoc = main.crossJoin(broadcast(qvec))
      .select(col("doc_key"), VectorOps.cosine6(col("doc_vec"), col("qvec")).as("score"))
      .orderBy(col("score").desc, col("doc_key"))
      .limit(1)
    val hit = topDoc.collect().head
    assert(hit.getAs[String]("doc_key") === "pmc2", s"wrong doc: $hit")

    val w = Window.partitionBy(col("doc_key")).orderBy(col("cscore").desc, col("chunk_id"))
    val bestChunk = embedded
      .join(broadcast(topDoc.select(col("doc_key"))), "doc_key")
      .crossJoin(broadcast(qvec))
      .select(col("doc_key"), col("chunk_id"), col("paragraph"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("cscore"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().head
    assert(bestChunk.getAs[String]("paragraph") === "zeta zeta omega")
  }
}
