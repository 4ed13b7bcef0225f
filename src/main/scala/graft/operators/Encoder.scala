package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable BATCHED-encoder plumbing — the one reference shape the
  * operator surface didn't yet represent: the reference embeds chunk
  * text through a sentence-transformer in bounded batches
  * (qdrant.py:59 `embedding_batch_size=32`, qdrant.py:118-120
  * `self.model.encode(unnest(sections), batch_size=...)`;
  * dataset/armac_scientific_papers.py:15-35 flattens sections →
  * paragraphs, encodes the flat list batched, then regroups by the
  * recorded spans). The MODEL itself is not in this library's scope
  * (no inference runtime in a SQL/DataFrame engine — the sandbox has
  * no model either), so the encoder is a parameter with the batch
  * contract made explicit, and a deterministic stand-in implementation
  * exercises the plumbing end to end.
  *
  * Spark-side shape, designed for the 100 TB pipeline:
  *  - the chunk frame is already one row per (doc_id, chunk_id, text):
  *    Spark's partitioning IS the reference's flatten (sections arrive
  *    pre-exploded by the Chunking operators), so no driver-side
  *    unnest/span bookkeeping is needed — regrouping is free because
  *    ids ride along every row;
  *  - encoding runs inside `mapPartitions`: each task buffers at most
  *    `batchSize` texts, calls the encoder ONCE per buffer (the GPU /
  *    tokenizer amortization contract every real encoder wants), and
  *    emits rows zipped back to their ids — a pure map stage, no
  *    shuffle, linear in the corpus, embarrassingly parallel across
  *    executors;
  *  - the output is exactly the `embeddings`-table shape the rest of
  *    the library consumes (mean-pool doc vectors, index builds,
  *    serving walks), so a real encoder plugs in by swapping the
  *    function value — nothing else changes.
  *
  * Correctness contract (spec-asserted, EncoderSpec): the output is
  * independent of batch boundaries — any batchSize produces the same
  * rows as per-row encoding — and each encoder invocation sees at most
  * `batchSize` texts in input order.
  */
object Encoder {

  /** The pluggable batched encoder: a flat batch of texts in, one
    * vector per text out, positionally aligned. Implementations must
    * be PURE PER TEXT (no cross-text state) — that's what makes the
    * batching an executor-side amortization detail instead of a
    * semantic choice, and it is exactly how sentence-transformers'
    * `encode(list, batch_size=...)` behaves.
    */
  type BatchEncoder = Seq[String] => Seq[Array[Float]]

  /** Deterministic stand-in encoder (the sandbox has no model): token
    * unigram hashing into `dim` buckets with an md5-derived signed
    * weight per token, L2-normalized — the classic hashing-trick text
    * vector. Properties the specs lean on: pure per text, sensitive to
    * token multiset, unit-norm (cosine-ready), and cross-JVM
    * deterministic (md5, no JVM hashCode).
    */
  def standIn(dim: Int = 64): BatchEncoder = texts => texts.map { t =>
    val v = new Array[Float](dim)
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val sign = if ((d(4) & 1) == 0) 1f else -1f
      v((h % dim).toInt) += sign
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** Encode a chunk frame (doc_id, chunk_id, text-ish column) through a
    * batched encoder → (doc_id, chunk_id, embedding). The flatten →
    * batched encode → regroup of the reference collapses to one
    * mapPartitions: ids ride with their text through the buffer, so
    * the zip after each encoder call IS the regroup.
    */
  def encodeChunks(s: SparkSession, chunks: DataFrame, enc: BatchEncoder,
                   batchSize: Int = 32, textCol: String = "chunk"): DataFrame = {
    import s.implicits._
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val rows: Dataset[(Long, Long, String)] = chunks
      .select(col("doc_id").cast("long"), col("chunk_id").cast("long"),
        col(textCol).cast("string"))
      .as[(Long, Long, String)]
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = enc(batch.map(_._3))
        require(vecs.length == batch.length,
          s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
        batch.iterator.zip(vecs.iterator).map { case ((d, c, _), v) => (d, c, v) }
      }
    }.toDF("doc_id", "chunk_id", "embedding")
  }

  /** Document vectors straight off the batched encoder — the
    * reference's qdrant.py:121 mean-pool
    * (`article_embeddings_batch[i].mean(axis=0)`) applied to
    * [[encodeChunks]]' output: posexplode to (dim, component), one
    * map-side-combinable average per (doc, dim), collect back to a
    * vector. Identical aggregation shape to
    * SemanticSearch.docVectors, which does the same over the stored
    * embeddings table.
    */
  def encodeDocVectors(s: SparkSession, chunks: DataFrame, enc: BatchEncoder,
                       batchSize: Int = 32, textCol: String = "chunk"): DataFrame =
    encodeChunks(s, chunks, enc, batchSize, textCol)
      .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("doc_id"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ps"))
      .select(col("doc_id"),
        expr("transform(ps, p -> cast(p.m as float))").as("doc_vec"))
}
