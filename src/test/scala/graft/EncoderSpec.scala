package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Encoder}

/** Batched-encoder plumbing contract (reference: qdrant.py:59/118-121,
  * dataset/armac_scientific_papers.py:15-35): flatten → batched encode
  * → regroup must be a pure amortization detail — the output is
  * independent of batch boundaries, each encoder call sees at most
  * batchSize texts in order, and the doc mean-pool off the encoder
  * matches the reference's mean(axis=0).
  */
class EncoderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def chunkRows() = Chunking.sentences(spark, dir)

  private def collectEmb(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Seq[Float]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Float](2).toSeq).toMap

  test("output is independent of batch boundaries (1 vs 7 vs 32 vs per-row reference)") {
    val chunks = chunkRows()
    val enc = Encoder.standIn()
    val b32 = collectEmb(Encoder.encodeChunks(spark, chunks, enc, batchSize = 32))
    val b7 = collectEmb(Encoder.encodeChunks(spark, chunks, enc, batchSize = 7))
    val b1 = collectEmb(Encoder.encodeChunks(spark, chunks, enc, batchSize = 1))
    assert(b32.nonEmpty)
    assert(b7 === b32, "batchSize 7 diverged from 32")
    assert(b1 === b32, "batchSize 1 (per-row) diverged from 32")
    // per-row reference computed OUTSIDE the operator: the stand-in
    // applied text by text on the driver
    val texts = chunks
      .select(col("doc_id").cast("long"), col("chunk_id").cast("long"), col("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val ref = texts.map { case (d, c, t) => (d, c) -> enc(Seq(t)).head.toSeq }.toMap
    assert(b32 === ref, "batched operator diverged from driver-side per-row encoding")
  }

  test("encoder calls respect the batch-size bound and input order") {
    val chunks = chunkRows()
    val calls = spark.sparkContext.longAccumulator("calls")
    val rowsEnc = spark.sparkContext.longAccumulator("rowsEnc")
    val base = Encoder.standIn()
    val counting: Encoder.BatchEncoder = texts => {
      calls.add(1); rowsEnc.add(texts.length)
      // the bound is asserted where the violation would happen — a
      // failing require in an executor fails the job, failing the test
      require(texts.length <= 8, s"encoder saw a batch of ${texts.length} > 8")
      base(texts)
    }
    val out = Encoder.encodeChunks(spark, chunks, counting, batchSize = 8)
    val n = out.count()
    val total = chunks.count()
    assert(n === total)
    assert(rowsEnc.value === total, "every text encoded exactly once")
    // ceil(total/8) is the single-partition floor; partition boundaries
    // can only ADD calls, never exceed one call per row
    assert(calls.value >= (total + 7) / 8)
    assert(calls.value <= total)
  }

  test("doc mean-pool off the encoder matches the reference shape (mean(axis=0))") {
    val chunks = chunkRows()
    val enc = Encoder.standIn()
    val docVecs = Encoder.encodeDocVectors(spark, chunks, enc)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    // recompute driver-side from the per-chunk vectors
    val perChunk = collectEmb(Encoder.encodeChunks(spark, chunks, enc))
    val byDoc = perChunk.toSeq.groupBy(_._1._1)
    byDoc.foreach { case (doc, vs) =>
      val dim = vs.head._2.length
      val mean = (0 until dim).map { i =>
        (vs.map(_._2(i).toDouble).sum / vs.size).toFloat
      }
      val got = docVecs(doc)
      (0 until dim).foreach { i =>
        assert(math.abs(got(i) - mean(i)) < 1e-5f,
          s"doc $doc dim $i: ${got(i)} vs $mean")
      }
    }
    assert(docVecs.keySet === byDoc.keySet)
  }

  test("swapping the encoder value is the whole integration (pluggability)") {
    // a trivially different encoder (constant unit vector) flows through
    // the same plumbing — nothing in the operator depends on standIn
    val constant: Encoder.BatchEncoder = texts => texts.map { _ =>
      val v = new Array[Float](4); v(0) = 1f; v
    }
    val out = Encoder.encodeChunks(spark, chunkRows(), constant, batchSize = 16)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Float](2) == Seq(1f, 0f, 0f, 0f)))
  }
}
