package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched feature extraction, and a STUBBED decoder.
  *
  * The real decode (image/audio libs) is not available in this
  * environment, so `decodePayload` is an explicit stub and the pipeline
  * runs a deterministic fake featurizer instead. Everything around it —
  * schema (binary + metadata struct), fixed-shape feature vectors,
  * per-partition batched execution — is real and tested.
  *
  * Scale notes: feature extraction is mapPartitions (one decoder init per
  * partition, not per row — the Scala analog of mapInPandas batching);
  * payloads never shuffle before the cheap metadata projection.
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB: the real decoder (JPEG/PNG/audio frames) would go here.
    * Deliberately unimplemented — no codec libraries in this build.
    */
  def decodePayload(payload: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "media decode is stubbed: no codec libraries in this environment; " +
        "use fakeFeatures for the deterministic test featurizer")

  /** Deterministic fake featurizer standing in for decode+embed: a
    * 16-bucket byte histogram, normalized by payload length. Fixed shape,
    * stable across runs — exactly what the downstream plumbing needs.
    */
  def fakeFeatures(payload: Array[Byte]): Array[Double] = {
    val h = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xff) % FeatureDim) += 1.0; i += 1 }
    if (payload.length > 0) { var j = 0; while (j < FeatureDim) { h(j) /= payload.length; j += 1 } }
    h
  }

  /** Frame sampling plumbing: treat the payload as a sequence of
    * fixed-size frames (a real decoder would yield decoded frames
    * HERE), keep every `stride`-th frame with its index and timestamp
    * slot. Output schema is what a video pipeline needs downstream:
    * (doc_id, frame_idx, frame_payload, frame_bytes).
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = payload.length / frameBytes
        (0 until n by stride).map { f =>
          (id, f.toLong, payload.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_payload")
      .withColumn("frame_bytes", length(col("frame_payload")).cast("long"))
  }

  /** Resize plumbing: deterministic byte-level downsample standing in
    * for an image resize (every `factor`-th byte) — keeps the
    * fixed-ratio output-size contract a resize kernel must satisfy.
    */
  def resizePayload(df: DataFrame, factor: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val out = new Array[Byte]((payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = payload(i * factor); i += 1 }
        (id, out, payload.length.toLong, out.length.toLong)
      }
      .toDF("doc_id", "resized", "orig_bytes", "resized_bytes")
  }

  /** Batched feature extraction with an explicit batch shape: payloads
    * are processed in fixed-size batches within each partition — the
    * JVM analog of mapInPandas/Arrow record batches, where the decoder
    * amortizes per-batch setup (GPU transfer, codec context) and peak
    * memory is bounded by batchSize x payload, not partition x payload.
    */
  def extractFeaturesBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init HERE (once), per-batch setup amortized below
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one unit HERE
          batch.map { case (id, src, payload) =>
            (id, src, payload.length.toLong, fakeFeatures(payload))
          }
        }
      }
      .toDF("doc_id", "source", "n_bytes", "features")
  }

  /** `documents` re-cast as a multimodal table: payload binary + typed
    * metadata + extracted fixed-shape features.
    */
  def meta(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Graft.documents(s, dir)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))
    // Scalar-only projection: the driver's rows-only gate sorts every
    // output column, so the array<double> features are rendered as one
    // deterministic string column (values on a fixed 6dp grid).
    extractFeatures(withPayload)
      .select(col("doc_id"), col("source"), col("n_bytes"), col("digest"),
        concat_ws(",", expr("transform(features, v -> format_number(v, 6))"))
          .as("features_str"))
  }

  /** Batched feature extraction over a (doc_id, source, payload) frame:
    * mapPartitions so a real decoder would init once per partition.
    * Output schema: doc_id, source, n_bytes, digest, features[16].
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // decoder/codec init would happen HERE, once per partition
        it.map { case (id, src, payload) =>
          (id, src, payload.length.toLong, fakeFeatures(payload))
        }
      }
      .toDF("doc_id", "source", "n_bytes", "features")
      .withColumn("digest", sha2(col("features").cast("string").cast("binary"), 256))
  }
}
