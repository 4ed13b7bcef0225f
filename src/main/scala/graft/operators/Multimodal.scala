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

  // BufferedImage/ImageIO run fine without a display but probe for one
  // unless headless is pinned
  System.setProperty("java.awt.headless", "true")

  /** STUB: a general media decoder (JPEG/audio/video codecs) would go
    * here. Deliberately unimplemented — no external codec libraries in
    * this build. PNG is the exception: [[decodePng]] is a REAL decode
    * on the JDK's built-in javax.imageio reader.
    */
  def decodePayload(payload: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "general media decode is stubbed: no external codec libraries in this " +
        "environment; PNG payloads decode for real via decodePng, and " +
        "fakeFeatures is the deterministic stand-in featurizer")

  /** REAL image encode (r12): render a width x height RGB image from a
    * pixel function and compress it to PNG bytes with the JDK's
    * javax.imageio writer — actual codec output, no external
    * dependency. PNG is lossless, so [[decodePng]] recovers every
    * pixel bit-exactly; the encoder is deterministic for fixed pixels,
    * so payload bytes are stable across runs and engines.
    */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] =
    encodeImage("png", width, height, rgb)

  /** REAL image encode for any format the JDK's javax.imageio writes
    * natively — "png" (lossless) and "jpg" (lossy DCT; the decoded
    * pixels differ from the input, which is exactly the re-encode
    * behavior the mixed-codec dedup corpus exists to exercise). The
    * encoder is deterministic for fixed pixels within a JDK, so payload
    * bytes are stable across runs.
    */
  def encodeImage(fmt: String, width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** REAL image decode: parse a PNG payload with javax.imageio and
    * reduce it to (width, height, exact per-channel integer sums) — the
    * projection an image-QA pass needs (dimensions + channel means)
    * without ever shipping decoded pixels off the executor. Integer
    * sums keep the downstream mean exact (sum*1000 div n_px) instead of
    * accumulation-order-sensitive float averaging.
    */
  def decodePng(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload of ${payload.length} bytes is not a decodable image")
    var (rs, gs, bs) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, rs, gs, bs)
  }

  /** Deterministic per-(doc, x, y) pixel: a splitmix64-style integer
    * mix so every document renders a distinct but reproducible pattern.
    */
  def docPixel(docId: Long, x: Int, y: Int): Int = {
    var z = docId * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L + y * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0xffffff).toInt
  }

  /** Synthetic image corpus: one REAL PNG payload per document (size
    * varies with doc_id so the dimension columns are exercised), as a
    * `binary` column — the multimodal table shape. Encoding is
    * mapPartitions so a real encoder would init once per partition.
    */
  /** doc_id driver frame of the synthetic image generators, hash-spread
    * over the cluster's cores BEFORE the CPU-bound encode/decode
    * kernels (r20 opt, guide §2.5): the documents scan is one ~600 KB
    * parquet split, so un-spread every generator ran its whole
    * encode+decode chain in ONE task (measured: phash_pairs spent 6.0s
    * of its 6.5s in a single-task job at sf0.1 on 32 idle cores).
    * Deterministic key (doc_id), scale-adaptive count (the cluster's
    * defaultParallelism) — the shuffle moves only 8-byte ids.
    */
  private def imageDocIds(s: SparkSession, dir: String) = {
    import s.implicits._
    Graft.documents(s, dir).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id")).as[Long]
  }

  def syntheticImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    imageDocIds(s, dir)
      .mapPartitions { it =>
        // codec context init would happen HERE, once per partition
        it.map { id =>
          val w = 8 + (id % 5).toInt
          val h = 6 + (id % 3).toInt
          (id, encodePng(w, h, (x, y) => docPixel(id, x, y)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL decode pass over a (doc_id, payload) binary column: PNG →
    * dimensions + exact channel means (milli units, integer division).
    * The pixels never leave the executor — only the 7-scalar projection
    * shuffles, so the operator is scan-bound at any corpus size.
    */
  def imageStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, rs, gs, bs) = decodePng(payload)
          (id, payload.length.toLong, w.toLong, h.toLong,
            rs * 1000L / (w * h), gs * 1000L / (w * h), bs * 1000L / (w * h))
        }
      }
      .toDF("doc_id", "png_bytes", "width", "height",
        "r_mean_milli", "g_mean_milli", "b_mean_milli")
  }

  /** The end-to-end real-kernel query: encode the corpus to PNG
    * payloads, decode them back, report dims + channel means. Rows-only
    * (a SQL engine cannot decode PNG); MultimodalSpec pins the kernel
    * to hand-computed fixture values and to an independent
    * recomputation of the channel sums from [[docPixel]].
    */
  def decodeStats(s: SparkSession, dir: String): DataFrame =
    imageStats(syntheticImages(s, dir))

  /** 64-bit average-hash (aHash) of a PNG payload — IMAGE near-dup
    * fingerprinting on the REAL decode path, fully integer-exact:
    * grayscale = r+g+b channel sum per pixel (no division), an 8×8
    * nearest-neighbor grid sample (cell (i,j) reads pixel
    * (i·w div 8, j·h div 8) — generalizes cleanly to any source size),
    * and bit (i,j) = cell gray > grid mean, compared as
    * cell·64 > Σcells so no division ever happens. Bit 0 is the MSB
    * (row-major), matching the simhash bit layout convention.
    */
  def phashBits(payload: Array[Byte]): Long =
    phashBitsOpt(payload).getOrElse(
      throw new IllegalArgumentException(
        s"payload of ${payload.length} bytes is not a decodable image"))

  /** Total (None-on-undecodable) variant of [[phashBits]]: a real corpus
    * carries corrupt payloads, and one bad image must drop its ROW, not
    * abort the executor task and with it the whole query. [[imagePhash]]
    * skips (and so implicitly counts, via the row delta) undecodable
    * payloads through this.
    */
  def phashBitsOpt(payload: Array[Byte]): Option[Long] = {
    // NonFatal, not just IOException: ImageIO readers throw runtime
    // exceptions (CMMException, ArrayIndexOutOfBounds, IllegalArgument)
    // on corrupt-but-recognized payloads, and those must also drop the
    // row rather than abort the task.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val cells = new Array[Long](64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val p = img.getRGB(i * w / 8, j * h / 8)
        cells(j * 8 + i) = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      j += 1
    }
    val tot = cells.sum
    var bits = 0L
    var b = 0
    while (b < 64) {
      bits = (bits << 1) | (if (cells(b) * 64 > tot) 1L else 0L)
      b += 1
    }
    Some(bits)
  }

  /** Per-image 64-bit perceptual hash over a (doc_id, payload) binary
    * column: one decode+hash kernel call per row inside mapPartitions
    * (codec init once per partition), only (doc_id, phash) shuffles —
    * the image-modality twin of `dedup_simhash`'s text signature.
    * Undecodable payloads DROP their row instead of aborting the task
    * (one corrupt image in a real corpus must not kill the query); the
    * failure count is the input-vs-output row delta, the same contract
    * as the CSV quarantine source.
    */
  def imagePhash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, payload) =>
        phashBitsOpt(payload).map(id -> _)
      })
      .toDF("doc_id", "phash")
  }

  /** The keyed query: real PNG encode → decode → aHash per document.
    * Rows-only (a SQL engine cannot decode PNG); MultimodalSpec pins
    * the kernel to an independent [[docPixel]] recomputation and the
    * pair blocking to planted near-duplicates.
    */
  def phash(s: SparkSession, dir: String): DataFrame =
    imagePhash(syntheticImages(s, dir))

  /** Every `DupEvery`-th document plants a near-duplicate twin. */
  val DupEvery = 25L

  /** Planted twins get doc_id + this offset (far above any corpus id). */
  val DupIdOffset = 1000000L

  /** Synthetic image corpus WITH planted near-duplicates: every
    * [[DupEvery]]-th document also emits a twin (id + [[DupIdOffset]])
    * whose PNG differs in exactly one pixel — the corpus shape the
    * pair query exists for. Distinct docPixel patterns hash to
    * ~hamming-32 signatures, so only the planted twins (and nothing
    * else, deterministically) fall inside the verify radius.
    */
  def syntheticImagesWithDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    imageDocIds(s, dir)
      .mapPartitions { it =>
        it.flatMap { id =>
          // planted-row id spaces must stay disjoint: base < dup twins
          // (+DupIdOffset) < bad payloads (+BadIdOffset). A corpus id
          // at or past DupIdOffset would collide with a twin id and
          // silently corrupt the planted-row accounting — fail loudly.
          require(id >= 0 && id < DupIdOffset,
            s"doc_id $id collides with the planted-twin id space (>= $DupIdOffset)")
          val w = 8 + (id % 5).toInt
          val h = 6 + (id % 3).toInt
          val base = (id, encodePng(w, h, (x, y) => docPixel(id, x, y)))
          if (id % DupEvery == 0)
            Iterator(base, (id + DupIdOffset, encodePng(w, h, (x, y) =>
              if (x == 0 && y == 0) ~docPixel(id, x, y) & 0xffffff
              else docPixel(id, x, y))))
          else Iterator(base)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Planted UNDECODABLE payloads get doc_id + this offset. */
  val BadIdOffset = 2000000L

  /** Every `BadEvery`-th document also plants a truncated payload. */
  val BadEvery = 50L

  /** Codec per document of the MIXED corpus: even ids PNG, odd JPEG —
    * the two formats javax.imageio both reads and writes natively.
    */
  def codecOf(id: Long): String = if (id % 2 == 0) "png" else "jpg"

  /** Synthetic MIXED-CODEC image corpus with planted duplicates and
    * corrupt payloads — the r15 corpus that kills the single-codec
    * caveat on the image-dedup family:
    *
    *  - even ids encode PNG, odd ids JPEG (one decode path, two real
    *    codecs);
    *  - every [[DupEvery]]-th PNG doc plants a ONE-PIXEL near-dup twin
    *    (lossless ⇒ hamming ≤ 6 exactly as the pixel formula predicts);
    *  - every [[DupEvery]]-th JPEG doc plants an EXACT RE-ENCODE twin
    *    (same pixels through the lossy codec ⇒ identical payload ⇒
    *    hamming 0 — the re-upload dup a crawl corpus actually contains;
    *    a one-pixel JPEG perturbation measures hamming up to 13 on
    *    these noise fields, outside any radius that still separates
    *    distinct patterns, min-hamming 14 across the 500-doc corpus);
    *  - every [[BadEvery]]-th doc plants a TRUNCATED payload
    *    (id + [[BadIdOffset]]) that the decode path must DROP, not
    *    throw on — the row-delta contract, spec-asserted.
    */
  def syntheticImagesMixedWithDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    imageDocIds(s, dir)
      .mapPartitions { it =>
        it.flatMap { id =>
          // same disjoint-id-space guard as syntheticImagesWithDups:
          // base ids must sit below the twin offset (and twins of ids
          // >= DupIdOffset would collide with bad ids)
          require(id >= 0 && id < DupIdOffset,
            s"doc_id $id collides with the planted-twin id space (>= $DupIdOffset)")
          val w = 8 + (id % 5).toInt
          val h = 6 + (id % 3).toInt
          val fmt = codecOf(id)
          val payload = encodeImage(fmt, w, h, (x, y) => docPixel(id, x, y))
          val base = Iterator((id, payload))
          val twin =
            if (id % DupEvery != 0) Iterator.empty
            else if (fmt == "png") Iterator((id + DupIdOffset, encodeImage(fmt, w, h, (x, y) =>
              if (x == 0 && y == 0) ~docPixel(id, x, y) & 0xffffff else docPixel(id, x, y))))
            else Iterator((id + DupIdOffset, encodeImage(fmt, w, h, (x, y) => docPixel(id, x, y))))
          val bad =
            if (id % BadEvery == 0) Iterator((id + BadIdOffset, payload.take(10)))
            else Iterator.empty
          base ++ twin ++ bad
        }
      }
      .toDF("doc_id", "payload")
  }

  /** The keyed IMAGE-dedup deliverable: real mixed-codec (PNG + JPEG)
    * encode → decode → aHash → pigeonhole-banded hamming pairs,
    * end-to-end over the dup-and-corruption-planted corpus
    * ([[syntheticImagesMixedWithDups]]). Rows-only (decode inside);
    * MultimodalSpec pins the result to a local per-payload
    * recomputation and asserts the corrupt payloads dropped.
    */
  def phashPairsQuery(s: SparkSession, dir: String): DataFrame =
    phashPairs(imagePhash(syntheticImagesMixedWithDups(s, dir)))

  /** Image near-dup pairs over a (doc_id, phash) frame: pigeonhole
    * band blocking (8 bands × 8 bits — hamming ≤ 7 guarantees one
    * equal band, covering the default verify radius 6) + exact
    * xor/bit_count hamming, the [[graft.operators.Dedup.simhashPairs]]
    * machinery pointed at the image modality. Candidates come from a
    * band-bucket self-join, never all-pairs; a real image corpus's
    * hot bands (flat/black images) fall to AQE's skew split like every
    * banded join here.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    val bands = hashes
      .select(col("doc_id"), col("phash"),
        posexplode(expr("transform(sequence(0, 7), b -> " +
          "shiftright(phash, cast((7 - b) * 8 as int)) & 255)"))
          .as(Seq("band_id", "band_val")))
      .hint("SHUFFLE_HASH")
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("cast(bit_count(a.phash ^ b.phash) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

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
