package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode is an explicit stub") {
    intercept[NotImplementedError](Multimodal.decodePayload(Array[Byte](1, 2)))
  }

  test("fake featurizer is deterministic, fixed-shape, normalized") {
    val f1 = Multimodal.fakeFeatures("hello world".getBytes)
    val f2 = Multimodal.fakeFeatures("hello world".getBytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === Multimodal.FeatureDim)
    assert(math.abs(f1.sum - 1.0) < 1e-12)
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val payload = Array.tabulate(256)(_.toByte) // 4 frames of 64
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, frameBytes = 64, stride = 2).collect()
    assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq === Seq(0L, 2L))
    frames.foreach(r => assert(r.getAs[Long]("frame_bytes") === 64L))
    val f0 = frames.find(_.getAs[Long]("frame_idx") == 0L).get
    assert(f0.getAs[Array[Byte]]("frame_payload").toSeq === payload.slice(0, 64).toSeq)
  }

  test("resize keeps the fixed output-size contract") {
    val df = Seq((1L, Array.tabulate(100)(_.toByte))).toDF("doc_id", "payload")
    val r = Multimodal.resizePayload(df, factor = 4).collect().head
    assert(r.getAs[Long]("orig_bytes") === 100L)
    assert(r.getAs[Long]("resized_bytes") === 25L)
    assert(r.getAs[Array[Byte]]("resized").toSeq === (0 until 100 by 4).map(_.toByte))
  }

  test("extractFeatures keeps schema and batches per partition") {
    val df = Seq((1L, "s1", "abc".getBytes), (2L, "s2", "defg".getBytes))
      .toDF("doc_id", "source", "payload")
    val out = Multimodal.extractFeatures(df).collect()
    assert(out.length === 2)
    val r = out.find(_.getLong(0) == 2L).get
    assert(r.getAs[Long]("n_bytes") === 4L)
    assert(r.getAs[Seq[Double]]("features").length === Multimodal.FeatureDim)
    assert(r.getAs[String]("digest").length === 64)
  }

  test("batched extraction: batch shape bounds work, results identical") {
    val df = (1L to 150L).map(i => (i, "s", s"payload-$i".getBytes))
      .toDF("doc_id", "source", "payload").repartition(2)
    val batched = Multimodal.extractFeaturesBatched(df, batchSize = 32).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bytes"), r.getAs[Seq[Double]]("features")))
      .toMap
    val plain = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bytes"), r.getAs[Seq[Double]]("features")))
      .toMap
    assert(batched === plain)
    assert(batched.size === 150)
  }

  test("png kernel: encode/decode roundtrip matches hand-computed fixture values") {
    // 2x1 image: pure red, pure blue — every value known by hand
    val png = Multimodal.encodePng(2, 1, (x, _) => if (x == 0) 0xff0000 else 0x0000ff)
    assert(png.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte), "not a PNG signature")
    val (w, h, rs, gs, bs) = Multimodal.decodePng(png)
    assert((w, h) === ((2, 1)))
    assert((rs, gs, bs) === ((255L, 0L, 255L)), "PNG decode must be lossless")
  }

  test("png kernel: decoded channel sums equal an independent docPixel recomputation") {
    val (id, w, h) = (7L, 13, 9)
    val png = Multimodal.encodePng(w, h, (x, y) => Multimodal.docPixel(id, x, y))
    val (dw, dh, rs, gs, bs) = Multimodal.decodePng(png)
    assert((dw, dh) === ((w, h)))
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val p = Multimodal.docPixel(id, x, y)
      er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
    }
    assert((rs, gs, bs) === ((er, eg, eb)),
      "decoded sums drifted from the encoded pixel function — decode is not real/lossless")
  }

  test("multimodal_decode: real PNG payloads decode to formula dims, deterministically") {
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.decodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val nDocs = Graft.documents(spark, dir).count()
    assert(out.size === nDocs)
    out.foreach { case (id, row) =>
      val Seq(pngBytes: Long, w: Long, h: Long, rm: Long, gm: Long, bm: Long) = row: @unchecked
      assert(w === 8 + id % 5, s"doc $id width")
      assert(h === 6 + id % 3, s"doc $id height")
      assert(pngBytes > 8, s"doc $id payload too small to be a PNG")
      Seq(rm, gm, bm).foreach(m => assert(m >= 0 && m <= 255000, s"doc $id mean out of range"))
    }
    val again = Multimodal.decodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(again === out, "PNG encode or decode is nondeterministic across runs")
  }

  test("aHash kernel equals an independent docPixel recomputation (lossless PNG)") {
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val png = Multimodal.encodePng(w, h, (x, y) => Multimodal.docPixel(id, x, y))
      val got = Multimodal.phashBits(png)
      // recompute straight from the pixel formula — never touches ImageIO
      val cells = for (j <- 0 until 8; i <- 0 until 8) yield {
        val p = Multimodal.docPixel(id, i * w / 8, j * h / 8)
        (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
      }
      val tot = cells.sum
      val expected = cells.foldLeft(0L)((acc, c) => (acc << 1) | (if (c * 64 > tot) 1L else 0L))
      assert(got === expected, s"doc $id")
    }
  }

  test("phash pairs: planted near-dup images found, distinct patterns clean") {
    // ten distinct random-pattern images, plus a near-dup of each that
    // perturbs ONE grid cell's pixel (small hamming); cross-pattern
    // hashes sit near hamming ~32, far beyond the verify radius
    val rows = (0L until 10L).flatMap { id =>
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val base = Multimodal.encodePng(w, h, (x, y) => Multimodal.docPixel(id, x, y))
      val near = Multimodal.encodePng(w, h, (x, y) =>
        if (x == 0 && y == 0) ~Multimodal.docPixel(id, x, y) & 0xffffff
        else Multimodal.docPixel(id, x, y))
      Seq((id, base), (id + 100L, near))
    }
    val hashes = Multimodal.imagePhash(rows.toDF("doc_id", "payload"))
    val pairs = Multimodal.phashPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter(p => p._2 == p._1 + 100L)
    assert(planted.length >= 8,
      s"most planted near-dups must be recalled, got ${planted.length}: ${pairs.toSeq}")
    planted.foreach(p => assert(p._3 <= 6))
    val cross = pairs.filterNot(p => p._2 == p._1 + 100L)
    assert(cross.isEmpty, s"no cross-pattern false pairs expected: ${cross.toSeq}")
  }

  test("multimodal_phash keyed query emits one stable hash per document") {
    val a = Multimodal.phash(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Multimodal.phash(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.size === 500)
  }

  test("multimodal_phash_pairs: mixed PNG+JPEG corpus, local recomputation, corrupt payloads drop") {
    // recompute every hash locally: PNG docs straight from the pixel
    // formula (lossless, ImageIO-free); JPEG docs through a local
    // encode+kernel call (the lossy decode is the codec's own output —
    // the point is that the DISTRIBUTED pipeline agrees with a local
    // per-payload recomputation). Then exact all-pairs hamming <= 6 —
    // the banded blocking must lose nothing at r <= 6.
    def pngHashOf(id: Long, perturb: Boolean): Long = {
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val cells = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (x, y) = (i * w / 8, j * h / 8)
        val p0 = Multimodal.docPixel(id, x, y)
        val p = if (perturb && x == 0 && y == 0) ~p0 & 0xffffff else p0
        (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
      }
      val tot = cells.sum
      cells.foldLeft(0L)((acc, c) => (acc << 1) | (if (c * 64 > tot) 1L else 0L))
    }
    def jpgHashOf(id: Long): Long = {
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      Multimodal.phashBits(
        Multimodal.encodeImage("jpg", w, h, (x, y) => Multimodal.docPixel(id, x, y)))
    }
    val ids = (0L until 500L)
    val hashes = ids.map(id =>
        id -> (if (Multimodal.codecOf(id) == "png") pngHashOf(id, perturb = false) else jpgHashOf(id))) ++
      ids.filter(_ % Multimodal.DupEvery == 0).map { id =>
        val twin = if (Multimodal.codecOf(id) == "png") pngHashOf(id, perturb = true)
          else jpgHashOf(id) // exact re-encode: identical payload, identical hash
        (id + Multimodal.DupIdOffset) -> twin
      }
    val expected = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes; if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb).toLong; if d <= 6
    } yield (ia, ib, d)).toSet
    val got = Multimodal.phashPairsQuery(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "planted twins must yield pairs")
    // every pair within radius is exactly a planted (id, id + offset)
    // twin — both codecs' dups found, distinct patterns stay clear
    assert(expected.forall { case (a, b, _) => b == a + Multimodal.DupIdOffset },
      "distinct patterns must stay outside the verify radius on this corpus")
    assert(expected.exists { case (a, _, _) => Multimodal.codecOf(a) == "png" }, "png twins found")
    assert(expected.exists { case (a, _, _) => Multimodal.codecOf(a) == "jpg" }, "jpg twins found")
    // the UNDECODABLE plants are exactly the dropped rows: input rows
    // minus hashed rows = planted truncated-payload count
    val corpus = Multimodal.syntheticImagesMixedWithDups(spark, "/root/testdata/sf0.001")
    val nBad = ids.count(_ % Multimodal.BadEvery == 0).toLong
    val nIn = corpus.count()
    val nHashed = Multimodal.imagePhash(corpus).count()
    assert(nIn - nHashed === nBad, s"expected exactly $nBad dropped corrupt payloads")
    assert(nBad > 0)
  }

  test("undecodable payloads drop their row instead of failing the query") {
    val rows = Seq(
      (1L, Multimodal.encodePng(8, 8, (x, y) => Multimodal.docPixel(1L, x, y))),
      (2L, Array[Byte](1, 2, 3, 4)), // garbage: not an image
      (3L, Multimodal.encodePng(8, 8, (x, y) => Multimodal.docPixel(3L, x, y))))
    val out = Multimodal.imagePhash(rows.toDF("doc_id", "payload")).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(Multimodal.phashBitsOpt(Array[Byte](9, 9)).isEmpty)
    intercept[IllegalArgumentException](Multimodal.phashBits(Array[Byte](9, 9)))
  }

  test("pdf ingestion is an explicit stub (reference parity)") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(("x")).toDF("pdf")
    intercept[NotImplementedError](graft.sources.Articles.fromPdf(df))
  }
}
