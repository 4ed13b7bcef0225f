package graft

import graft.operators.{Ann, SemanticSearch}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // 64-dim vectors: id 0 (query) points at axis 0; ids 1..3 at
  // decreasing similarity to it; 100 points away (and is a kNN query).
  private def vec(axis0: Float, axis1: Float): Array[Float] = {
    val a = new Array[Float](64); a(0) = axis0; a(1) = axis1; a
  }

  private lazy val dir = tempSfDir(
    "embeddings" -> Seq(
      (0L, vec(1.0f, 0.0f), 0),
      (1L, vec(0.9f, 0.1f), 0),
      (2L, vec(0.7f, 0.3f), 0),
      (3L, vec(0.5f, 0.5f), 1),
      (100L, vec(0.0f, 1.0f), 1),
    ).toDF("vec_id", "embedding", "label"))

  test("brute force ranks by cosine to the query vector") {
    val got = Ann.bruteForce(spark, dir, k = 3).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 1L, 2L))
  }

  test("ivf probes the query's own cluster and ranks inside it") {
    val got = Ann.ivf(spark, dir, k = 3).collect()
    val ids = got.map(_.getLong(0)).toSeq
    assert(ids.head === 0L)            // query itself tops its cluster
    assert(got.map(_.getAs[Long]("cid")).distinct.length === 1)
  }

  test("knn join returns k neighbors per fixed-batch query vector") {
    val got = Ann.knnJoin(spark, dir, k = 2, q = 101).collect()
    val perQ = got.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQ === Map(0L -> 2, 1L -> 2, 2L -> 2, 3L -> 2, 100L -> 2))
    // 100's nearest must be 3 (closest to axis 1)
    val n100 = got.filter(r => r.getLong(0) == 100L).minBy(_.getAs[Long]("rn"))
    assert(n100.getAs[Long]("nb_id") === 3L)
  }

  test("ivf recall vs brute force on the real clustered corpus") {
    val real = "/root/testdata/sf0.001"
    val exact = Ann.bruteForce(spark, real, k = 5).collect().map(_.getLong(0)).toSet
    val approx = Ann.ivf(spark, real, k = 5).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall@5 = $recall (exact=$exact approx=$approx)")
  }

  test("nsw graph: degree-bounded, mutual edges symmetric, recall vs exact") {
    val real = "/root/testdata/sf0.001"
    val rows = graft.operators.Ann.nswGraph(spark, real).collect()
    rows.groupBy(_.getLong(0)).foreach { case (src, es) =>
      assert(es.length <= 4, s"src $src exceeds out-degree bound")
      assert(es.map(_.getAs[Long]("rn")).sorted.toSeq === (1L to es.length),
        s"src $src ranks not contiguous")
    }
    // mutual is exactly "the reverse edge also made the graph"
    val edgeSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(r.getAs[Boolean]("mutual") ===
        edgeSet.contains((r.getLong(1), r.getLong(0))))
    }
    // recall against exact top-4 neighbors, brute-forced driver-side
    // (500 vectors — the spec-scale corpus)
    val vecs = graft.Graft.embeddings(spark, real)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.keys.flatMap { s =>
      vecs.keys.filter(_ != s).toSeq
        .map(d => (d, cos(vecs(s), vecs(d))))
        .sortBy { case (d, c) => (-c, d) }.take(4).map(p => (s, p._1))
    }.toSet
    val recall = (edgeSet & exact).size.toDouble / exact.size
    // sqrt(N)-fanout 3-probe blocking + one NN-descent round measures
    // 0.70 here; 0.6 leaves margin without letting the build degrade
    assert(recall >= 0.6, s"nsw edge recall@4 = $recall")
  }

  test("lsh query bucket contains the query and ranks by cosine") {
    val real = "/root/testdata/sf0.001"
    val rows = Ann.lsh(spark, real, k = 5).collect()
    assert(rows.nonEmpty)
    // all hits share one bucket, and the query vector (global min id,
    // cosine 1.0 with itself) is the top hit
    assert(rows.map(_.getAs[String]("bucket")).distinct.length === 1)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
    assert(scores.head === 1.0)
  }

  test("quantized search agrees with brute force on clearly-ranked vectors") {
    // int8 quantization keeps relative order for well-separated cosines
    val got = Ann.quantizedSearch(spark, dir, k = 3).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 1L, 2L))
  }

  test("quantize summary: bounds and exactness") {
    val rows = Ann.quantize(spark, dir).collect()
    rows.foreach { r =>
      val norm2 = r.getAs[Long]("q_norm2")
      // each of 64 components is in [-127, 127]
      assert(norm2 >= 0 && norm2 <= 64L * 127 * 127)
      assert(r.getAs[Long]("scale_micros") >= 0)
    }
    // vec 0 = unit vector on axis 0: q = [127, 0, ...] exactly
    val v0 = rows.find(_.getLong(0) == 0L).get
    assert(v0.getAs[Long]("q_sum") === 127L)
    assert(v0.getAs[Long]("q_norm2") === 127L * 127)
  }

  test("hybrid rrf fuses both rankings with bounded scores") {
    val rows = graft.operators.KeywordSearch.hybridRrf(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(scores === scores.sorted.reverse)
    // max possible rrf = 1/61 + 1/61
    scores.foreach(v => assert(v > 0 && v <= 2.0 / 61 + 1e-12))
  }

  test("search pipeline returns docs ranked by doc score with context") {
    val rows = SemanticSearch.searchPipeline(spark, dir).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("doc_score")).toSeq
    assert(scores === scores.sorted.reverse)
    rows.foreach(r => assert(r.getAs[String]("ctx_vecs").nonEmpty))
  }
}
