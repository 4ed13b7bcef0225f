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
}
