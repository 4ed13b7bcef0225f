package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

  test("dot product of float arrays") {
    val a = typedLit(Array(1.0f, 2.0f, 3.0f))
    val b = typedLit(Array(4.0f, 5.0f, 6.0f))
    assert(one(VectorOps.dot(a, b)) === 32.0)
  }

  test("norm") {
    assert(one(VectorOps.norm(typedLit(Array(3.0f, 4.0f)))) === 5.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val v = typedLit(Array(0.5f, 0.25f))
    assert(math.abs(one(VectorOps.cosine(v, v)) - 1.0) < 1e-12)
    val x = typedLit(Array(1.0f, 0.0f)); val y = typedLit(Array(0.0f, 2.0f))
    assert(one(VectorOps.cosine(x, y)) === 0.0)
  }

  test("meanPool averages elementwise") {
    val vecs = typedLit(Array(Array(1.0f, 2.0f), Array(3.0f, 6.0f)))
    val got = Seq(1).toDF("x").select(VectorOps.meanPool(vecs, 2).as("m"))
      .head().getSeq[Double](0)
    assert(got == Seq(2.0, 4.0))
  }
}
