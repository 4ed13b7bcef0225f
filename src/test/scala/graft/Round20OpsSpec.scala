package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-20 mandate evidence: the collapse's bounded chain resolution
  * is PINNED (two pointer jumps resolve exactly 4×[[Ann.BuildDedupRounds]]
  * hops, and longer chains stay benign), and the LAYERED index build is
  * dedup-gated like the flat one ([[Ann.hnswGraphDeduped]]).
  */
class Round20OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def lastRow(rows: Array[org.apache.spark.sql.Row]) =
    rows.maxBy(_.getLong(0))

  /** A slowly-drifting unit-vector chain: adjacent cosine
    * cos(0.15) ≈ 0.9888 ≥ the 0.98 build threshold, two-apart cosine
    * cos(0.30) ≈ 0.9553 < it — so the near-dup graph is exactly the
    * path 0-1-…-(n-1), the adversarial shape for bounded min-label.
    */
  private def driftChain(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val theta = 0.15 * i
      val v = Array.tabulate(8)(d =>
        if (d == 0) math.cos(theta).toFloat
        else if (d == 1) math.sin(theta).toFloat else 0f)
      (i.toLong, v.toSeq, i.toLong % 4)
    }.toDF("vec_id", "embedding", "label")
  }

  test("a >12-hop near-dup chain: exact resolved radius, benign residual, full reach") {
    val n = 30
    val d = tempSfDir("embeddings" -> driftChain(n))
    // the two pointer jumps resolve min-labels of radius
    // BuildDedupRounds, then double twice: canon(v) = max(v - 12, 0)
    val radius = 4 * Ann.BuildDedupRounds
    val cmap = Ann.dedupCanonMap(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cmap.size === n)
    (0 until n).foreach { v =>
      assert(cmap(v.toLong) === math.max(v - radius, 0).toLong,
        s"canon($v) must be max(v-$radius, 0), got ${cmap(v.toLong)}")
    }
    // chains <= the radius are FULLY resolved (canon idempotent); the
    // residual beyond it is exactly the documented benign shape: a
    // dup's canon may itself be a dup, but pointers strictly decrease,
    // so iterating the map always terminates at a survivor
    (1 to radius).foreach(v => assert(cmap(cmap(v.toLong)) === cmap(v.toLong)))
    ((radius + 1) until n).foreach { v =>
      assert(cmap(cmap(v.toLong)) !== cmap(v.toLong),
        s"expected the residual non-idempotence beyond the radius at $v")
    }
    (1 until n).foreach { v =>
      var p = v.toLong
      var hops = 0
      while (cmap(p) != p && hops < n) { assert(cmap(p) < p); p = cmap(p); hops += 1 }
      assert(cmap(p) === p, s"iterated canon of $v must reach a survivor")
      assert(p === 0L)
    }
    // every chain member still attaches (rn 0) to its canon, the
    // survivor graph is empty (one survivor), and the census walks the
    // attach chain to FULL reach — connectivity never regresses
    val edges = Ann.nswGraphDeduped(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(edges.forall(_._4), "a single-survivor corpus has no survivor edges")
    val rn0 = edges.filter(_._3 == 0L).map(t => t._1 -> t._2).toMap
    assert(rn0.keySet === (1L until n).toSet)
    rn0.foreach { case (v, c) => assert(c === math.max(v - radius, 0L)) }
    val census = lastRow(Ann.graphConnectivityDeduped(spark, d).collect())
    assert(census.getLong(1) === n.toLong && census.getLong(2) === n.toLong,
      s"full reach expected over the attach chain, got ${census.getLong(1)}/$n")
    info(s"radius $radius pinned; residual ${n - 1 - radius} members benign; reach $n/$n")
  }
}
