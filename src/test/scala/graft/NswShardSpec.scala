package graft

import graft.operators.Ann

/** The shard-and-merge NSW retune path: past the centroid broadcast
  * budget, [[Ann.nswGraph]] routes to [[Ann.nswGraphSharded]] instead
  * of refusing. Driven on the spec corpus by LOWERING the budget (the
  * SkewSpec lowered-threshold trick) so the 500-vector table counts as
  * over-budget, then gated on the same ≥0.6 edge recall the flat build
  * carries in AnnSpec.
  */
class NswShardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  private def exactTop4: Set[(Long, Long)] = {
    val vecs = Graft.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    vecs.keys.flatMap { s =>
      vecs.keys.filter(_ != s).toSeq
        .map(d => (d, cos(vecs(s), vecs(d))))
        .sortBy { case (d, c) => (-c, d) }.take(4).map(p => (s, p._1))
    }.toSet
  }

  test("over budget, nswGraph routes to the sharded build and stays recall-bounded") {
    val saved = Ann.centroidBroadcastBudgetBytes
    try {
      // sqrt(500) ≈ 22 centroids × 300 B ≈ 6.6 KB: a 5 KB budget makes the
      // flat build refuse; shardCountFor lands on S=8 (2·sqrtFanout(62)·300
      // = 4.8 KB — the 8-centroid floor) which fits
      Ann.centroidBroadcastBudgetBytes = 5000L
      val thrown = intercept[IllegalArgumentException] {
        Ann.requireCentroidBudget(Ann.sqrtFanout(500L), "spec-flat")
      }
      assert(thrown.getMessage.contains("budget"))
      val sh = Ann.shardCountFor(500L)
      assert(sh >= 2)
      assert(2L * Ann.sqrtFanout(500L / sh) * Ann.centroidRowBytes <=
        Ann.centroidBroadcastBudgetBytes)

      val rows = Ann.nswGraph(spark, dir).collect() // routes: no refusal
      // same structural contract as the flat build
      rows.groupBy(_.getLong(0)).foreach { case (src, es) =>
        assert(es.length <= 4, s"src $src exceeds out-degree bound")
      }
      val edgeSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      rows.foreach { r =>
        assert(r.getAs[Boolean]("mutual") ===
          edgeSet.contains((r.getLong(1), r.getLong(0))))
      }
      val exact = exactTop4
      val recall = (edgeSet & exact).size.toDouble / exact.size
      info(s"sharded (S=$sh) nsw edge recall@4 = $recall")
      assert(recall >= 0.6, s"sharded nsw edge recall@4 = $recall")
    } finally {
      Ann.centroidBroadcastBudgetBytes = saved
    }
  }

  test("under budget, nswGraph still takes the flat path (memoized assignment)") {
    Graft.releaseCaches()
    val g = Ann.nswGraph(spark, dir)
    assert(g.count() > 0)
    // the flat path consumed (and so populated) the nprobe=3 memo
    assert(Ann.nswCells(spark, dir, 3) eq Ann.nswCells(spark, dir, 3))
  }
}
