package graft

import graft.operators.Ann

/** Round-17 depth work: the quantized serving tier's deployment split.
  * Flat (18p11) and layered (18p13) serving already run off written
  * generations; these specs assert the same contract for the int8
  * index — the artifact a serving fleet actually ships (4× memory cut):
  * loading the written generation and walking it returns byte-identical
  * rows to the live in-memory walk, and the artifact carries ONLY
  * quantized codes + integer-exact norms (no float vectors).
  */
class Round17OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("q_id", "rn", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("int8 walk off the written generation equals the live walk") {
    val live = rows(Ann.graphSearchInt8(spark, dir))
    val fromGen = rows(Ann.graphSearchInt8FromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation int8 serving diverged from the live in-memory walk")
    info(s"${live.map(_._1).distinct.size} queries, ${live.size} rows, " +
      "live and written-generation paths identical")
  }

  test("filtered walk off the written generation equals the live filtered walk") {
    // the last serving walk without a deployment split: the written
    // generation's adjacency carries dlabel and its entry set nlabel,
    // so the metadata-constrained query serves off the same on-disk
    // artifact the unfiltered walk reads
    val live = rows(Ann.graphSearchFiltered(spark, dir))
    val fromGen = rows(Ann.graphSearchFilteredFromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation filtered serving diverged from the live walk")
    info(s"${live.map(_._1).distinct.size} queries, ${live.size} rows, " +
      "live and written-generation filtered paths identical")
  }

  test("layered filtered walk: results pass the filter with exact scores") {
    // the oracle pins the walk end to end; the spec pins the two
    // invariants independent of graph shape: every returned node
    // satisfies the metadata filter, and every returned score IS the
    // true cosine(query, node) recomputed from the raw vectors
    import org.apache.spark.sql.functions._
    val out = Ann.hnswSearchFiltered(spark, dir)
    val got = rows(out)
    assert(got.nonEmpty)
    val emb = Graft.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getInt(2))).toMap
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (q, _, v, score) =>
      assert(emb(v)._2.toLong % Ann.GraphSearchFilterMod === Ann.GraphSearchFilterRes,
        s"result $v for query $q does not pass the label filter")
      assert(cos6(emb(q)._1, emb(v)._1) === score,
        s"returned score for ($q, $v) is not the true cosine")
    }
    // per-query ranks are dense from 1
    got.groupBy(_._1).values.foreach { qs =>
      assert(qs.map(_._2).sorted === (1L to qs.size).toSeq)
    }
    info(s"${got.map(_._1).distinct.size} queries, ${got.size} rows, " +
      "all filter-passing with exact recomputed scores")
  }

  test("filtered layered walk: driver, distributed and routed paths are identical") {
    // the Round16OpsSpec contract extended to the new walk: every
    // serving walk routes through the GraphSearchDistQ dispatch, and
    // the two physical paths must return the same rows
    val q = Ann.graphSearchQueries(spark, dir)
    val driver = rows(Ann.hnswSearchFilteredBatch(spark, dir, q, distThreshold = Int.MaxValue))
    val dist = rows(Ann.hnswSearchFilteredBatch(spark, dir, q, distThreshold = 0))
    val routed = rows(Ann.hnswSearchFiltered(spark, dir))
    assert(driver.nonEmpty)
    assert(dist === driver, "distributed filtered layered walk diverged from the driver path")
    assert(routed === driver, "routed keyed walk diverged from the driver path")
    info(s"${driver.size} rows identical across driver/distributed/routed paths")
  }

  test("filtered layered walk off the written generation equals the live walk") {
    // the final cell of the serving matrix: all five walks serve both
    // live and from a restart-safe written generation
    val live = rows(Ann.hnswSearchFiltered(spark, dir))
    val fromGen = rows(Ann.hnswSearchFilteredFromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation filtered layered serving diverged from the live walk")
  }

  test("layered filtered recall curve: adaptive ef widens as the filter tightens") {
    val rows = Ann.hnswSearchFilteredRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Ann.FilterCurveMods)
    // the adaptive-ef rule is monotone in selectivity: tighter filter
    // (larger mod) ⇒ wider navigation beam, clamped to EfMax
    rows.sliding(2).foreach { case Array((m1, e1, _), (m2, e2, _)) =>
      assert(e1 <= e2, s"ef must not shrink from mod $m1 (ef $e1) to mod $m2 (ef $e2)")
    }
    rows.foreach { case (m, ef, rec) =>
      assert(ef >= Ann.GraphSearchBeam && ef <= Ann.GraphSearchEfMax)
      assert(rec >= 0L && rec <= 1000000L, s"recall out of range at mod $m")
    }
  }

  test("int8 filtered walk: driver, distributed and routed paths are identical") {
    val q = Ann.graphSearchQueries(spark, dir)
    val driver = rows(Ann.graphSearchInt8FilteredBatch(spark, dir, q, distThreshold = Int.MaxValue))
    val dist = rows(Ann.graphSearchInt8FilteredBatch(spark, dir, q, distThreshold = 0))
    val routed = rows(Ann.graphSearchInt8Filtered(spark, dir))
    assert(driver.nonEmpty)
    assert(dist === driver, "distributed int8-filtered walk diverged from the driver path")
    assert(routed === driver, "routed keyed int8-filtered walk diverged from the driver path")
  }

  test("int8 filtered walk off the written generation equals the live walk") {
    // the quantized + filtered combination (Qdrant composes scalar
    // quantization WITH query filters on one collection), served both
    // live and from the written artifact
    val live = rows(Ann.graphSearchInt8Filtered(spark, dir))
    val fromGen = rows(Ann.graphSearchInt8FilteredFromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation int8-filtered serving diverged from the live walk")
  }

  test("the written int8 generation carries no float vectors") {
    val (adj, entry) = Ann.writtenInt8Gen(spark, dir)
    // the artifact's whole point is the 4x memory cut: quantized codes
    // (+ their exact norms) and the filterable integer payload only — a
    // float embedding column in either frame would silently ship the
    // full-precision index
    assert(adj.columns.toSet === Set("src", "dst", "dq", "dn8", "dlabel"))
    assert(entry.columns.toSet === Set("node", "nq", "nn8", "nlabel"))
    val floatish = (adj.schema ++ entry.schema).filter { f =>
      f.dataType.simpleString.contains("float")
    }
    assert(floatish.isEmpty, s"float vector columns in the quantized artifact: $floatish")
    assert(adj.count() > 0 && entry.count() > 0)
  }
}
