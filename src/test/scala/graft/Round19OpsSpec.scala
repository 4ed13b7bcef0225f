package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-19 mandate evidence: the dedup-gated serving-graph build
  * ([[Ann.nswGraphDeduped]]) FIXES the dup-fragmentation failure mode
  * the r18 census only detected (docs/bench_r18_connectivity.md: a
  * 10×-replica corpus collapses the plain census to entry×replicas),
  * and the census reads identically off the written index generation.
  */
class Round19OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def lastRow(rows: Array[org.apache.spark.sql.Row]) =
    rows.maxBy(_.getLong(0))

  test("dedup-gated build: 10x-replica corpus returns to full reach, survivor graph equals the clean build") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    // 10 exact copies of each base vector under offset ids — the
    // bench_r18_connectivity.md pathology corpus
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"), col("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    val cleanDir = tempSfDir("embeddings" -> base)

    // the pathology: the PLAIN census on the replica corpus is fragmented
    val plain = lastRow(Ann.graphConnectivity(spark, dupDir).collect())
    assert(plain.getLong(2) === 500L)
    assert(plain.getLong(1) < 250L,
      s"expected dup-fragmentation in the plain build, reached ${plain.getLong(1)}/500")

    // the repair: the census over the dedup-gated build reaches EVERYTHING
    val fixed = lastRow(Ann.graphConnectivityDeduped(spark, dupDir).collect())
    assert(fixed.getLong(2) === 500L)
    assert(fixed.getLong(1) === 500L,
      s"dedup-gated build must restore full reach, got ${fixed.getLong(1)}/500")
    assert(fixed.getLong(3) === 1000000L)

    // non-duplicate neighborhoods are UNCHANGED: the survivor graph's
    // edges equal the clean-corpus flat build's exactly (same centroids,
    // same cells, same cosines, same ranks)
    val deduped = Ann.nswGraphDeduped(spark, dupDir)
    val survivorEdges = deduped.filter(!col("is_attach"))
      .select(col("src"), col("dst"), col("cos"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val cleanEdges = Ann.nswGraph(spark, cleanDir)
      .select(col("src"), col("dst"), col("cos"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(survivorEdges === cleanEdges,
      "survivor graph must equal the clean-corpus build edge-for-edge")

    // every replica attaches to its base (rn 0) plus the base's
    // neighborhood — <= k+1 attach edges each, cos 1.0 to the base
    val att = deduped.filter(col("is_attach")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val rn0 = att.filter(_._4 == 0L).map(t => (t._1, t._2, t._3))
    assert(rn0.map(_._1).toSet === (50L until 500L).toSet,
      "every replica needs exactly one rn-0 attach edge")
    rn0.foreach { case (d, c, cos) =>
      assert(c === d % 50L, s"replica $d must attach to its base, got $c")
      assert(cos === 1.0, s"exact replica's canonical cosine must be 1.0, got $cos")
    }
    val attCounts = att.groupBy(_._1).view.mapValues(_.length)
    assert(attCounts.values.forall(_ <= 5), "at most k+1 attach edges per duplicate")
    info(s"plain reach ${plain.getLong(1)}/500 -> deduped 500/500; " +
      s"${survivorEdges.size} survivor edges equal the clean build; ${att.length} attach edges")
  }

  test("near-dup (scaled) copies collapse to their canonical and attach") {
    // scaled copies have DIFFERENT bytes (the exact stage misses them)
    // but cosine 1.0 (same direction) — only the near-dup stage can
    // collapse them, so this pins stage 2 end-to-end
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"), col("label"))
    val scaled = base.select((col("vec_id") + 100L).as("vec_id"),
      expr("transform(embedding, x -> x * cast(1.5 as float))").as("embedding"),
      col("label"))
    val d2 = tempSfDir("embeddings" -> base.unionByName(scaled))
    val g = Ann.nswGraphDeduped(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    // scaled copies never appear in the survivor graph
    val graphNodes = g.filter(!_._5).flatMap(t => Seq(t._1, t._2)).toSet
    assert(graphNodes.nonEmpty && graphNodes.forall(_ < 40L),
      "scaled near-dups must not survive into the graph")
    // each scaled copy attaches to its original
    val rn0 = g.filter(t => t._5 && t._4 == 0L).map(t => t._1 -> t._2).toMap
    assert(rn0.keySet === (100L until 140L).toSet)
    rn0.foreach { case (d, c) => assert(c === d - 100L,
      s"scaled copy $d must attach to its original, got $c") }
    // and the whole corpus stays reachable
    val last = lastRow(Ann.graphConnectivityDeduped(spark, d2).collect())
    assert(last.getLong(1) === last.getLong(2),
      s"full reach expected, got ${last.getLong(1)}/${last.getLong(2)}")
  }

  test("serving off the repaired index: queries escape their copy-cliques") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"), col("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    def top1Scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter(col("rn") === 1L).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every query has 9 exact copies in the corpus, so a healthy index
    // returns a score-1.0 top hit for EVERY query; on the fragmented
    // plain index only queries whose copy-clique intersects the entry
    // set (base id 7 here) can reach one
    val plain = top1Scores(Ann.graphSearch(spark, dupDir))
    val fixed = top1Scores(Ann.graphSearchDeduped(spark, dupDir))
    assert(fixed.size === plain.size && fixed.nonEmpty)
    val fixedPerfect = fixed.values.count(_ === 1.0)
    val plainPerfect = plain.values.count(_ === 1.0)
    assert(fixedPerfect === fixed.size,
      s"repaired index must recover a 1.0 copy for every query, got $fixedPerfect/${fixed.size}")
    assert(plainPerfect < fixed.size / 2 + 1,
      s"expected the plain index trapped in entry cliques, got $plainPerfect perfect hits")
    // the canonical map routes every duplicate to its base
    val cmap = Ann.dedupCanonMap(spark, dupDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cmap.length === 500)
    cmap.foreach { case (v, c, d) =>
      assert(c === v % 50L, s"$v must map to its base, got $c")
      assert(d === (if (v >= 50L) 1L else 0L))
    }
    // the reweight half: every canonical carries its collapsed
    // multiplicity (10 copies -> weight 10, 9 of them duplicates)
    val weights = Ann.dedupCanonWeights(spark, dupDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(weights.length === 50)
    weights.foreach { case (c, w, nd) =>
      assert(c < 50L && w === 10L && nd === 9L, s"canon $c: weight $w dups $nd")
    }
    info(s"top-1=1.0 queries: plain $plainPerfect/${plain.size}, repaired $fixedPerfect/${fixed.size}")
  }

  test("graphSearchDedupedFromGen row-equals the live deduped walk") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val live = rows(Ann.graphSearchDeduped(spark, dir))
    val gen = rows(Ann.graphSearchDedupedFromGen(spark, dir))
    assert(gen === live, "written-generation deduped walk diverged from the live walk")
    assert(live.nonEmpty)
  }

  test("graphConnectivityFromGen row-equals the live census") {
    // a fleet monitors the PUBLISHED artifact, not the build session's
    // memo: the written-generation census must report exactly what the
    // live one does (read-equivalence, the walks' from-gen convention)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val live = rows(Ann.graphConnectivity(spark, dir))
    val gen = rows(Ann.graphConnectivityFromGen(spark, dir))
    assert(gen === live, "written-generation census diverged from the live census")
  }
}
