package graft

import graft.operators._

/** Plain-Scala recomputations for the round-13 additions beyond the
  * verdict worklist — the in-JVM twin of their DuckDB oracles, over the
  * collected sf0.001 corpus.
  */
class Round13WaveSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfidfCosinePairs equals a plain-Scala truncated sparse-cosine join") {
    val texts = Graft.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val tf: Map[(Long, String), Long] = texts.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+")
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(p => (id, p.mkString(" "))).toSeq
    }.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val dfreq = tf.keys.groupBy(_._2).map { case (tok, ks) => tok -> ks.size.toLong }
    val n = texts.size.toDouble
    val top: Map[Long, Seq[(String, Double)]] = tf.toSeq
      .map { case ((id, tok), c) => (id, tok, round6(c * math.log(n / dfreq(tok)))) }
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(r => (-r._3, r._2)).take(8).map(r => (r._2, r._3))
      }
    val q: Map[Long, Map[String, Long]] = top.map { case (id, ws) =>
      val nrm = math.sqrt(ws.map(w => w._2 * w._2).sum)
      id -> ws.map { case (tok, w) => tok -> math.round(w / nrm * 1000000) }.toMap
    }
    val ids = q.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      shared = q(a).keySet & q(b).keySet if shared.nonEmpty
      dot = shared.toSeq.map(t => q(a)(t) * q(b)(t)).sum
      cos = Math.floorDiv(dot, 1000000L) if cos >= 800000L
    } yield (a, b) -> cos).toMap
    val got = TextAnalysis.tfidfCosinePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "spec corpus must contain sparse-cosine near-dups")
  }

  test("clusterPurity equals a plain-Scala majority-source audit") {
    val labels = Dedup.clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = Graft.documents(spark, dir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = labels.groupBy(_._2).collect {
      case (rep, members) if members.size >= 2 =>
        val bySrc = members.keys.groupBy(src).map { case (sv, ds) => sv -> ds.size.toLong }
        val (topSource, nTop) = bySrc.toSeq.minBy { case (sv, c) => (-c, sv) }
        rep -> (members.size.toLong, topSource, nTop,
          nTop * 1000000L / members.size)
    }
    val got = Dedup.clusterPurity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("pqRecallEval stages are overlaps of the actual pq/refine/exact top-k sets") {
    val exact = Ann.bruteForce(spark, dir, 5).collect().map(_.getLong(0)).toSet
    val adc = Ann.pq(spark, dir, 5).collect().map(_.getLong(0)).toSet
    val ref = Ann.pqRefine(spark, dir, 5).collect().map(_.getLong(0)).toSet
    val got = Ann.pqRecallEval(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("adc") === (exact & adc).size.toLong)
    assert(got("refined") === (exact & ref).size.toLong)
  }
}
