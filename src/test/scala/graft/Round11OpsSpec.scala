package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-11 wave-2 operators: Gopher rule-based quality gate, BPE
  * merge-step pair counts, DSIR importance weights, and the PCA
  * power-iteration step. Each test recomputes the expected answer
  * independently (plain Scala over the collected sf0.001 corpus) and
  * compares exactly — the in-JVM twin of the DuckDB oracle.
  */
class Round11OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String, String)] =
    Graft.documents(spark, dir).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("gopherQuality flags match a plain-Scala recomputation and discriminate") {
    val stops = Set("the", "a", "of", "is", "der", "die", "das", "und", "le",
      "la", "et", "les", "el", "los", "las", "y", "的", "是", "在", "了")
    val got = TextAnalysis.gopherQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("mean_wlen_micros"),
          r.getAs[Long]("symbol_micros"),
          r.getAs[Long]("n_stop_distinct"), r.getAs[Long]("keep"))).toMap
    docs.foreach { case (id, text, _) =>
      val toks = text.toLowerCase.split("\\s+")
      val n = toks.length.toLong
      val meanWlen = toks.map(_.length.toLong).sum * 1000000L / math.max(n, 1L)
      val nStop = toks.toSet.count(stops.contains).toLong
      val alpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong *
        1000000L / math.max(n, 1L)
      // '#' count + non-overlapping '...' occurrences (String.replace
      // consumes left-to-right exactly like Spark's replace())
      val symbol = (text.count(_ == '#').toLong +
        (text.length - text.replace("...", "").length) / 3L) *
        1000000L / math.max(n, 1L)
      val keep = if (n >= 20 && n <= 100000 && meanWlen >= 3000000 &&
        meanWlen <= 10000000 && symbol <= 100000 && alpha >= 800000 &&
        nStop >= 2) 1L else 0L
      val (gn, gw, gsym, gs, gk) = got(id)
      assert(gn === n); assert(gw === meanWlen); assert(gsym === symbol)
      assert(gs === nStop); assert(gk === keep)
    }
    val keeps = got.values.map(_._4).toSeq
    assert(keeps.contains(0L) && keeps.contains(1L),
      "keep decision must discriminate on this corpus")
  }

  test("bpePairs equals exact pair counts with the (count desc, pair asc) cut") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text, _) =>
      "[a-z]+".r.findAllIn(text.toLowerCase).filter(_.length >= 2).foreach { w =>
        w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
      }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextAnalysis.bpePairs(spark, dir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"))).toSeq
    assert(got === expected)
  }

  test("dsirWeights matches the exact hashed-bucket log-ratio recomputation") {
    val bkOf = (tok: String) => {
      val h = md5hex(tok)
      val hexpos = (c: Char) => "0123456789abcdef".indexOf(c).toLong
      hexpos(h(0)) * 16 + hexpos(h(1))
    }
    // (doc, bucket) occurrence counts and the target/raw bucket split
    val occ = docs.flatMap { case (id, text, src) =>
      text.toLowerCase.split("\\s+").map(t => (id, src, bkOf(t)))
    }.groupBy(identity).map { case ((id, src, bk), v) => (id, src, bk, v.size.toLong) }
    val cT = occ.filter(_._2 == "src0").groupBy(_._3).map { case (bk, v) => bk -> v.map(_._4).sum }
    val cR = occ.filter(_._2 != "src0").groupBy(_._3).map { case (bk, v) => bk -> v.map(_._4).sum }
    val (nt, nr) = (cT.values.sum, cR.values.sum)
    val lr = (0L until 256L).map { bk =>
      bk -> math.round((math.log(cT.getOrElse(bk, 0L) + 1.0) - math.log(nt + 256.0)
        - math.log(cR.getOrElse(bk, 0L) + 1.0) + math.log(nr + 256.0)) * 1000000)
    }.toMap
    val expected = occ.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.map(_._4).sum, rows.map(r => r._4 * lr(r._3)).sum)
    }
    val got = TextAnalysis.dsirWeights(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("lr_sum_micros"))).toMap
    assert(got === expected)
    // the DSIR premise: target-source docs rank above the raw pool on average
    val (tgt, raw) = docs.partition(_._3 == "src0")
    def meanW(ids: Seq[Long]) = ids.map(id => got(id)._2.toDouble).sum / ids.size
    assert(meanW(tgt.map(_._1)) > meanW(raw.map(_._1)),
      "mean importance weight of target-source docs must exceed the raw pool's")
  }

  test("ccnetBuckets: per-language tertiles are exact type-1 and buckets partition each language") {
    val rows = TextAnalysis.ccnetBuckets(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("nll_per_tok_micros"), r.getAs[String]("bucket")))
    assert(rows.length === docs.length)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val nlls = rs.map(_._3).sorted
      val n = nlls.length
      val t1 = nlls((n + 2) / 3 - 1) // type-1: value at ceil(n/3) (1-based)
      val t2 = nlls((2 * n + 2) / 3 - 1)
      rs.foreach { case (id, _, nll, bucket) =>
        val expect = if (nll <= t1) "head" else if (nll <= t2) "middle" else "tail"
        assert(bucket === expect, s"doc $id lang $lang nll $nll")
      }
      // every language must see all three bands on this corpus
      assert(rs.map(_._4).toSet === Set("head", "middle", "tail"), s"lang $lang")
    }
  }

  test("knnOutliers picks the bottom-10 mean neighbor cosines from the NSW edge frame") {
    val edges = Ann.nswGraph(spark, dir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Double]("cos")))
    val expected = edges.groupBy(_._1).map { case (src, es) =>
      val qs = es.map(e => math.round(e._2 * 1000000))
      (src, es.length.toLong, qs.sum / qs.length)
    }.toSeq.sortBy(t => (t._3, t._1)).take(10)
    val got = Ann.knnOutliers(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[Long]("mean_cos_micros"))).toSeq
    assert(got === expected)
  }

  test("oovRate matches the greedy-vocab recomputation with the rank-boundary tie-break") {
    val tokens = docs.flatMap { case (id, text, _) =>
      text.toLowerCase.split("\\s+").map(t => (id, t))
    }
    val vocab = tokens.groupBy(_._2).map { case (t, v) => (t, v.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(16).map(_._1).toSet
    val expected = tokens.groupBy(_._1).map { case (id, ts) =>
      val n = ts.size.toLong
      val oov = ts.count(t => !vocab.contains(t._2)).toLong
      id -> (n, oov, oov * 1000000L / n)
    }
    val got = TextAnalysis.oovRate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_toks"),
        r.getAs[Long]("n_oov"), r.getAs[Long]("oov_micros"))).toMap
    assert(got === expected)
    assert(got.values.map(_._3).toSet.size > 1, "OOV rate must discriminate")
  }

  test("driftSplit matches the exact parity-split mean recomputation") {
    val vecs = Graft.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val d = vecs.head._2.length
    val expected = (0 until d).map { j =>
      def side(p: Long) = {
        val qs = vecs.filter(_._1 % 2 == p).map(v => math.round(v._2(j).toDouble * 1000000))
        (qs.sum, qs.length.toLong)
      }
      val ((sa, na), (sb, nb)) = (side(0), side(1))
      (j.toLong, na, nb, sa / na, sb / nb, sb / nb - sa / na)
    }
    val got = Ann.driftSplit(spark, dir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("mean_a_micros"),
        r.getAs[Long]("mean_b_micros"), r.getAs[Long]("delta_micros")))
      .sortBy(_._1).toSeq
    assert(got === expected)
    // per-side counts make a degenerate one-parity split visible
    assert(got.forall(g => g._2 > 0 && g._3 > 0))
  }

  test("lshCurve matches the math.pow recomputation; threshold falls as bands widen") {
    val got = Dedup.lshCurve(spark, dir).collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("r"), r.getAs[Long]("threshold_micros"),
        r.getAs[Long]("p50_micros"), r.getAs[Long]("p70_micros"), r.getAs[Long]("p90_micros")))
      .sortBy(_._1).toSeq
    val expected = Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)).map { case (b, r) =>
      def p(s: Double) = math.round((1 - math.pow(1 - math.pow(s, r), b)) * 1000000)
      (b.toLong, r.toLong, math.round(math.pow(1.0 / b, 1.0 / r) * 1000000),
        p(0.5), p(0.7), p(0.9))
    }.sortBy(_._1)
    assert(got === expected)
    // more bands = looser threshold and higher collision probability
    assert(got.map(_._3) === got.map(_._3).sorted.reverse)
    assert(got.map(_._6) === got.map(_._6).sorted)
  }

  test("pcaIterate: 3 exact integer power rounds; step-1 spectrum equals pcaPowerStep's") {
    def rnd(x: Double): Long = if (x >= 0) math.round(x) else -math.round(-x)
    val xq = Graft.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.round(x.toDouble * 1000)))
    val d = xq.head.length
    var v = Array.tabulate(d)(j => if (j % 2 == 0) 1000L else -1000L)
    var s = Array.empty[Long]
    val spectra = (1 to 3).map { _ =>
      s = Array.fill(d)(0L)
      xq.foreach { row =>
        val w = row.indices.map(j => row(j) * v(j)).sum / 1000
        var j = 0
        while (j < d) { s(j) += w * row(j); j += 1 }
      }
      val m = s.map(math.abs).max
      v = s.map(x => rnd(x.toDouble / m * 1000))
      s.clone()
    }
    val oneStep = Ann.pcaPowerStep(spark, dir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("s_q"))).sortBy(_._1).map(_._2)
    assert(oneStep.toSeq === spectra.head.toSeq,
      "iterate round 1 must equal the single power step")
    val mAbs = spectra.last.map(math.abs).max
    val got = Ann.pcaIterate(spark, dir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("s_q"), r.getAs[Long]("ratio_micros")))
      .sortBy(_._1)
    got.foreach { case (dim, sq, ratio) =>
      assert(sq === spectra.last(dim.toInt))
      assert(ratio === rnd(spectra.last(dim.toInt).toDouble / mAbs * 1000000))
    }
  }

  test("shardPlan covers every document once and sizes shards from the token total") {
    val rows = TextAnalysis.shardPlan(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("fill_micros")))
    val totToks = docs.map(_._2.toLowerCase.split("\\s+").length.toLong).sum
    val nShards = (totToks + 4095) / 4096
    assert(rows.map(_._2).sum === docs.length.toLong)
    assert(rows.map(_._3).sum === totToks)
    assert(rows.forall(r => r._1 >= 0 && r._1 < nShards))
    rows.foreach(r => assert(r._4 === r._3 * 1000000L / 4096L))
    // hash assignment must not collapse into one shard
    if (nShards > 1) assert(rows.length > 1)
  }

  test("pcaPowerStep matches the exact integer recomputation; max ratio is ±1e6") {
    val vecs = Graft.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val xq = vecs.map(_.map(x => math.round(x.toDouble * 1000)))
    val d = xq.head.length
    val s = Array.fill(d)(0L)
    xq.foreach { v =>
      val w = v.zipWithIndex.map { case (x, i) => if (i % 2 == 0) x else -x }.sum
      var j = 0
      while (j < d) { s(j) += w * v(j); j += 1 }
    }
    val m = s.map(math.abs).max
    val rows = Ann.pcaPowerStep(spark, dir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("s_q"), r.getAs[Long]("ratio_micros")))
      .sortBy(_._1)
    assert(rows.length === d)
    rows.foreach { case (dim, sq, ratio) =>
      assert(sq === s(dim.toInt))
      assert(ratio === math.round(s(dim.toInt).toDouble / m * 1000000))
    }
    assert(rows.map(_._3).map(math.abs).max === 1000000L)
  }
}
