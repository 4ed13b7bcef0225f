package graft

import graft.operators._

/** Round-12 wave operators: the iterated BPE training loop, the Gopher
  * rep-2 top-bigram rule, and SemDeDup-style semantic dedup. Each test
  * recomputes the expected answer independently (plain Scala over the
  * collected sf0.001 corpus) and compares exactly — the in-JVM twin of
  * the DuckDB oracle.
  */
class Round12OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double): Long = if (x >= 0) math.round(x) else -math.round(-x)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val texts: Seq[(Long, String)] =
    Graft.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("bpeMergeSteps equals a plain-Scala BPE trainer with exact tie-breaks") {
    val wordRe = "[a-z]+".r
    val vocab = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { case (_, text) =>
      wordRe.findAllIn(text.toLowerCase).filter(_.length >= 2)
        .foreach(w => vocab(w) += 1L)
    }
    var toks: Map[Vector[String], Long] =
      vocab.toMap.groupBy { case (w, _) => w.split("").toVector }
        .map { case (syms, ws) => syms -> ws.values.sum }
    val expected = (1 to TextAnalysis.BpeMergeSteps).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      toks.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) += cnt
          case _ => ()
        }
      }
      val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, s"$a $b") }
      // apply the merge: left-to-right non-overlapping fold
      toks = toks.toSeq.map { case (syms, cnt) =>
        val out = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
        out -> cnt
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (step.toLong, s"$a $b", a + b, c)
    }
    val got = TextAnalysis.bpeMergeSteps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === expected)
    // round 1 must agree with the one-shot frontier's argmax
    val frontierTop = TextAnalysis.bpePairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[String]("pair")))
      .minBy { case (c, p) => (-c, p) }
    // bpePairs renders the pair without the separator ("er"); compare
    // the merged symbol and the weighted count
    assert((expected.head._3, expected.head._4) === ((frontierTop._2, frontierTop._1)))
  }

  test("topNgramFrac equals a per-doc argmax recomputation with tie-breaks") {
    val got = TextAnalysis.topNgramFrac(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[String]("top_gram"),
          r.getAs[Long]("top_count"), r.getAs[Long]("top_frac_micros"))).toMap
    var checked = 0
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+")
      if (toks.length >= 2) {
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val (gram, c) = grams.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.minBy { case (g, c) => (-c, g) }
        val n = grams.size.toLong
        assert(got(id) === ((n, gram, c, c * 1000000L / n)), s"doc $id")
        checked += 1
      } else assert(!got.contains(id), s"doc $id should be filtered")
    }
    assert(checked > 0)
  }

  test("streaks equals a plain gaps-and-islands recomputation") {
    val acts = Graft.events(spark, dir)
      .selectExpr("user_id", "(ts div 1000000000) div 86400 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = acts.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2).toSeq.sorted
      val islands = days.zipWithIndex.groupBy { case (d, i) => d - i }.values
        .map(_.size.toLong).toSeq
      u -> (islands.size.toLong, islands.max, days.size.toLong)
    }
    val got = Analytics.streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_streaks"),
        r.getAs[Long]("longest_streak"), r.getAs[Long]("n_active_days"))).toMap
    assert(got === expected)
    // streak semantics: at least one user must have a multi-day streak
    assert(got.values.exists(_._2 >= 2))
  }

  test("jsdDrift equals a plain-Scala JSD recomputation and is non-negative") {
    val docs = Graft.documents(spark, dir).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cst = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, t) =>
      t.toLowerCase.split("\\s+").foreach(tok => cst((src, tok)) += 1L)
    }
    val ct = cst.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ns = cst.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nTot = ns.values.sum
    val expected = ns.map { case (src, nS) =>
      var tn = 0L; var qn = 0L
      cst.foreach { case ((s2, tok), cSt) =>
        if (s2 == src) {
          val p = cSt.toDouble / nS
          val q = (ct(tok) - cSt).toDouble / (nTot - nS)
          val m = (p + q) / 2
          val term = 0.5 * p * math.log(p / m) +
            (if (ct(tok) - cSt > 0) 0.5 * q * math.log(q / m) else 0.0)
          tn += rnd(term * 1e9); qn += rnd(q * 1e9)
        }
      }
      src -> (nS, tn + rnd(0.5 * math.log(2) * (1000000000L - qn)))
    }
    val got = TextAnalysis.jsdDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("jsd_nanos")))
      .toMap
    assert(got === expected)
    assert(got.values.forall(_._2 >= 0L), "JSD must be non-negative")
  }

  test("heapsLaw equals an exact integer-OLS recomputation; beta in (0, 1]") {
    val pts = texts.map(_._2.toLowerCase.split("\\s+"))
      .filter(t => t.length >= 2 && t.distinct.length >= 1)
      .map(t => (rnd(math.log(t.length.toDouble) * 1000),
        rnd(math.log(t.distinct.length.toDouble) * 1000)))
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val want = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    val row = TextAnalysis.heapsLaw(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === want)
    assert(row.getLong(1) > 0 && row.getLong(1) <= 1000000L,
      s"Heaps beta out of (0,1]: ${row.getLong(1)}")
  }

  test("isotropy equals the closed-form ||sum u||^2 recomputation in exact integers") {
    val vecs = Graft.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val d = vecs.head.length
    def nrm(a: Array[Float]): Double =
      math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val qs = vecs.map { v => val n = nrm(v); v.map(x => rnd(x.toDouble / n * 1e6)) }
    val sq = (0 until d).map(j => BigInt(qs.map(_(j)).sum))
    val ss = sq.map(x => x * x).sum
    val selfss = qs.flatten.map(q => BigInt(q) * q).sum
    val n = vecs.length
    val want = rnd((ss - selfss).toDouble / (n.toDouble * (n.toDouble - 1.0)) / 1e6)
    val row = Ann.isotropy(spark, dir).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === want)
    assert(math.abs(row.getLong(1)) <= 1000000L, "mean cosine out of [-1, 1]")
  }

  test("splitAssign: cluster-pure splits drawn from the representative's md5") {
    val rows = Dedup.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === texts.length)
    // leakage guard: every near-dup cluster is split-pure
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $rep members straddle splits: ${members.toSeq}")
    }
    // the split is exactly the 48-bit md5 bucket of the representative
    rows.foreach { case (_, rep, split) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(rep.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val bucket = java.lang.Long.parseLong(hex, 16) % 100
      val want = if (bucket < 98) "train" else if (bucket < 99) "val" else "test"
      assert(split === want, s"rep $rep bucket $bucket")
    }
    assert(rows.map(_._3).distinct.length >= 2, "degenerate single-split corpus")
  }

  test("kcenterSample equals a plain greedy k-center recomputation; radius curve decreases") {
    val vecs = Graft.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    def dm(a: Array[Float], b: Array[Float]): Long =
      rnd((1 - round6(dot(a, b) / (nrm(a) * nrm(b)))) * 1000000)
    var chosen = List(vecs.head)
    val expected = scala.collection.mutable.ArrayBuffer(
      (1L, vecs.head._1, Option.empty[Long]))
    for (r <- 2 to Ann.KCenterPicks) {
      val (id, _, d) = vecs.map { case (id, v) =>
        (id, v, chosen.map(c => dm(v, c._2)).min)
      }.minBy { case (id, _, d) => (-d, id) }
      expected += ((r.toLong, id, Some(d)))
      chosen = chosen :+ vecs.find(_._1 == id).get
    }
    val got = Ann.kcenterSample(spark, dir).collect()
      .map(r => (r.getAs[Long]("pick"), r.getAs[Long]("vec_id"),
        Option(r.getAs[java.lang.Long]("dist_micros")).map(_.longValue())))
      .sortBy(_._1).toSeq
    assert(got === expected.toSeq)
    // the k-center radius never increases as centers are added
    val radii = got.flatMap(_._3)
    assert(radii === radii.sorted.reverse, s"radius curve not non-increasing: $radii")
  }

  test("semanticDedup equals an exact within-cell recomputation") {
    val vecs = Graft.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val ncents = math.max(8L, math.floor(math.sqrt(vecs.length.toDouble)).toLong)
    val cents = vecs.filter(_._1 < ncents)
    val asg = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, cv) =>
        (-round6(dot(v, cv) / (nrm(v) * nrm(cv))), cid)
      }.min
      id -> best._2
    }.toMap
    val byId = vecs.toMap
    val expected = vecs.flatMap { case (id, v) =>
      val mates = vecs.filter { case (oid, _) => oid < id && asg(oid) == asg(id) }
      val hits = mates.flatMap { case (oid, ov) =>
        val cm = rnd(round6(dot(v, ov) / (nrm(v) * nrm(ov))) * 1000000)
        if (cm >= Ann.SemDedupTauMicros) Some((oid, cm)) else None
      }
      if (hits.isEmpty) None
      else {
        val (keeper, cm) = hits.minBy(_._1)
        Some((id, asg(id), keeper, cm))
      }
    }.sortBy(_._1).toSeq
    val got = Ann.semanticDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Long]("keeper_id"), r.getAs[Long]("cos_micros")))
      .sortBy(_._1).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "threshold drops nothing on this corpus — not exercised")
    assert(got.forall { case (id, _, keeper, _) => keeper < id },
      "keeper must be the lower id")
    assert(byId.contains(got.head._1))
  }
}
