package graft

import graft.operators.Ann

/** Round-14 operators: batch graph search through the built NSW index.
  * The DuckDB oracle proves cross-engine agreement; these tests prove
  * the SEMANTICS independently — a plain-Scala recomputation of the
  * seeded beam expansion over the same edge frame must reproduce the
  * operator's result set exactly, and the measured recall must clear
  * the graph-quality bound.
  */
class Round14OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def cosR(a: Array[Float], b: Array[Float]): Double = {
    // widen to double BEFORE multiplying, matching the fvec kernels
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val (x, y) = (a(i).toDouble, b(i).toDouble)
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    Graft.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val und: Map[Long, Set[Long]] = {
    val m = scala.collection.mutable.Map.empty[Long, Set[Long]]
    Ann.nswGraph(spark, dir).select("src", "dst").collect().foreach { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      m(s) = m.getOrElse(s, Set.empty) + d
      m(d) = m.getOrElse(d, Set.empty) + s
    }
    m.toMap
  }

  /** Plain-Scala twin of Ann.graphSearch's seeded synchronized beam. */
  private def beamRef(q: Long, beam: Int, rounds: Int, k: Int): Seq[(Long, Double)] = {
    val cents = vecs.keys.filter(_ < Ann.sqrtFanout(vecs.size.toLong)).toSeq
    def sc(n: Long) = cosR(vecs(n), vecs(q))
    var state: Map[Long, Double] = cents.filter(_ != q).map(n => n -> sc(n))
      .sortBy { case (n, s) => (-s, n) }.take(1).toMap
    for (_ <- 1 to rounds) {
      val cand = state ++ state.keys.flatMap(und.getOrElse(_, Set.empty))
        .filter(n => n != q && !state.contains(n)).map(n => n -> sc(n))
      state = cand.toSeq.sortBy { case (n, s) => (-s, n) }.take(beam).toMap
    }
    state.toSeq.sortBy { case (n, s) => (-s, n) }.take(k)
  }

  test("graphSearch equals the plain-Scala seeded-beam recomputation") {
    val got = Ann.graphSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val qids = vecs.keys.toSeq.sorted.filter(_ % 25 == 7).take(Ann.GraphSearchQueryCount)
    val expected = qids.flatMap { q =>
      beamRef(q, Ann.GraphSearchBeam, Ann.GraphSearchRounds, Ann.GraphSearchK)
        .zipWithIndex.map { case ((n, s), i) => (q, (i + 1).toLong, n, s) }
    }
    assert(got.toSet === expected.toSet)
    assert(got.length === qids.size * Ann.GraphSearchK)
  }

  test("incremental insert: untouched srcs pass through, touched only improve, new nodes recalled") {
    val split = vecs.size.toLong * Ann.InsertSplitNum / Ann.InsertSplitDen
    val merged = Ann.nswGraphInsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val stored = Ann.nswStoredGraph(spark, dir, split, 4, 3)
      .select("src", "dst", "cos", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val mBySrc = merged.groupBy(_._1)
    val sBySrc = stored.groupBy(_._1)
    // every stored src and every batch node has an edge list; out-degree bounded
    assert(mBySrc.keySet === (0L until vecs.size.toLong).toSet)
    mBySrc.values.foreach(es => assert(es.length <= 4))
    // stored srcs: either untouched (identical rows) or strictly-not-worse
    // (the re-rank merges new candidates INTO the existing list)
    var untouchedN = 0; var improvedN = 0
    for ((src, se) <- sBySrc) {
      val me = mBySrc(src)
      if (me.toSet == se.toSet) untouchedN += 1
      else {
        assert(me.map(_._3).sum >= se.map(_._3).sum - 1e-9,
          s"touched src $src got WORSE after insert")
        improvedN += 1
      }
    }
    assert(untouchedN > 0, "some stored srcs should be untouched by a 20% batch")
    assert(improvedN > 0, "some stored srcs should gain better neighbors")
    // new-node edge recall vs the exact top-4 over the FULL corpus
    val newSrcs = (split until vecs.size.toLong).toSeq
    val hits = newSrcs.map { q =>
      val exact = (vecs - q).toSeq
        .map { case (id, v) => (id, cosR(v, vecs(q))) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSet
      (mBySrc(q).map(_._2).toSet & exact).size
    }.sum
    val recall = hits.toDouble / (4 * newSrcs.size)
    // yardstick: the FLAT REBUILD's edge recall on the same srcs — the
    // r15 bounded NN-descent repair round must land within 0.02 of it
    // (r14's no-descent insert sat 0.05 below: 0.653 vs 0.70)
    val rebuildBySrc = Ann.nswGraph(spark, dir).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val rebuildHits = newSrcs.map { q =>
      val exact = (vecs - q).toSeq
        .map { case (id, v) => (id, cosR(v, vecs(q))) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSet
      (rebuildBySrc.getOrElse(q, Array.empty).map(_._2).toSet & exact).size
    }.sum
    val rebuildRecall = rebuildHits.toDouble / (4 * newSrcs.size)
    info(f"new-node edge recall@4 after insert: $recall%.3f vs flat rebuild " +
      f"$rebuildRecall%.3f (untouched $untouchedN, repaired $improvedN stored srcs)")
    assert(recall >= 0.5, s"insert-time edge recall $recall below bound")
    assert(recall >= rebuildRecall - 0.02,
      f"insert recall $recall%.3f not within 0.02 of rebuild $rebuildRecall%.3f")
  }

  test("bpe_apply equals a plain-Scala retokenization under the learned merges") {
    import graft.operators.TextAnalysis
    val merges = TextAnalysis.bpeMergeSteps(spark, dir).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1).split(" ", 2), r.getString(2)))
    def retok(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString)
      for ((Array(a, b), m) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms) {
          if (out.nonEmpty && out.last == a && x == b) { out.remove(out.length - 1); out += m }
          else out += x
        }
        syms = out.toSeq
      }
      syms
    }
    val docs = Graft.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val symStream = docs.flatMap { case (id, text) =>
      "[a-z]+".r.findAllIn(text.toLowerCase).filter(_.length >= 2)
        .flatMap(retok).map(id -> _)
    }
    val vocab = symStream.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (sym, c) => (-c, sym) }.take(16).map(_._1).toSet
    val expected = symStream.groupBy(_._1).map { case (id, ss) =>
      val oov = ss.count(s => !vocab.contains(s._2)).toLong
      (id, ss.length.toLong, oov, oov * 1000000L / ss.length)
    }.toSet
    val got = TextAnalysis.bpeApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // the loop closed: at least one learned multi-char symbol made the
    // top-16 vocab (training actually changed the coverage unit)
    assert(vocab.exists(_.length > 1), s"no merged symbol in vocab: $vocab")
  }

  test("graphSearchFiltered equals the plain-Scala twin; the filter bites and all hits pass") {
    val labels: Map[Long, Int] =
      Graft.embeddings(spark, dir).select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def pass(n: Long) = labels(n).toLong % Ann.GraphSearchFilterMod == Ann.GraphSearchFilterRes
    // twin of the coupled (navigation beam, result accumulator) walk:
    // the beam is beamRef's, the accumulator keeps the best k PASSING
    // nodes among everything any round ever scored (entry included)
    def filteredRef(q: Long, beam: Int, rounds: Int, k: Int): Seq[(Long, Double)] = {
      val cents = vecs.keys.filter(_ < Ann.sqrtFanout(vecs.size.toLong)).toSeq
      def sc(n: Long) = cosR(vecs(n), vecs(q))
      def cut(rs: Seq[(Long, Double)], c: Int) =
        rs.distinct.sortBy { case (n, s) => (-s, n) }.take(c)
      val entry = cents.filter(_ != q).map(n => n -> sc(n))
      var state = cut(entry, 1)
      var res = cut(entry.filter(e => pass(e._1)), k)
      for (_ <- 1 to rounds) {
        val scored = state.map(_._1).flatMap(und.getOrElse(_, Set.empty)).distinct
          .filter(_ != q).map(n => n -> sc(n))
        state = cut(state ++ scored, beam)
        res = cut(res ++ scored.filter(e => pass(e._1)), k)
      }
      res
    }
    val got = Ann.graphSearchFiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val qids = vecs.keys.toSeq.sorted.filter(_ % 25 == 7).take(Ann.GraphSearchQueryCount)
    val expected = qids.flatMap { q =>
      filteredRef(q, Ann.GraphSearchBeam, Ann.GraphSearchRounds, Ann.GraphSearchK)
        .zipWithIndex.map { case ((n, s), i) => (q, (i + 1).toLong, n, s) }
    }
    assert(got.toSet === expected.toSet)
    // serving contract: every returned node satisfies the filter
    assert(got.forall(r => pass(r._3)), "a non-passing node escaped the filter")
    // and the filter BITES: the unfiltered walk's top-k contains
    // non-passing nodes for at least one query (else the test is vacuous)
    val unfiltered = Ann.graphSearch(spark, dir).collect().map(r => r.getLong(2))
    assert(unfiltered.exists(n => !pass(n)),
      "filter never excludes anything — raise its selectivity")
    info(s"${got.length} filtered hits over ${qids.size} queries " +
      s"(~${100 * labels.values.count(l => l.toLong % Ann.GraphSearchFilterMod == Ann.GraphSearchFilterRes) / labels.size}% of the corpus passes)")
  }

  test("graphSearchFromGen serves the written generation read-equivalently off a file scan") {
    val fromGen = Ann.graphSearchFromGen(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val live = Ann.graphSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fromGen === live, "written-generation search diverged from the live-index search")
    assert(fromGen.nonEmpty)
    // the serving side reads the PUBLISHED artifact (a parquet file
    // scan of target/graft_gen), not the session memo — the restart-safe
    // deployment split
    val (adj, _) = Ann.writtenGraphGen(spark, dir)
    // the artifact is PUBLISHED on disk and the loaded frame matches a
    // fresh read of it (the executed plan shows the serving tier's
    // load-once cache on top of the file relation)
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val genDir = new java.io.File(s"target/graft_gen/$safe/adjacency")
    assert(genDir.exists && genDir.listFiles.exists(_.getName.endsWith(".parquet")),
      s"no published adjacency parquet under $genDir")
    assert(spark.read.parquet(genDir.getAbsolutePath).count() === adj.count())
    assert(adj.storageLevel.useMemory, "the loaded generation should be cached for serving")
  }

  test("filtered recall curve: adaptive ef holds recall up as the filter tightens") {
    val rows = Ann.graphSearchFilteredRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Ann.FilterCurveMods)
    // the spec-pinned adaptive-ef rule: beam·nTot/(5·nPass) clamped to
    // [beam, EfMax] — at the 20% design selectivity ef stays 32; at 5%
    // and 1% it saturates the rule's widening
    val nTot = vecs.size.toLong
    for ((m, ef, k, nq, nov, micros) <- rows) {
      val nPass = vecs.keys.count(_ % m == Ann.FilterCurveRes).toLong
      val expectEf = math.min(Ann.GraphSearchEfMax,
        math.max(Ann.GraphSearchBeam.toLong,
          Ann.GraphSearchBeam.toLong * nTot / (Ann.GraphSearchFilterMod * nPass)))
      assert(ef === expectEf, s"adaptive ef at mod=$m")
      assert(k === Ann.GraphSearchK.toLong)
      assert(nq === Ann.GraphSearchQueryCount.toLong)
      assert(micros === nov * 1000000L / (k * nq))
    }
    assert(rows.head._2 === Ann.GraphSearchBeam.toLong, "design selectivity must keep ef = beam")
    assert(rows.tail.forall(_._2 > Ann.GraphSearchBeam), "tighter filters must widen ef")
    // every selectivity must clear the family's 0.6 floor — the entire
    // point of the adaptive rule (fixed ef=32 degrades hard below ~5%
    // pass rate; measured WITH the rule at sf0.001: 0.7375 / 0.9875 /
    // 0.9625 for 20% / 5% / 1%)
    rows.foreach { case (m, _, _, _, _, micros) =>
      assert(micros >= 600000L, s"filtered recall@4 at mod=$m = $micros micros")
    }
    val unfiltered = Ann.graphSearchRecall(spark, dir).collect().head.getLong(3)
    info(s"filtered recall curve (mod -> ef, micros): " +
      rows.map(r => s"${r._1} -> ${r._2}, ${r._6}").mkString("; ") +
      s" vs unfiltered $unfiltered micros")
  }

  test("graph-search recall clears the graph-quality bound and is internally consistent") {
    val row = Ann.graphSearchRecall(spark, dir).collect().head
    val (k, nq, nov, micros) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(k === Ann.GraphSearchK.toLong)
    assert(nq === Ann.GraphSearchQueryCount.toLong)
    assert(micros === nov * 1000000L / (k * nq))
    // the search reads the same graph AnnSpec bounds at >= 0.6 edge
    // recall; an ef=32 beam over it must find well over half the true
    // top-k (measured 0.79 at sf0.01, similar here)
    assert(micros >= 600000L, s"graph-search recall@4 = $micros micros")
    // and the search is strictly cheaper than exact: it scores at most
    // seed + rounds*beam*2k nodes per query, under the corpus size
    val budget = Ann.sqrtFanout(vecs.size.toLong) +
      Ann.GraphSearchRounds.toLong * Ann.GraphSearchBeam * 2 * 4
    info(s"recall@4 = $micros micros; per-query score budget $budget vs corpus ${vecs.size}")
  }

  test("hnswSearch equals the plain-Scala layered-descent recomputation") {
    val levels = Ann.hnswLevels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxLevel = levels.values.max
    // per-layer undirected adjacency from the layered edge frame
    val lund = scala.collection.mutable.Map.empty[(Long, Long), Set[Long]]
    Ann.hnswGraph(spark, dir).select("layer", "src", "dst").collect().foreach { r =>
      val (l, s, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      lund((l, s)) = lund.getOrElse((l, s), Set.empty) + d
      lund((l, d)) = lund.getOrElse((l, d), Set.empty) + s
    }
    def hnswRef(q: Long): Seq[(Long, Double)] = {
      def sc(n: Long) = cosR(vecs(n), vecs(q))
      var state: Map[Long, Double] = levels.filter(_._2 == maxLevel).keys
        .filter(_ != q).map(n => n -> sc(n)).toSeq
        .sortBy { case (n, s) => (-s, n) }.take(1).toMap
      def expand(layer: Long, cut: Int): Unit = {
        val cand = state ++ state.keys.flatMap(n => lund.getOrElse((layer, n), Set.empty))
          .filter(n => n != q && !state.contains(n)).map(n => n -> sc(n))
        state = cand.toSeq.sortBy { case (n, s) => (-s, n) }.take(cut).toMap
      }
      for (l <- maxLevel to 1L by -1L; _ <- 1 to Ann.HnswDescentRounds) expand(l, 1)
      for (_ <- 1 to Ann.GraphSearchRounds) expand(0L, Ann.GraphSearchBeam)
      state.toSeq.sortBy { case (n, s) => (-s, n) }.take(Ann.GraphSearchK)
    }
    val got = Ann.hnswSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val qids = vecs.keys.toSeq.sorted.filter(_ % 25 == 7).take(Ann.GraphSearchQueryCount)
    val expected = qids.flatMap { q =>
      hnswRef(q).zipWithIndex.map { case ((n, s), i) => (q, (i + 1).toLong, n, s) }
    }
    assert(got.toSet === expected.toSet)
    info(s"layered descent entered at level $maxLevel " +
      s"(${levels.count(_._2 == maxLevel)} entry node(s)) for ${qids.size} queries")
  }

  test("hnswSearch recall matches graphSearch's bound with an N-independent entry") {
    val row = Ann.hnswSearchRecall(spark, dir).collect().head
    val (k, nq, nov, micros) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(k === Ann.GraphSearchK.toLong)
    assert(nq === Ann.GraphSearchQueryCount.toLong)
    assert(micros === nov * 1000000L / (k * nq))
    // the hierarchical entry replaces the sqrt(N) centroid scan with an
    // O(1)-node top-layer entry + Lmax greedy hops; it must still clear
    // the same graph-quality floor the flat-entry search is held to
    assert(micros >= 600000L, s"hnsw-search recall@4 = $micros micros")
    val flat = Ann.graphSearchRecall(spark, dir).collect().head.getLong(3)
    info(s"layered recall@4 = $micros micros vs flat-entry $flat micros")
  }

  test("graphSearchInt8 equals the plain-Scala quantized-beam recomputation") {
    def q8(v: Array[Float]): Array[Long] = {
      val scale = v.map(x => math.abs(x.toDouble)).max
      if (scale == 0.0) Array.fill(v.length)(0L)
      else v.map(x => BigDecimal(x.toDouble / scale * 127.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val codes = vecs.map { case (id, v) => id -> q8(v) }
    val norms = codes.map { case (id, c) => id -> math.sqrt(c.map(x => x.toDouble * x).sum) }
    def sc8(n: Long, q: Long): Double = {
      val d = codes(n).zip(codes(q)).map { case (a, b) => a * b }.sum
      BigDecimal(d.toDouble / (norms(n) * norms(q)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def beam8(q: Long): Seq[(Long, Double)] = {
      val cents = vecs.keys.filter(_ < Ann.sqrtFanout(vecs.size.toLong)).toSeq
      var state: Map[Long, Double] = cents.filter(_ != q).map(n => n -> sc8(n, q))
        .sortBy { case (n, s) => (-s, n) }.take(1).toMap
      for (_ <- 1 to Ann.GraphSearchRounds) {
        val cand = state ++ state.keys.flatMap(und.getOrElse(_, Set.empty))
          .filter(n => n != q && !state.contains(n)).map(n => n -> sc8(n, q))
        state = cand.toSeq.sortBy { case (n, s) => (-s, n) }.take(Ann.GraphSearchBeam).toMap
      }
      state.toSeq.sortBy { case (n, s) => (-s, n) }.take(Ann.GraphSearchK)
    }
    val got = Ann.graphSearchInt8(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val qids = vecs.keys.toSeq.sorted.filter(_ % 25 == 7).take(Ann.GraphSearchQueryCount)
    val expected = qids.flatMap { q =>
      beam8(q).zipWithIndex.map { case ((n, s), i) => (q, (i + 1).toLong, n, s) }
    }
    assert(got.toSet === expected.toSet)
    // the quantization penalty, measured: the int8 walk's result set vs
    // the float walk's on the same graph/batch — SQ8 at 64 dims keeps
    // ~1% score error, so the top-4 sets should mostly agree
    val f = Ann.graphSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = got.map(r => (r._1, r._3)).toSet.intersect(f).size
    info(s"int8 vs float top-4 overlap: $overlap/${f.size}")
    assert(overlap * 2 >= f.size, s"int8 walk diverged from float: $overlap/${f.size}")
  }
}
