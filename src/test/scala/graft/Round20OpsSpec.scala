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

  test("layered dedup-gated build: replica corpus regains full reach THROUGH the hierarchy") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"), col("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    val cleanDir = tempSfDir("embeddings" -> base)

    // the pathology reaches EVERY layer: the plain layered census on the
    // replica corpus is fragmented exactly like the flat graph's
    val plainEdges = Ann.hnswGraph(spark, dupDir)
    val plainUnd = plainEdges.select(col("src"), col("dst"))
      .union(plainEdges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val entries = Graft.embeddings(spark, dupDir)
      .filter(col("vec_id") < Ann.sqrtFanout(500L)).select(col("vec_id").as("node"))
    // milder than the flat collapse (replicas draw DIFFERENT levels, so
    // upper layers hold at most a few copies of each point and partially
    // bridge the base-layer cliques) but still broken — and the serve
    // assertion below shows the base-layer beam stays clique-trapped
    val plainReach = Ann.censusCountsOver(plainUnd, entries, 4).maxBy(_._1)._2
    assert(plainReach < 500L,
      s"expected residual dup-fragmentation in the plain layered build, reached $plainReach/500")

    // the repair: full reach through survivor stack + layer-0 attach
    val fixed = lastRow(Ann.hnswConnectivityDeduped(spark, dupDir).collect())
    assert(fixed.getLong(1) === 500L && fixed.getLong(2) === 500L,
      s"layered dedup-gated build must restore full reach, got ${fixed.getLong(1)}/500")

    // the survivor stack equals the clean-corpus layered build
    // edge-for-edge on EVERY layer (same levels — the draw is a pure
    // vec_id function — same range-scaled seeds, same cells)
    val deduped = Ann.hnswGraphDeduped(spark, dupDir)
    val survivorStack = deduped.filter(!col("is_attach"))
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    val cleanStack = Ann.hnswGraph(spark, cleanDir)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    assert(survivorStack === cleanStack,
      "survivor layer stack must equal the clean-corpus layered build edge-for-edge")

    // replicas attach at LAYER 0 only: rn-0 cos-1.0 edge to the base
    // plus the base's layer-0 neighborhood, <= k+1 rows each
    val att = deduped.filter(col("is_attach")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(att.forall(_._1 == 0L), "attach edges live in the base layer only")
    val rn0 = att.filter(_._5 == 0L)
    assert(rn0.map(_._2).toSet === (50L until 500L).toSet)
    rn0.foreach { case (_, d, c, cos, _) =>
      assert(c === d % 50L && cos === 1.0, s"replica $d must attach to its base at 1.0")
    }
    assert(att.groupBy(_._2).forall(_._2.length <= 5), "at most k+1 attach edges per dup")

    // SERVING through the layered descent: every query recovers a
    // score-1.0 copy of itself; the plain hierarchy stays trapped in
    // the entry copy-cliques
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter(col("rn") === 1L).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val plainTop = top1(Ann.hnswSearch(spark, dupDir))
    val fixedTop = top1(Ann.hnswSearchDeduped(spark, dupDir))
    assert(fixedTop.size === plainTop.size && fixedTop.nonEmpty)
    assert(fixedTop.values.forall(_ === 1.0),
      s"layered deduped descent must recover a 1.0 copy for every query, " +
        s"got ${fixedTop.values.count(_ === 1.0)}/${fixedTop.size}")
    assert(plainTop.values.count(_ === 1.0) < fixedTop.size / 2 + 1,
      s"expected the plain hierarchy trapped, got ${plainTop.values.count(_ === 1.0)}")
    info(s"plain reach $plainReach/500 -> layered deduped 500/500; " +
      s"${survivorStack.size} survivor edges equal the clean stack; " +
      s"serve ${fixedTop.values.count(_ === 1.0)}/${fixedTop.size} perfect vs " +
      s"${plainTop.values.count(_ === 1.0)} plain")
  }

  test("deduped insert: a pure-dup batch equals the batch rebuild on the union corpus") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"), col("label"))
    val storedRep = base.select((col("vec_id") + 40L).as("vec_id"), col("embedding"), col("label"))
    val stored = base.unionByName(storedRep)
    val batchCopies = base.select((col("vec_id") + 80L).as("vec_id"), col("embedding"), col("label"))
    val batchScaled = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 120L).as("vec_id"),
        expr("transform(embedding, x -> x * cast(1.5 as float))").as("embedding"), col("label"))
    val batch = batchCopies.unionByName(batchScaled)
    val unionDir = tempSfDir("embeddings" -> stored.unionByName(batch))

    val (edges, cmap, weights) = Ann.dedupedInsertBatch(spark, unionDir,
      stored.select(col("vec_id"), col("embedding")), "spec_ins_a",
      batch.select(col("vec_id"), col("embedding")))
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSet
    val rebuilt = Ann.nswGraphDeduped(spark, unionDir)
    assert(edgeSet(edges) === edgeSet(rebuilt),
      "a pure-dup batch must stream to the exact rebuild edge frame")
    def mapSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mapSet(cmap) === mapSet(Ann.dedupCanonMap(spark, unionDir)),
      "post-insert canonical map must equal the rebuild's")
    assert(mapSet(weights) === mapSet(Ann.dedupCanonWeights(spark, unionDir)),
      "incrementally-updated weights must equal the rebuild's exactly")
    // the routed arrivals: every batch copy to its base, scaled
    // near-dups through the near-dup probe, weights = 3 for re-copied
    // bases (self + stored replica + batch copy) + 1 for scaled ones
    val w = weights.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 5L).foreach(i => assert(w(i) === ((4L, 3L))))
    (5L until 40L).foreach(i => assert(w(i) === ((3L, 2L))))
    info(s"${edgeSet(edges).size} edges stream-equal to the rebuild; weights exact")
  }

  test("deduped insert: a mixed batch routes dups and inserts survivors") {
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"), col("label"))
    val storedRep = base.select((col("vec_id") + 40L).as("vec_id"), col("embedding"), col("label"))
    val stored = base.unionByName(storedRep)
    val batchCopies = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 80L).as("vec_id"), col("embedding"), col("label"))
    val novel = Graft.embeddings(spark, dir)
      .filter(col("vec_id") >= 200 && col("vec_id") < 210)
      .select((col("vec_id") - 100L).as("vec_id"), col("embedding"), col("label"))
    val batch = batchCopies.unionByName(novel)
    val unionDir = tempSfDir("embeddings" -> stored.unionByName(batch))

    val (edges, cmap, weights) = Ann.dedupedInsertBatch(spark, unionDir,
      stored.select(col("vec_id"), col("embedding")), "spec_ins_b",
      batch.select(col("vec_id"), col("embedding")))
    val m = cmap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (80L until 100L).foreach(v => assert(m(v) === v - 80L, s"batch copy $v must route to its base"))
    (100L until 110L).foreach(v => assert(m(v) === v, s"novel $v must survive"))
    // incremental weights equal a recompute over the returned map
    val recomputed = cmap.groupBy(col("canon"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("weight"),
        org.apache.spark.sql.functions.sum(col("is_dup")).as("n_dups"))
    def mapSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mapSet(weights) === mapSet(recomputed),
      "incremental weights must equal the recompute over the merged map")
    // survivors joined the graph, dups did not; the whole corpus is
    // reachable through the merged index (survivor graph + attach)
    val graphSrcs = edges.filter(!col("is_attach")).select(col("src")).collect()
      .map(_.getLong(0)).toSet
    assert((100L until 110L).forall(graphSrcs.contains), "novel survivors must enter the graph")
    assert((80L until 100L).forall(v => !graphSrcs.contains(v)), "routed dups must not")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val entries = Graft.embeddings(spark, unionDir)
      .filter(col("vec_id") < Ann.sqrtFanout(110L)).select(col("vec_id").as("node"))
    val reach = Ann.censusCountsOver(und, entries, 4).maxBy(_._1)._2
    assert(reach === 110L, s"full reach through the merged generation, got $reach/110")
    info(s"20 dups routed, 10 survivors inserted, weights exact, reach $reach/110")
  }

  test("layered deduped insert: a pure-dup batch equals the layered rebuild on the union corpus") {
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"), col("label"))
    val storedRep = base.select((col("vec_id") + 40L).as("vec_id"), col("embedding"), col("label"))
    val stored = base.unionByName(storedRep)
    val batchCopies = base.select((col("vec_id") + 80L).as("vec_id"), col("embedding"), col("label"))
    val batchScaled = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 120L).as("vec_id"),
        expr("transform(embedding, x -> x * cast(1.5 as float))").as("embedding"), col("label"))
    val batch = batchCopies.unionByName(batchScaled)
    val unionDir = tempSfDir("embeddings" -> stored.unionByName(batch))

    val edges = Ann.hnswInsertDedupedBatch(spark, unionDir,
      stored.select(col("vec_id"), col("embedding")), "spec_ins_hl",
      batch.select(col("vec_id"), col("embedding")))
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val rebuilt = Ann.hnswGraphDeduped(spark, unionDir)
    assert(edgeSet(edges) === edgeSet(rebuilt),
      "a pure-dup batch must stream to the exact layered rebuild edge frame")
    info(s"${edgeSet(edges).size} layered edges stream-equal to the rebuild")
  }

  test("layered deduped insert: a mixed batch routes dups and inserts survivors per level") {
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"), col("label"))
    val storedRep = base.select((col("vec_id") + 40L).as("vec_id"), col("embedding"), col("label"))
    val stored = base.unionByName(storedRep)
    val batchCopies = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 80L).as("vec_id"), col("embedding"), col("label"))
    val novel = Graft.embeddings(spark, dir)
      .filter(col("vec_id") >= 200 && col("vec_id") < 210)
      .select((col("vec_id") - 100L).as("vec_id"), col("embedding"), col("label"))
    val batch = batchCopies.unionByName(novel)
    val unionDir = tempSfDir("embeddings" -> stored.unionByName(batch))

    val edges = Ann.hnswInsertDedupedBatch(spark, unionDir,
      stored.select(col("vec_id"), col("embedding")), "spec_ins_hm",
      batch.select(col("vec_id"), col("embedding")))
    // survivors joined the survivor stack, routed dups did not
    val stackSrcs = edges.filter(!col("is_attach")).select(col("src")).collect()
      .map(_.getLong(0)).toSet
    assert((100L until 110L).forall(stackSrcs.contains), "novel survivors must enter the stack")
    assert((80L until 100L).forall(v => !stackSrcs.contains(v)), "routed dups must not")
    // dups attach at the BASE layer only; each new dup lands on its base
    val att = edges.filter(col("is_attach")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(att.forall(_._1 == 0L), "attach edges live in the base layer only")
    val rn0 = att.filter(t => t._5 == 0L && t._2 >= 80L && t._2 < 100L)
    rn0.foreach { case (_, d, c, cos, _) =>
      assert(c === d - 80L && cos === 1.0, s"batch copy $d must attach to its base at 1.0")
    }
    // the whole union corpus stays reachable through the merged
    // hierarchy (layer-blind census over survivor + attach edges)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val entries = Graft.embeddings(spark, unionDir)
      .filter(col("vec_id") < Ann.sqrtFanout(110L)).select(col("vec_id").as("node"))
    val reach = Ann.censusCountsOver(und, entries, 4).maxBy(_._1)._2
    assert(reach === 110L, s"full reach through the merged hierarchy, got $reach/110")
    info(s"20 dups routed to base attach, 10 survivors inserted per their levels, reach $reach/110")
  }

  test("int8 deduped walk escapes the copy-cliques like the float one") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"), col("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter(col("rn") === 1L).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val plain = top1(Ann.graphSearchInt8(spark, dupDir))
    val fixed = top1(Ann.graphSearchInt8Deduped(spark, dupDir))
    assert(fixed.size === plain.size && fixed.nonEmpty)
    // exact copies quantize to identical codes, so the repaired walk
    // still recovers a score-1.0 copy for every query under int8
    assert(fixed.values.forall(_ === 1.0),
      s"int8 deduped walk must recover a 1.0 copy per query, " +
        s"got ${fixed.values.count(_ === 1.0)}/${fixed.size}")
    assert(plain.values.count(_ === 1.0) < fixed.size / 2 + 1,
      s"expected the plain int8 walk trapped, got ${plain.values.count(_ === 1.0)}")
  }

  test("filtered deduped walk reaches passing copies across the cliques") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    // every row carries a filter-PASSING label (the walk's routing is
    // unchanged; this pins the reach property deterministically: each
    // query has 9 passing exact copies, so a healthy filtered walk
    // returns a 1.0 top hit for EVERY query)
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"),
        lit(Ann.GraphSearchFilterRes).cast("int").as("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    def perfect(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("rn") === 1L && col("score") === 1.0)
        .select(col("q_id")).collect().map(_.getLong(0)).toSet
    val plain = perfect(Ann.graphSearchFiltered(spark, dupDir))
    val fixed = perfect(Ann.graphSearchFilteredDeduped(spark, dupDir))
    assert(fixed.size === Ann.GraphSearchQueryCount,
      s"every query must recover a 1.0 passing copy, got ${fixed.size}")
    assert(plain.size < Ann.GraphSearchQueryCount / 2 + 1,
      s"expected the plain filtered walk clique-trapped, got ${plain.size}")
  }

  test("filtered deduped layered descent reaches passing copies THROUGH the hierarchy") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    // all-passing labels, as in the flat filtered-deduped pin: each
    // query has 9 passing exact copies, so a healthy filtered descent
    // returns a 1.0 top hit for EVERY query
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"),
        lit(Ann.GraphSearchFilterRes).cast("int").as("label"))
    val dupDir = tempSfDir("embeddings" -> dupCorpus)
    def perfect(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("rn") === 1L && col("score") === 1.0)
        .select(col("q_id")).collect().map(_.getLong(0)).toSet
    val plain = perfect(Ann.hnswSearchFiltered(spark, dupDir))
    val fixed = perfect(Ann.hnswSearchFilteredDeduped(spark, dupDir))
    assert(fixed.size === Ann.GraphSearchQueryCount,
      s"every query must recover a 1.0 passing copy through the descent, got ${fixed.size}")
    // replicas draw different levels, so the plain hierarchy partially
    // bridges — but the base-layer beam stays clique-trapped for a
    // substantial fraction of queries
    assert(plain.size < Ann.GraphSearchQueryCount,
      s"expected the plain filtered descent partially trapped, got ${plain.size}")
  }

  test("deduped written generations serve row-identical to their live walks") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(Ann.graphSearchFilteredDedupedFromGen(spark, dir)) ===
      rows(Ann.graphSearchFilteredDeduped(spark, dir)),
      "filtered deduped from-gen must equal the live walk")
    assert(rows(Ann.graphSearchInt8DedupedFromGen(spark, dir)) ===
      rows(Ann.graphSearchInt8Deduped(spark, dir)),
      "int8 deduped from-gen must equal the live walk")
    assert(rows(Ann.hnswSearchFilteredDedupedFromGen(spark, dir)) ===
      rows(Ann.hnswSearchFilteredDeduped(spark, dir)),
      "filtered layered deduped from-gen must equal the live walk")
  }

  test("digest-keyed exact collapse equals the value-keyed build on collision-free corpora") {
    import spark.implicits._
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dupCorpus = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("vec_id") + col("rep") * 50L).as("vec_id"),
        col("embedding"), col("label"))
    val d = tempSfDir("embeddings" -> dupCorpus)
    val eIn = Graft.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSet
    val byValue = Ann.nswGraphDedupedOver(spark, eIn, "spec_digcmp", d,
      4, 3, Ann.BuildDedupTauMicros)
    val byDigest = Ann.nswGraphDedupedOver(spark, eIn, "spec_digcmp", d,
      4, 3, Ann.BuildDedupTauMicros, collapseByDigest = true)
    assert(edgeSet(byDigest) === edgeSet(byValue),
      "the 128-bit digest key must reproduce the value-keyed build exactly")
  }

  test("layered dedup-gated build: dup-free corpus equals the plain layered build") {
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 120)
      .select(col("vec_id"), col("embedding"), col("label"))
    val d = tempSfDir("embeddings" -> base)
    val deduped = Ann.hnswGraphDeduped(spark, d)
    assert(deduped.filter(col("is_attach")).isEmpty)
    val a = deduped.select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    val b = Ann.hnswGraph(spark, d)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    assert(a === b, "on a dup-free dense corpus the deduped layered build IS hnswGraph")
  }
}
