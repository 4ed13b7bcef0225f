package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.streaming.IndexStreams

/** Streaming NSW-index maintenance: vectors arrive in microbatches and
  * each batch folds into the stored generation via the same
  * batch-proportional insert the keyed `ann_graph_insert` verifies —
  * the house batch-parity proof (30e/30f style): every streamed
  * generation must equal its batch twin exactly.
  *
  * Every generation root here is `file:`-SCHEME-QUALIFIED: the r18 port
  * moved all generation path operations to the Hadoop FileSystem API,
  * and a scheme'd root is the proof — `java.io.File`-based resolution
  * would see an empty root at "file:/tmp/..." and throw, while the FS
  * API resolves the scheme exactly as it would `hdfs://`/`s3a://`.
  */
class IndexStreamsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** (local filesystem path, file:-scheme-qualified twin) */
  private def schemedTemp(prefix: String): (String, String) = {
    val l = java.nio.file.Files.createTempDirectory(prefix).toString
    (l, "file:" + l)
  }

  test("streamed generations equal the sequential batch-insert twins") {
    val (_, root) = schemedTemp("graft-idxgen")
    val inDir = java.nio.file.Files.createTempDirectory("graft-idxin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idxck").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut1 = n * 3 / 5
    val cut2 = n * 4 / 5
    // seed generation: full build over the first 3/5 of the corpus
    val seedEmb = e.filter(col("vec_id") < cut1)
    val seedEdges = Ann.nswStoredGraph(spark, dir, cut1, 4, 3)
    seedEdges.write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")
    assert(IndexStreams.currentGen(spark, root) === 0L)

    val b1 = e.filter(col("vec_id") >= cut1 && col("vec_id") < cut2)
    val b2 = e.filter(col("vec_id") >= cut2)
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
      df.select(col("src"), col("dst"), col("cos"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val q = IndexStreams.maintainNswIndex(
      IndexStreams.fromParquetDir(spark, inDir, e), root, ckpt)
    try {
      // one file per microbatch, arrival order controlled by draining
      // the source between drops
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()

    assert(IndexStreams.currentGen(spark, root) === 2L)
    // batch twins, computed sequentially over the same generations
    val twin1 = Ann.nswInsertBatch(seedEmb, seedEdges, b1)
    val got1 = spark.read.parquet(s"$root/gen=1/edges")
    assert(edgeSet(got1) === edgeSet(twin1), "generation 1 diverged from its batch twin")
    val twin2 = Ann.nswInsertBatch(seedEmb.unionByName(b1), got1, b2)
    val got2 = spark.read.parquet(s"$root/gen=2/edges")
    assert(edgeSet(got2) === edgeSet(twin2), "generation 2 diverged from its batch twin")
    // the final generation serves the WHOLE corpus: every vector has an
    // edge list, out-degree stays bounded by k
    val bySrc = edgeSet(got2).groupBy(_._1)
    assert(bySrc.keySet === (0L until n).toSet)
    bySrc.values.foreach(es => assert(es.size <= 4))
    // members chain reconstructs the corpus without ever copying it forward
    val members = IndexStreams.membersThrough(spark, root, 2L)
    assert(members.select("vec_id").collect().map(_.getLong(0)).toSet ===
      (0L until n).toSet)
    info(s"2 streamed generations over ${n} vectors at a file:-scheme root, " +
      s"batch sizes ${b1.count()}/${b2.count()}, both equal their batch twins")
  }

  test("streamed LAYERED generations equal the sequential hnsw batch-insert twins") {
    // the r16 gap: only the FLAT NSW index had a streaming twin, so the
    // index the layered serving walk reads could not be stream-maintained.
    // Same contract as the flat test: every streamed generation must
    // equal its sequential hnswInsertBatch twin exactly, layer included.
    val (_, root) = schemedTemp("graft-hidxgen")
    val inDir = java.nio.file.Files.createTempDirectory("graft-hidxin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hidxck").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut1 = n * 3 / 5
    val cut2 = n * 4 / 5
    val seedEmb = e.filter(col("vec_id") < cut1)
    val seedEdges = Ann.hnswStoredGraph(spark, dir, cut1, 4, 3)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
    seedEdges.write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")

    val b1 = e.filter(col("vec_id") >= cut1 && col("vec_id") < cut2)
    val b2 = e.filter(col("vec_id") >= cut2)
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double, Long)] =
      df.select(col("layer"), col("src"), col("dst"), col("cos"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet

    val q = IndexStreams.maintainHnswIndex(
      IndexStreams.fromParquetDir(spark, inDir, e), root, ckpt)
    try {
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"layered maintenance stream failed: ${q.exception}")
    } finally q.stop()

    assert(IndexStreams.currentGen(spark, root) === 2L)
    val twin1 = Ann.hnswInsertBatch(seedEmb, seedEdges, b1)
    val got1 = spark.read.parquet(s"$root/gen=1/edges")
    assert(edgeSet(got1) === edgeSet(twin1), "layered generation 1 diverged from its batch twin")
    val twin2 = Ann.hnswInsertBatch(seedEmb.unionByName(b1), got1, b2)
    val got2 = spark.read.parquet(s"$root/gen=2/edges")
    assert(edgeSet(got2) === edgeSet(twin2), "layered generation 2 diverged from its batch twin")
    // the final generation covers the whole corpus at layer 0 (every
    // vector serves), per-(layer, src) out-degree stays bounded by k,
    // and the hierarchy has more than one layer (it IS layered)
    val es2 = edgeSet(got2)
    assert(es2.filter(_._1 == 0L).map(_._2) === (0L until n).toSet)
    assert(es2.map(_._1).max >= 1L, "expected a multi-layer hierarchy")
    es2.groupBy(t => (t._1, t._2)).values.foreach(es => assert(es.size <= 4))
    info(s"2 streamed layered generations over $n vectors, " +
      s"${es2.map(_._1).max + 1} layers, both equal their hnswInsertBatch twins")
  }

  test("streamed DEDUPED generations: dup batches equal the rebuild, mixed batches their fold twin") {
    import spark.implicits._
    val (_, root) = schemedTemp("graft-dedgen")
    val inDir = java.nio.file.Files.createTempDirectory("graft-dedin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedck").toString
    val base = Graft.embeddings(spark, dir).filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"))
    val seedEmb = base.unionByName(
      base.select((col("vec_id") + 40L).as("vec_id"), col("embedding")))
    // batch 1: PURE duplicates (exact copies of every base vector);
    // batch 2: mixed (copies of bases 0..9 + 10 novel vectors)
    val b1 = base.select((col("vec_id") + 80L).as("vec_id"), col("embedding"))
    val b2 = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 120L).as("vec_id"), col("embedding"))
      .unionByName(Graft.embeddings(spark, dir)
        .filter(col("vec_id") >= 200 && col("vec_id") < 210)
        .select((col("vec_id") - 70L).as("vec_id"), col("embedding")))
    IndexStreams.seedDedupedGen(spark, root, seedEmb, "idx_ded_seed", root)
    assert(graft.streaming.GenFs.currentGen(spark, root, "edges") === 0L)

    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSet
    val q = IndexStreams.maintainDedupedIndex(
      IndexStreams.fromParquetDir(spark, inDir, b1), root, ckpt)
    try {
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.streaming.GenFs.currentGen(spark, root, "edges") === 2L)

    // the pure-dup generation equals the full REBUILD on the union
    // corpus — the repaired index never re-fragments under arrivals
    val got1 = spark.read.parquet(s"$root/gen=1/edges")
    val unionDir1 = tempSfDir("embeddings" ->
      seedEmb.unionByName(b1).withColumn("label", col("vec_id") % 4))
    assert(edgeSet(got1) === edgeSet(Ann.nswGraphDeduped(spark, unionDir1)),
      "a streamed pure-dup generation must equal the batch rebuild")

    // the mixed generation equals its sequential fold twin (the batch
    // API over the same stored corpus — valid because gen 1 is
    // rebuild-equal, so the artifact state IS the collapse state)
    val (twinEdges, twinMap, _) = Ann.dedupedInsertBatch(spark, root,
      seedEmb.unionByName(b1), "idx_ded_twin", b2)
    val got2 = spark.read.parquet(s"$root/gen=2/edges")
    assert(edgeSet(got2) === edgeSet(twinEdges),
      "a streamed mixed generation must equal its dup-routed fold twin")

    // the canon chain at gen 2 equals the twin's map; weights derived
    // from the chain equal the twin's incremental weights
    val chainMap = graft.streaming.GenFs.chainThrough(spark, root, 2L, "canon", "newcanon")
    val gotMap = chainMap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twinM = twinMap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap === twinM, "canon chain diverged from the fold twin's map")
    (80L until 120L).foreach(v => assert(gotMap(v) === v - 80L))
    (120L until 130L).foreach(v => assert(gotMap(v) === v - 120L))
    (130L until 140L).foreach(v => assert(gotMap(v) === v))
    // full reach through the final generation
    val und = got2.select(col("src"), col("dst"))
      .union(got2.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val entries = spark.range(Ann.sqrtFanout(140L)).toDF("node")
    val reach = Ann.censusCountsOver(und, entries, 4).maxBy(_._1)._2
    assert(reach === 140L, s"full reach through the streamed generation, got $reach/140")
    info(s"gen1 (pure dups) rebuild-equal, gen2 (mixed) fold-twin-equal, reach $reach/140")
  }

  test("empty microbatches leave generation holes the stream tolerates") {
    // the r14 wedge: gen = batchId+1 with empty batches SKIPPING their
    // write meant the batch after any empty one read a non-existent
    // gen=<batchId>/edges and threw, and the checkpoint replayed into
    // the same hole forever. The fix folds into the latest EXISTING
    // generation <= batchId; this drops an empty file between two real
    // batches and asserts the stream sails through the hole.
    val (lroot, root) = schemedTemp("graft-idxgen2")
    val inDir = java.nio.file.Files.createTempDirectory("graft-idxin2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idxck2").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut = n * 4 / 5
    val seedEmb = e.filter(col("vec_id") < cut)
    val seedEdges = Ann.nswStoredGraph(spark, dir, cut, 4, 3)
    seedEdges.write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")
    val batch = e.filter(col("vec_id") >= cut)

    val q = IndexStreams.maintainNswIndex(
      IndexStreams.fromParquetDir(spark, inDir, e), root, ckpt)
    try {
      // microbatch 0: EMPTY (a quiet interval in production) — no write
      e.filter(lit(false)).coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(IndexStreams.currentGen(spark, root) === 0L,
        "empty batch must not write a generation")
      // microbatch 1: real — folds into gen=0 (the hole at gen=1 is permanent)
      batch.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged on the hole: ${q.exception}")
    } finally q.stop()

    assert(IndexStreams.currentGen(spark, root) === 2L)
    assert(!new java.io.File(s"$lroot/gen=1").exists(), "hole expected at gen=1")
    val twin = Ann.nswInsertBatch(seedEmb, seedEdges, batch)
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
      df.select(col("src"), col("dst"), col("cos"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(edgeSet(spark.read.parquet(s"$root/gen=2/edges")) === edgeSet(twin),
      "post-hole generation diverged from its batch twin")
    // the members chain is hole-tolerant too
    val members = IndexStreams.membersThrough(spark, root, 2L)
    assert(members.select("vec_id").collect().map(_.getLong(0)).toSet === (0L until n).toSet)
  }

  test("_SUCCESS gating: partial writes are invisible and recompaction repairs them") {
    // the r17 advisory: bare directory existence treated a crashed or
    // in-flight write as a finished checkpoint — a later prune could
    // then GC the member chain below a corrupt base. Commit detection
    // is now the _SUCCESS marker: this fabricates a crashed generation
    // (files on disk, no marker) and asserts it is invisible to every
    // resolver, then that compaction rewrites it rather than skipping.
    val (lroot, root) = schemedTemp("graft-succ")
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut = n * 4 / 5
    val seedEmb = e.filter(col("vec_id") < cut)
    Ann.nswStoredGraph(spark, dir, cut, 4, 3).write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")

    // fabricate a CRASHED gen=1: parquet files present, no _SUCCESS
    // (exactly what a mid-flight FileOutputCommitter job leaves behind)
    val b = e.filter(col("vec_id") >= cut)
    b.write.parquet(s"$root/gen=1/newmembers")
    Ann.nswInsertBatch(seedEmb, spark.read.parquet(s"$root/gen=0/edges"), b)
      .write.parquet(s"$root/gen=1/edges")
    Seq("edges", "newmembers").foreach { d =>
      val ok = new java.io.File(s"$lroot/gen=1/$d/_SUCCESS")
      assert(ok.exists()); ok.delete()
    }
    // also a fake half-written members "checkpoint" at gen=1
    val fakeMembers = new java.io.File(s"$lroot/gen=1/members/_temporary")
    fakeMembers.mkdirs()

    // invisible everywhere: the crashed generation is not current, not
    // a fold base, and neither its member delta nor the half-written
    // checkpoint enters the chain
    assert(IndexStreams.currentGen(spark, root) === 0L,
      "uncommitted generation must not be current")
    assert(IndexStreams.latestGenAtMost(spark, root, 1L) === 0L,
      "uncommitted generation must not be a fold base")
    assert(IndexStreams.membersThrough(spark, root, 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet ===
      (0L until cut).toSet,
      "member chain must resolve through the committed seed only")

    // compaction at g=1 must NOT skip-on-existence: it rewrites the
    // half-written members dir into a committed checkpoint
    IndexStreams.compactMembersAt(spark, root, 1L)
    assert(new java.io.File(s"$lroot/gen=1/members/_SUCCESS").exists(),
      "recompaction must produce a committed checkpoint")
    assert(IndexStreams.membersThrough(spark, root, 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet === (0L until cut).toSet)

    // and the GC contract is keep >= 2 (replay of the newest batch
    // folds into a generation BELOW currentGen)
    intercept[IllegalArgumentException] {
      IndexStreams.pruneGenerations(spark, root, keep = 1)
    }
  }

  test("member chain resolves through the NEWEST committed checkpoint, skipping uncommitted deltas") {
    // the multi-compaction layout a long-lived root converges to:
    // gen=0 full checkpoint, gen=1 delta, gen=2 full checkpoint (a
    // later compaction), gen=3 delta, gen=4 delta WITHOUT its marker
    // (in-flight). Resolution at g=4 must start from gen=2's
    // checkpoint (never re-read gen=0/gen=1), include gen=3, and skip
    // the uncommitted gen=4 — i.e. equal resolution at g=3.
    val (lroot, root) = schemedTemp("graft-chain")
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val (c1, c2, c3) = (n * 2 / 5, n * 3 / 5, n * 4 / 5)
    e.filter(col("vec_id") < c1).write.parquet(s"$root/gen=0/members")
    e.filter(col("vec_id") >= c1 && col("vec_id") < c2)
      .write.parquet(s"$root/gen=1/newmembers")
    IndexStreams.compactMembersAt(spark, root, 2L)
    assert(new java.io.File(s"$lroot/gen=2/members/_SUCCESS").exists())
    e.filter(col("vec_id") >= c2 && col("vec_id") < c3)
      .write.parquet(s"$root/gen=3/newmembers")
    e.filter(col("vec_id") >= c3).write.parquet(s"$root/gen=4/newmembers")
    new java.io.File(s"$lroot/gen=4/newmembers/_SUCCESS").delete()

    def ids(g: Long): Set[Long] = IndexStreams.membersThrough(spark, root, g)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids(4L) === (0L until c3).toSet,
      "chain must include committed deltas above the newest checkpoint and skip uncommitted ones")
    assert(ids(4L) === ids(3L))
    // deleting the SUPERSEDED prefix (gens 0-1) must not change resolution
    Seq("gen=0", "gen=1").foreach { g =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"$lroot/$g"))
    }
    assert(ids(4L) === (0L until c3).toSet,
      "resolution must not depend on generations below the newest committed checkpoint")
  }

  test("read-while-write: serving gen=n is identical before and after the gen=n+1 commit") {
    // the deployment's steady state: a serving tier reads generation n
    // WHILE the maintenance stream commits n+1. Generations are
    // immutable (each commit only creates a new gen dir), so a search
    // over gen=n must return bit-identical results before and after the
    // commit — this makes that immutability observable end to end.
    val (lroot, root) = schemedTemp("graft-idxgen3")
    val inDir = java.nio.file.Files.createTempDirectory("graft-idxin3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idxck3").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut = n * 4 / 5
    val seedEmb = e.filter(col("vec_id") < cut)
    Ann.nswStoredGraph(spark, dir, cut, 4, 3).write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")

    // the serving read of a generation: undirected adjacency with the
    // member vectors attached + the dense-id centroid entry set — the
    // exact structure graphSearchFromGen loads, composed from this
    // stream's gen layout, walked by the shared routed beam core
    def serveGen(g: Long): Seq[(Long, Long, Long, Double)] = {
      val members = IndexStreams.membersThrough(spark, root, g)
      val nm = members.count()
      val en = members
        .select(col("vec_id").as("dst"), col("embedding").as("dv"),
          graft.functions.VectorOps.norm(col("embedding")).as("dnrm"))
      val edges = spark.read.parquet(s"$root/gen=$g/edges")
      val undE = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .join(en, "dst")
        .select(col("src"), col("dst"), col("dv"), col("dnrm"))
      val cents = members
        .filter(col("vec_id") < Ann.sqrtFanout(nm))
        .select(col("vec_id").as("node"), col("embedding").as("nv"))
      val queries = members.filter(pmod(col("vec_id"), lit(25L)) === 7L)
        .orderBy(col("vec_id")).limit(5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    def genFiles(g: Long): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$lroot/gen=$g"))
        .map(f => f.getPath -> f.length()).toMap
    }

    val before = serveGen(0)
    val filesBefore = genFiles(0)
    assert(before.nonEmpty)

    val q = IndexStreams.maintainNswIndex(
      IndexStreams.fromParquetDir(spark, inDir, e), root, ckpt)
    try {
      e.filter(col("vec_id") >= cut).coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    assert(IndexStreams.currentGen(spark, root) === 1L)

    // gen=0 is untouched on disk and serves bit-identical results
    assert(genFiles(0) === filesBefore, "the commit must not touch the served generation")
    assert(serveGen(0) === before,
      "search over gen=0 diverged across the gen=1 commit")
    // and the NEW generation serves the grown corpus
    val after = serveGen(1)
    assert(after.nonEmpty)
    info(s"served gen=0 identically across the gen=1 commit (${before.size} result rows)")
  }

  test("pruneGenerations compacts the member chain and GCs superseded generations") {
    // index lifecycle: generations accumulate forever without GC, but
    // naive deletion would break member reconstruction (members are
    // never copied forward — every generation resolves through the
    // chain of newmembers deltas back to a full checkpoint). The prune
    // first compacts the chain into the oldest retained generation,
    // then deletes everything below it; every retained generation must
    // reconstruct the same member set, and future inserts folding into
    // the pruned root must equal their unpruned twins.
    val (lroot, root) = schemedTemp("graft-prune")
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val (c1, c2, c3) = (n * 2 / 5, n * 3 / 5, n * 4 / 5)
    val seedEmb = e.filter(col("vec_id") < c1)
    val seedEdges = Ann.nswStoredGraph(spark, dir, c1, 4, 3)
    seedEdges.write.parquet(s"$root/gen=0/edges")
    seedEmb.write.parquet(s"$root/gen=0/members")
    val b1 = e.filter(col("vec_id") >= c1 && col("vec_id") < c2)
    val b2 = e.filter(col("vec_id") >= c2 && col("vec_id") < c3)
    val b3 = e.filter(col("vec_id") >= c3)
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
      df.select(col("src"), col("dst"), col("cos"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val e1 = Ann.nswInsertBatch(seedEmb, seedEdges, b1)
    e1.write.parquet(s"$root/gen=1/edges")
    b1.write.parquet(s"$root/gen=1/newmembers")
    val e2 = Ann.nswInsertBatch(seedEmb.unionByName(b1),
      spark.read.parquet(s"$root/gen=1/edges"), b2)
    e2.write.parquet(s"$root/gen=2/edges")
    b2.write.parquet(s"$root/gen=2/newmembers")

    val memBefore = IndexStreams.membersThrough(spark, root, 2L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val base = IndexStreams.pruneGenerations(spark, root, keep = 2)
    assert(base === 1L)
    assert(!new java.io.File(s"$lroot/gen=0").exists(),
      "the superseded generation must be deleted")
    assert(new java.io.File(s"$lroot/gen=1/members").exists(),
      "the new base must carry a full member checkpoint")
    assert(IndexStreams.currentGen(spark, root) === 2L,
      "pruning must never touch the retained generations")
    val memAfter = IndexStreams.membersThrough(spark, root, 2L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(memAfter === memBefore,
      "pruning changed the reconstructed member set")
    // pruning is idempotent: a second run at the same cutoff is a no-op
    assert(IndexStreams.pruneGenerations(spark, root, keep = 2) === 1L)

    // the stream continues after GC: the next insert resolves members
    // through the compacted checkpoint and equals the unpruned twin
    val stored = IndexStreams.membersThrough(spark, root, 2L)
    val got3 = Ann.nswInsertBatch(stored,
      spark.read.parquet(s"$root/gen=2/edges"), b3)
    val twin3 = Ann.nswInsertBatch(
      seedEmb.unionByName(b1).unionByName(b2), e2, b3)
    assert(edgeSet(got3) === edgeSet(twin3),
      "post-prune insert diverged from the unpruned twin")
    info(s"pruned to base gen=$base, member set of ${memAfter.size} intact, " +
      "post-prune insert equals the unpruned twin")
  }

  test("publishInt8Gen from a generation root serves the oracle-verified int8 result") {
    // the fleet's periodic job: derive the quantized serving artifact
    // from the stream-maintained generation root instead of a live
    // session build. Seeding gen=0 with the full corpus build makes the
    // check exact and non-circular: the published artifact must serve
    // BYTE-IDENTICAL rows to the keyed (oracle-verified) int8 walk,
    // proving quantization, undirection, the payload join, the entry
    // set and the artifact write/load all compose to the same result.
    val (_, root) = schemedTemp("graft-i8pub")
    val out0 = "file:" + java.nio.file.Files.createTempDirectory("graft-i8art").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    Ann.nswGraph(spark, dir).write.parquet(s"$root/gen=0/edges")
    e.write.parquet(s"$root/gen=0/members")
    val (adj, entry) = Ann.publishInt8Gen(spark,
      IndexStreams.membersThrough(spark, root, 0L),
      spark.read.parquet(s"$root/gen=0/edges"), out0)
    // no float vectors in the published artifact (the 4x memory cut)
    assert(adj.columns.toSet === Set("src", "dst", "dq", "dn8"))
    assert(entry.columns.toSet === Set("node", "nq", "nn8"))
    assert((adj.schema ++ entry.schema).forall(!_.dataType.simpleString.contains("float")),
      "float vector columns leaked into the quantized artifact")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.select("q_id", "rn", "vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val got = rows(Ann.graphSearchInt8DriverOver(spark, adj, entry,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8))
    val want = rows(Ann.graphSearchInt8(spark, dir))
    assert(got.nonEmpty)
    assert(got === want,
      "artifact published from the generation root diverged from the live int8 walk")

    // the stream angle: fold one batch in, publish from the NEW
    // generation, and serve the grown corpus off it
    val n = e.count()
    val cut = n * 4 / 5
    val (_, root2) = schemedTemp("graft-i8pub2")
    val out2 = "file:" + java.nio.file.Files.createTempDirectory("graft-i8art2").toString
    val seedEmb = e.filter(col("vec_id") < cut)
    val seedEdges = Ann.nswStoredGraph(spark, dir, cut, 4, 3)
    seedEdges.write.parquet(s"$root2/gen=0/edges")
    seedEmb.write.parquet(s"$root2/gen=0/members")
    val b = e.filter(col("vec_id") >= cut)
    Ann.nswInsertBatch(seedEmb, seedEdges, b).write.parquet(s"$root2/gen=1/edges")
    b.write.parquet(s"$root2/gen=1/newmembers")
    val (adj2, entry2) = Ann.publishInt8Gen(spark,
      IndexStreams.membersThrough(spark, root2, 1L),
      spark.read.parquet(s"$root2/gen=1/edges"), out2)
    // the grown corpus is fully served: every vector has adjacency rows
    assert(adj2.select("src").distinct().count() === n)
    val served = rows(Ann.graphSearchInt8DriverOver(spark, adj2, entry2,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8))
    assert(served.nonEmpty)
    info(s"published int8 artifact equals the live walk (${got.size} rows); " +
      s"post-insert publish serves all $n vectors")
  }

  test("publishInt8Gen carries the label payload, serving the FILTERED int8 walk") {
    // the r17 advisory: writtenInt8Gen ships dlabel/nlabel but the
    // stream publisher did not, so a stream-published artifact could
    // not serve the filtered quantized walk. With labeled members the
    // published layout must now match writtenInt8Gen's and serve
    // graphSearchInt8Filtered's exact rows.
    val (_, root) = schemedTemp("graft-i8fpub")
    val outd = "file:" + java.nio.file.Files.createTempDirectory("graft-i8fart").toString
    val em = Graft.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    Ann.nswGraph(spark, dir).write.parquet(s"$root/gen=0/edges")
    em.write.parquet(s"$root/gen=0/members")
    val (adj, entry) = Ann.publishInt8Gen(spark,
      IndexStreams.membersThrough(spark, root, 0L),
      spark.read.parquet(s"$root/gen=0/edges"), outd)
    assert(adj.columns.toSet === Set("src", "dst", "dq", "dn8", "dlabel"))
    assert(entry.columns.toSet === Set("node", "nq", "nn8", "nlabel"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.select("q_id", "rn", "vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val got = rows(Ann.graphSearchInt8FilteredDriverOver(spark, dir, adj, entry,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8,
      Ann.GraphSearchFilterMod, Ann.GraphSearchFilterRes))
    val want = rows(Ann.graphSearchInt8Filtered(spark, dir))
    assert(got.nonEmpty)
    assert(got === want,
      "labeled published artifact diverged from the live filtered int8 walk")
  }

  test("publishHnswGen publishes the layered serving artifact from a generation root") {
    // r17 mandate #6: the layered stream (18g3) had no artifact-publish
    // job — a fleet serving the hierarchy off a maintained root had to
    // rebuild writtenHnswGen per session. Full-build half: publishing
    // from a gen=0 seeded with the whole corpus must serve
    // BYTE-IDENTICAL rows to the keyed (oracle-verified)
    // ann_hnsw_search_from_gen. Stream half: publishing after an
    // insert serves the grown corpus, entry set included.
    val (_, root) = schemedTemp("graft-hpub")
    val outd = "file:" + java.nio.file.Files.createTempDirectory("graft-hart").toString
    val em = Graft.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    Ann.hnswGraph(spark, dir)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
      .write.parquet(s"$root/gen=0/edges")
    em.write.parquet(s"$root/gen=0/members")
    val (adj, entry) = Ann.publishHnswGen(spark,
      IndexStreams.membersThrough(spark, root, 0L),
      spark.read.parquet(s"$root/gen=0/edges"), outd)
    assert(adj.columns.toSet === Set("layer", "src", "dst", "dv", "dnrm", "dlabel"))
    assert(entry.columns.toSet === Set("node", "nv", "level"))
    val maxLevel = entry.agg(max(col("level"))).collect().head.getLong(0)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.select("q_id", "rn", "vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val got = rows(Ann.hnswWalkDriverOver(spark, adj, entry, maxLevel,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8))
    val want = rows(Ann.hnswSearchFromGen(spark, dir))
    assert(got.nonEmpty)
    assert(got === want,
      "artifact published from the generation root diverged from the written-gen walk")
    // the dlabel payload rides the published adjacency, so the FILTERED
    // hierarchical walk serves off the same artifact — full publish
    // parity with the live writtenHnswGen route
    val gotF = rows(Ann.hnswWalkFilteredDriver(spark, dir, adj,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8,
      Ann.GraphSearchFilterMod, Ann.GraphSearchFilterRes))
    val wantF = rows(Ann.hnswSearchFilteredFromGen(spark, dir))
    assert(gotF.nonEmpty)
    assert(gotF === wantF,
      "filtered walk over the published artifact diverged from the written-gen route")

    // stream half: seed 4/5, insert the rest, publish gen=1, serve all
    val e = em.select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut = n * 4 / 5
    val (_, root2) = schemedTemp("graft-hpub2")
    val out2 = "file:" + java.nio.file.Files.createTempDirectory("graft-hart2").toString
    val seedEmb = e.filter(col("vec_id") < cut)
    val seedEdges = Ann.hnswStoredGraph(spark, dir, cut, 4, 3)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
    seedEdges.write.parquet(s"$root2/gen=0/edges")
    seedEmb.write.parquet(s"$root2/gen=0/members")
    val b = e.filter(col("vec_id") >= cut)
    Ann.hnswInsertBatch(seedEmb, seedEdges, b).write.parquet(s"$root2/gen=1/edges")
    b.write.parquet(s"$root2/gen=1/newmembers")
    val (adj2, entry2) = Ann.publishHnswGen(spark,
      IndexStreams.membersThrough(spark, root2, 1L),
      spark.read.parquet(s"$root2/gen=1/edges"), out2)
    // label-less members → no payload column, layer 0 serves every vector
    assert(adj2.columns.toSet === Set("layer", "src", "dst", "dv", "dnrm"))
    assert(adj2.filter(col("layer") === 0).select("src").distinct().count() === n)
    val ml2 = entry2.agg(max(col("level"))).collect().head.getLong(0)
    val served = rows(Ann.hnswWalkDriverOver(spark, adj2, entry2, ml2,
      Ann.graphSearchQueries(spark, dir), 4, 32, 8))
    assert(served.nonEmpty)
    info(s"published layered artifact equals the written-gen walk (${got.size} rows); " +
      s"post-insert publish serves all $n vectors across ${ml2 + 1}+ levels")
  }
}
