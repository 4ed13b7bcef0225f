package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.streaming.IndexStreams

/** Streaming NSW-index maintenance: vectors arrive in microbatches and
  * each batch folds into the stored generation via the same
  * batch-proportional insert the keyed `ann_graph_insert` verifies —
  * the house batch-parity proof (30e/30f style): every streamed
  * generation must equal its batch twin exactly.
  */
class IndexStreamsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streamed generations equal the sequential batch-insert twins") {
    val root = java.nio.file.Files.createTempDirectory("graft-idxgen").toString
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
    assert(IndexStreams.currentGen(root) === 0L)

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

    assert(IndexStreams.currentGen(root) === 2L)
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
    info(s"2 streamed generations over ${n} vectors, " +
      s"batch sizes ${b1.count()}/${b2.count()}, both equal their batch twins")
  }

  test("streamed LAYERED generations equal the sequential hnsw batch-insert twins") {
    // the r16 gap: only the FLAT NSW index had a streaming twin, so the
    // index the layered serving walk reads could not be stream-maintained.
    // Same contract as the flat test: every streamed generation must
    // equal its sequential hnswInsertBatch twin exactly, layer included.
    val root = java.nio.file.Files.createTempDirectory("graft-hidxgen").toString
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

    assert(IndexStreams.currentGen(root) === 2L)
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

  test("empty microbatches leave generation holes the stream tolerates") {
    // the r14 wedge: gen = batchId+1 with empty batches SKIPPING their
    // write meant the batch after any empty one read a non-existent
    // gen=<batchId>/edges and threw, and the checkpoint replayed into
    // the same hole forever. The fix folds into the latest EXISTING
    // generation <= batchId; this drops an empty file between two real
    // batches and asserts the stream sails through the hole.
    val root = java.nio.file.Files.createTempDirectory("graft-idxgen2").toString
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
      assert(IndexStreams.currentGen(root) === 0L, "empty batch must not write a generation")
      // microbatch 1: real — folds into gen=0 (the hole at gen=1 is permanent)
      batch.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged on the hole: ${q.exception}")
    } finally q.stop()

    assert(IndexStreams.currentGen(root) === 2L)
    assert(!new java.io.File(s"$root/gen=1").exists(), "hole expected at gen=1")
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

  test("read-while-write: serving gen=n is identical before and after the gen=n+1 commit") {
    // the deployment's steady state: a serving tier reads generation n
    // WHILE the maintenance stream commits n+1. Generations are
    // immutable (each commit only creates a new gen dir), so a search
    // over gen=n must return bit-identical results before and after the
    // commit — this makes that immutability observable end to end.
    val root = java.nio.file.Files.createTempDirectory("graft-idxgen3").toString
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
      walk(new java.io.File(s"$root/gen=$g"))
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
    assert(IndexStreams.currentGen(root) === 1L)

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
    val root = java.nio.file.Files.createTempDirectory("graft-prune").toString
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
    assert(!new java.io.File(s"$root/gen=0").exists(),
      "the superseded generation must be deleted")
    assert(new java.io.File(s"$root/gen=1/members").exists(),
      "the new base must carry a full member checkpoint")
    assert(IndexStreams.currentGen(root) === 2L,
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
    val root = java.nio.file.Files.createTempDirectory("graft-i8pub").toString
    val out0 = java.nio.file.Files.createTempDirectory("graft-i8art").toString
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
    val root2 = java.nio.file.Files.createTempDirectory("graft-i8pub2").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-i8art2").toString
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
}
