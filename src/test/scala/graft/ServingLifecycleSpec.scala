package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.streaming.IndexStreams

/** The full production serving loop over ONE stream-maintained layered
  * generation root — seed build → streamed growth → artifact publish →
  * serve → GC → publish again — composed end-to-end from the tested
  * pieces, at a `file:`-scheme root. What this pins beyond the unit
  * specs: publish FAITHFULNESS (the artifact walk equals the direct
  * in-session walk over the same generation state), GC NEUTRALITY (a
  * fresh publish from the pruned root serves byte-identical rows — the
  * compacted member chain reconstructs the exact serving state), and
  * CROSS-TIER composition (the same root's layer-0 edges feed the int8
  * quantized tier).
  */
class ServingLifecycleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("seed -> stream -> publish -> serve -> GC -> publish: one root serves every tier") {
    val lroot = java.nio.file.Files.createTempDirectory("graft-life").toString
    val root = "file:" + lroot
    val inDir = java.nio.file.Files.createTempDirectory("graft-lifein").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lifeck").toString
    val e = Graft.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val (cut1, cut2) = (n * 3 / 5, n * 4 / 5)

    // 1. seed generation: layered build over the first 3/5
    Ann.hnswStoredGraph(spark, dir, cut1, 4, 3)
      .select(col("layer"), col("src"), col("dst"), col("cos"), col("rn"))
      .write.parquet(s"$root/gen=0/edges")
    e.filter(col("vec_id") < cut1).write.parquet(s"$root/gen=0/members")

    // 2. stream two microbatches of arrivals into gen=1, gen=2
    val q = IndexStreams.maintainHnswIndex(
      IndexStreams.fromParquetDir(spark, inDir, e), root, ckpt)
    try {
      e.filter(col("vec_id") >= cut1 && col("vec_id") < cut2)
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      e.filter(col("vec_id") >= cut2)
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"maintenance stream failed: ${q.exception}")
    } finally q.stop()
    assert(IndexStreams.currentGen(spark, root) === 2L)

    // 3. publish the layered artifact from the maintained root
    val members = IndexStreams.membersThrough(spark, root, 2L)
    val edges = spark.read.parquet(s"$root/gen=2/edges")
    val out1 = "file:" + java.nio.file.Files.createTempDirectory("graft-lifeart").toString
    val (adj, entry) = Ann.publishHnswGen(spark, members, edges, out1)
    val queries = Ann.graphSearchQueries(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.select("q_id", "rn", "vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val ml = entry.agg(max(col("level"))).collect().head.getLong(0)
    val served = rows(Ann.hnswWalkDriverOver(spark, adj, entry, ml, queries, 4, 32, 8))

    // publish FAITHFULNESS: the artifact walk equals the direct
    // in-session walk over the same generation state (adjacency built
    // from members+edges without the write/read round-trip)
    val en = members.select(col("vec_id").as("dst"), col("embedding").as("dv"),
      graft.functions.VectorOps.norm(col("embedding")).as("dnrm"))
    val directAdj = edges.select(col("layer"), col("src"), col("dst"))
      .union(edges.select(col("layer"), col("dst").as("src"), col("src").as("dst")))
      .distinct().join(en, "dst")
      .select(col("layer"), col("src"), col("dst"), col("dv"), col("dnrm"))
    val direct = rows(Ann.hnswWalkDriverOver(spark, directAdj,
      entry.select(col("node"), col("nv")), ml, queries, 4, 32, 8))
    assert(served.nonEmpty && served === direct,
      "published artifact diverged from the direct in-session walk")
    // the serving contract: every query gets its full top-k
    assert(served.groupBy(_._1).forall(_._2.size === 4))

    // 4. GC the root, then publish AGAIN: the compacted chain must
    // reconstruct the exact serving state (byte-identical artifact rows)
    val base = IndexStreams.pruneGenerations(spark, root, keep = 2)
    assert(base === 1L && !new java.io.File(s"$lroot/gen=0").exists())
    val out2 = "file:" + java.nio.file.Files.createTempDirectory("graft-lifeart2").toString
    val (adj2, entry2) = Ann.publishHnswGen(spark,
      IndexStreams.membersThrough(spark, root, 2L),
      spark.read.parquet(s"$root/gen=2/edges"), out2)
    val ml2 = entry2.agg(max(col("level"))).collect().head.getLong(0)
    val served2 = rows(Ann.hnswWalkDriverOver(spark, adj2, entry2, ml2, queries, 4, 32, 8))
    assert(served2 === served,
      "post-GC publish diverged — the compacted chain lost serving state")

    // 5. CROSS-TIER: the same root's layer-0 edges are the flat NSW
    // graph; quantize-publish the int8 tier from the identical state
    val out3 = "file:" + java.nio.file.Files.createTempDirectory("graft-lifeart3").toString
    val (adj8, entry8) = Ann.publishInt8Gen(spark,
      IndexStreams.membersThrough(spark, root, 2L),
      spark.read.parquet(s"$root/gen=2/edges")
        .filter(col("layer") === 0L).select(col("src"), col("dst")), out3)
    val served8 = rows(Ann.graphSearchInt8DriverOver(spark, adj8, entry8, queries, 4, 32, 8))
    assert(served8.nonEmpty && served8.groupBy(_._1).forall(_._2.size === 4))
    // the quantized tier serves the whole grown corpus
    assert(adj8.select("src").distinct().count() === n)
    info(s"one streamed root served the layered walk (${served.size} rows, " +
      s"identical across GC) and the int8 tier (${served8.size} rows) over all $n vectors")
  }
}
