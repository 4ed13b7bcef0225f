package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{IndexBuilder, SemanticSearch}

class IndexBuilderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("main collection: one row per doc, meanpool vector, hash ids") {
    val (main, chunks) = IndexBuilder.build(spark, dir)
    val m = main.collect()
    assert(m.length === chunks.select("doc_key").distinct().count())
    m.foreach { r =>
      assert(r.getAs[String]("point_id").matches("[0-9a-f]{16}"))
      assert(r.getAs[scala.collection.Seq[Double]]("doc_vec").length === SemanticSearch.Dim)
    }
    // doc vector equals the positional mean of its chunk vectors
    val viaPositional = SemanticSearch.meanPoolPositional(spark, dir)
      .filter(col("label") === m.head.getAs[Int]("doc_key"))
      .orderBy("pos").collect().map(_.getAs[Double]("v"))
    val built = m.head.getAs[scala.collection.Seq[Double]]("doc_vec").map(v => math.rint(v * 1e6) / 1e6)
    assert(built.zip(viaPositional).forall { case (a, b) => math.abs(a - b) < 2e-6 })
  }

  test("upsert replaces batch docs, keeps others, and is idempotent") {
    import spark.implicits._
    val v1 = Files.createTempDirectory("graft-index-v1").toString
    val (m0, c0) = IndexBuilder.build(spark, dir)
    m0.write.parquet(s"$v1/main")
    c0.write.parquet(s"$v1/chunks")
    val nDocs = m0.count()

    // batch: replace doc_key 0 with ONE new chunk, add new doc_key 99
    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](SemanticSearch.Dim); a(axis) = 1.0f; a
    }
    val batch = Seq((0, 5000L, unit(0)), (99, 5001L, unit(1)))
      .toDF("doc_key", "chunk_id", "embedding")

    val v2 = Files.createTempDirectory("graft-index-v2").toString
    val (m2, c2) = IndexBuilder.upsert(spark, v1, batch, v2)
    assert(m2.count() === nDocs + 1)
    val doc0 = m2.filter(col("doc_key") === 0).collect().head
    assert(doc0.getAs[Long]("n_chunks") === 1L)
    assert(doc0.getAs[scala.collection.Seq[Double]]("doc_vec").head === 1.0)
    assert(m2.filter(col("doc_key") === 99).count() === 1)
    assert(c2.filter(col("doc_key") === 0).count() === 1)
    // untouched doc unchanged
    val before = m0.filter(col("doc_key") === 1).collect().head.getAs[scala.collection.Seq[Double]]("doc_vec")
    val after = m2.filter(col("doc_key") === 1).collect().head.getAs[scala.collection.Seq[Double]]("doc_vec")
    assert(before === after)
    // idempotent: upserting the same batch again changes nothing
    val v3 = Files.createTempDirectory("graft-index-v3").toString
    val (m3, _) = IndexBuilder.upsert(spark, v2, batch, v3)
    assert(m3.count() === m2.count())
    assert(m3.orderBy("doc_key").collect().map(_.getAs[String]("point_id")).toSeq ===
      m2.orderBy("doc_key").collect().map(_.getAs[String]("point_id")).toSeq)
  }

  test("compact preserves the row set and restores the bucketed layout") {
    import spark.implicits._
    // gen1: an upserted (fragmented, unbucketed) generation
    val v1 = Files.createTempDirectory("graft-cpt-v1").toString
    val (m0, c0) = IndexBuilder.build(spark, dir)
    m0.write.parquet(s"$v1/main"); c0.write.parquet(s"$v1/chunks")
    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](SemanticSearch.Dim); a(axis) = 1.0f; a
    }
    val batch = Seq((0, 5000L, unit(0))).toDF("doc_key", "chunk_id", "embedding")
    val v2 = Files.createTempDirectory("graft-cpt-v2").toString
    val (m2, c2) = IndexBuilder.upsert(spark, v1, batch, v2)

    val v3 = Files.createTempDirectory("graft-cpt-v3").toString
    val (m3, c3) = IndexBuilder.compact(spark, v2, v3, buckets = 4)
    // pure rewrite: identical row sets
    assert(m3.orderBy("doc_key").collect().map(_.getAs[String]("point_id")).toSeq ===
      m2.orderBy("doc_key").collect().map(_.getAs[String]("point_id")).toSeq)
    assert(c3.count() === c2.count())
    assert(c3.select("doc_key", "chunk_id").orderBy("doc_key", "chunk_id").collect().toSeq ===
      c2.select("doc_key", "chunk_id").orderBy("doc_key", "chunk_id").collect().toSeq)
    // bucketed again: the id-filtered self-join plans shuffle-free
    val j = c3.as("a").join(c3.as("b"), "doc_key")
    j.count()
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"compacted chunks join must not shuffle: $shuffles")
  }

  test("partitioned corpus layout prunes a (source, lang) slice at the scan") {
    val out = Files.createTempDirectory("graft-part").toString
    val back = IndexBuilder.writePartitionedCorpus(spark, dir, out)
    val orig = Graft.documents(spark, dir)
    assert(back.count() === orig.count())
    // hive-style cell directories exist
    assert(new java.io.File(s"$out/source=src0/lang=en").exists())
    // a one-cell read carries partition filters into the scan and
    // matches the unpartitioned filter row-for-row
    import org.apache.spark.sql.functions.col
    val cell = back.filter(col("source") === "src0" && col("lang") === "en")
    assert(cell.count() ===
      orig.filter(col("source") === "src0" && col("lang") === "en").count())
    val exec = cell.queryExecution.executedPlan
    exec.executeCollect()
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "source/lang predicates must prune partitions, not filter rows")
    // the driven scan read only the one cell's files, not the corpus
    def parquets(d: java.io.File): Int =
      if (d.isDirectory) d.listFiles.map(parquets).sum
      else if (d.getName.endsWith(".parquet")) 1 else 0
    val cellFiles = parquets(new java.io.File(s"$out/source=src0/lang=en"))
    val allFiles = parquets(new java.io.File(out))
    assert(cellFiles < allFiles)
    assert(scans.head.metrics("numFiles").value === cellFiles.toLong,
      "pruned scan must list exactly the cell's files")
  }

  test("search_from_index equals search_pipeline and never shuffles chunk rows") {
    import graft.operators.SemanticSearch
    val fromIndex = SemanticSearch.searchFromIndex(spark, dir)
    val got = fromIndex.collect().map(_.toSeq)
    val expected = SemanticSearch.searchPipeline(spark, dir).collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq, "written-index search must be read-equivalent")
    // the bucketed CHUNKS scan must feed the window, the ±1 self-join and
    // the context groupBy WITHOUT an exchange: no ShuffleExchange may sit
    // above a bucketed chunks file scan anywhere in the executed plan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val plan = fromIndex.queryExecution.executedPlan
    val offending = helper.collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike
        if helper.collectFirst(e.child) {
          case sc: FileSourceScanExec if sc.relation.bucketSpec.isDefined => sc
        }.isDefined => e
    }
    assert(offending.isEmpty,
      s"bucketed chunk rows must not shuffle, found exchanges above the bucketed scan:\n$offending")
    // and the bucketed scan IS in the plan (the assert above is not vacuous)
    val bucketedScans = helper.collectWithSubqueries(plan) {
      case sc: FileSourceScanExec if sc.relation.bucketSpec.isDefined => sc
    }
    assert(bucketedScans.nonEmpty, "search_from_index must read the bucketed CHUNKS table")
  }

  test("chunks collection round-trips bucketed with chunk metadata") {
    val out = Files.createTempDirectory("graft-index").toString
    val (main, chunks) = IndexBuilder.write(spark, dir, out, buckets = 4)
    assert(main.count() > 0)
    assert(chunks.count() === Graft.embeddings(spark, dir).count())
    // bucketed table self-join on doc_key plans without a shuffle
    val j = chunks.as("a").join(chunks.as("b"), "doc_key")
    j.count()
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"bucketed chunks join must not shuffle: $shuffles")
  }
}
