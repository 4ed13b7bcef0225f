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
