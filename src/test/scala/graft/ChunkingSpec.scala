package graft

import graft.operators.{Chunking, SemanticSearch, TextAnalysis}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = tempSfDir(
    "documents" -> Seq(
      (0L, "first sentence. second sentence. third", "en", "srcA", 1L),
      (1L, "only one", "en", "srcB", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("sentence chunker splits on '. ' with positions") {
    val got = Chunking.sentences(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(
      (0L, 0, "first sentence"), (0L, 1, "second sentence"), (0L, 2, "third"),
      (1L, 0, "only one")))
  }

  test("citation stripping removes bracketed spans") {
    val rows = Chunking.stripCitations(spark, dir).collect()
    // "[srcA] text [en]" -> " text " -> brackets gone
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getAs[Long]("n_chars") === " first sentence. second sentence. third ".length.toLong)
  }

  test("sections split on the reference's 24-dollar sentinel") {
    assert(Chunking.SectionSep === "$$$$$$$$$$$$$$$$$$$$$$$$") // data_fetcher.py:9
    val real = "/root/testdata/sf0.001"
    val secs = Chunking.sections(spark, real, secTokens = 50).collect()
    val nToks = graft.Graft.documents(spark, real)
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // one section per started 50-token block, ids contiguous from 0,
    // and no section retains the sentinel
    val byDoc = secs.groupBy(_.getLong(0))
    assert(byDoc.keySet === nToks.keySet)
    byDoc.foreach { case (doc, rows) =>
      assert(rows.length === (nToks(doc) - 1) / 50 + 1)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (0 until rows.length))
      rows.foreach(r => assert(!r.getString(2).contains("$")))
    }
  }

  test("point ids are deterministic hex prefixes") {
    val ids = Chunking.pointIds(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids(0L).matches("[0-9a-f]{16}"))
    assert(ids(0L) !== ids(1L))
  }

  test("highlight window centers on the deterministic top chunk") {
    val rows = SemanticSearch.highlightWindow(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val ctx = r.getAs[String]("context").split(" ")
      assert(ctx.length >= 2 && ctx.length <= 3) // center +/- 1, clipped at edges
    }
  }

  test("quality score is bounded and computed per doc") {
    val rows = TextAnalysis.quality(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val q = r.getAs[Long]("quality_micros")
      assert(q > 0 && q <= 1000000)
    }
  }
}
