package graft

import java.nio.file.{Files, Paths}
import graft.sources.Articles

class ArticlesSpec extends SparkSpec {

  test("jsonl dataset normalizes like the reference loader") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val line =
      """{"article_id":"PMC1","article_abstract":"x",
        |"abstract_text":["<S>first sent</S>","<S>second sent</S>"],
        |"section_names":["Intro","Methods"],
        |"sections":[["para one","","para two"],["m para"]]}""".stripMargin.replace("\n", "")
    Files.write(dir.resolve("a.jsonl"), line.getBytes)
    val got = Articles.fromJsonl(spark, dir.toString).collect().head
    assert(got.getAs[scala.collection.Seq[String]]("section_names").toSeq === Seq("Abstract", "Intro", "Methods"))
    val sections = got.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("sections")
    assert(sections.map(_.toSeq).toSeq === Seq(
      Seq("first sent", "second sent"),
      Seq("para one", "para two"),
      Seq("m para")))
  }

  test("chunk rows carry section names and paragraph ids") {
    val dir = Files.createTempDirectory("graft-jsonl2")
    val line =
      """{"article_id":"PMC2","abstract_text":["<S>a</S>"],
        |"section_names":["Intro"],"sections":[["p1","p2"]]}""".stripMargin.replace("\n", "")
    Files.write(dir.resolve("a.jsonl"), line.getBytes)
    val chunks = Articles.chunkRows(Articles.fromJsonl(spark, dir.toString))
      .collect()
      .map(r => (r.getAs[String]("section_name"), r.getAs[Int]("paragraph_id"),
        r.getAs[String]("paragraph"))).toSet
    assert(chunks === Set(("Abstract", 0, "a"), ("Intro", 0, "p1"), ("Intro", 1, "p2")))
  }

  test("pmc xml parse extracts id, titles, citation-stripped sections") {
    val xml =
      """<article>
        |  <front><article-meta>
        |    <article-id pub-id-type="pmcid">123456</article-id>
        |  </article-meta></front>
        |  <abstract><p>The abstract text.</p></abstract>
        |  <body>
        |    <sec><title>Introduction</title>
        |      <p>First para [1] with citation [2,3].</p>
        |      <p>Second para.</p></sec>
        |    <sec><title>Methods</title><p>We did things [4].</p></sec>
        |  </body>
        |</article>""".stripMargin
    val a = Articles.parsePmcXml(xml)
    assert(a.articleId === "PMC123456")
    assert(a.sectionNames === Seq("Abstract", "Introduction", "Methods"))
    assert(a.sections.head === "The abstract text.")
    assert(a.sections(1) === "First para  with citation .\nSecond para.")
    assert(a.sections(2) === "We did things .")

    import spark.implicits._
    val df = Seq(xml).toDF("xml")
    val parsed = Articles.fromPmcXml(df).collect().head
    assert(parsed.getAs[String]("article_id") === "PMC123456")
  }
}
