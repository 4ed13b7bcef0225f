package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Article ingestion sources, mirroring the reference's two ingest
  * paths re-expressed for Spark:
  *
  *  - JSONL scientific-papers datasets (reference
  *    dataset/armac_scientific_papers.py:41-53): article_id,
  *    abstract_text sentences tagged with `<S>...</S>`, nested
  *    sections, section_names — normalized to (article_id,
  *    section_names with a leading "Abstract", sections as
  *    array<array<string>> of paragraphs).
  *  - EuropePMC full-text XML by PMCID (reference
  *    src/backend/data_fetching/fetch_pmcid.py): section extraction +
  *    citation-bracket stripping. The HTTP fetch is out of scope
  *    (zero-egress); the parse takes the XML payload as input, so a
  *    production feed is `spark.read` over fetched XML blobs →
  *    mapPartitions(parsePmcXml).
  *
  * Both are pure map-stage readers: schema-on-read, no shuffle,
  * distributed line/file parallelism via the standard sources.
  */
object Articles {

  /** Load a JSONL papers dataset (one article per line) and normalize
    * like the reference: strip `<S>` sentence tags, drop empty
    * paragraphs/sections, prepend the abstract as an "Abstract" section.
    */
  def fromJsonl(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.json(path))

  /** Same normalization on an already-loaded frame with columns
    * (article_id, article_abstract? abstract_text, sections,
    * section_names).
    */
  def normalize(raw: DataFrame): DataFrame =
    raw.select(
      col("article_id"),
      concat(array(lit("Abstract")), col("section_names")).as("section_names"),
      concat(
        array(expr(
          "transform(abstract_text, s -> replace(replace(s, '<S>', ''), '</S>', ''))")),
        expr(
          """transform(filter(sections, sec -> size(sec) > 0),
            | sec -> transform(filter(sec, p -> p != ''),
            |   p -> replace(replace(p, '<S>', ''), '</S>', '')))""".stripMargin))
        .as("sections"))

  /** One article's chunk rows (the CHUNKS collection payload of
    * reference qdrant.py:126-133): explode sections -> paragraphs with
    * section names and paragraph ids.
    */
  def chunkRows(articles: DataFrame): DataFrame =
    articles
      .select(col("article_id"),
        posexplode(arrays_zip(col("section_names"), col("sections")))
          .as(Seq("sec_idx", "sec")))
      .select(col("article_id"), col("sec.section_names").as("section_name"),
        posexplode(col("sec.sections")).as(Seq("paragraph_id", "paragraph")))

  /** Parse one EuropePMC full-text XML document (reference
    * fetch_pmcid.py:6-36): PMCID, section titles, per-section text with
    * citation brackets stripped. JDK DOM only — runs inside
    * mapPartitions with no extra dependencies.
    */
  def parsePmcXml(xml: String): PmcArticle = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))

    def elems(tag: String): Seq[org.w3c.dom.Element] = {
      val nl = doc.getElementsByTagName(tag)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
    }

    val pmcid = elems("article-id")
      .find(e => e.getAttribute("pub-id-type") == "pmcid")
      .map(e => "PMC" + e.getTextContent.trim)
      .getOrElse("")
    val abstractText = elems("abstract").headOption.map(_.getTextContent.trim).getOrElse("")
    val secs = elems("sec")
    val names = "Abstract" +: secs.map { s =>
      val ts = s.getElementsByTagName("title")
      if (ts.getLength > 0) ts.item(0).getTextContent else ""
    }
    val bodies = abstractText +: secs.map { s =>
      val ps = s.getElementsByTagName("p")
      val text = (0 until ps.getLength).map(ps.item(_).getTextContent).mkString("\n")
      text.replaceAll("\\[[^\\]]*\\]", "")
    }
    PmcArticle(pmcid, names, bodies)
  }

  case class PmcArticle(articleId: String, sectionNames: Seq[String], sections: Seq[String])

  /** Distributed PMC XML ingestion: a frame of raw XML payloads ->
    * parsed article rows (parser instantiated per partition).
    */
  def fromPmcXml(xmlDf: DataFrame): DataFrame = {
    val spark = xmlDf.sparkSession
    import spark.implicits._
    xmlDf.select(col("xml")).as[String]
      .mapPartitions(_.map(parsePmcXml))
      .toDF("article_id", "section_names", "sections")
  }

  /** PDF ingestion — unimplemented in the reference too
    * (fetch_pdf.py:1-3 raises NotImplementedError); kept for API parity.
    */
  def fromPdf(pdfDf: DataFrame): Nothing =
    throw new NotImplementedError(
      "PDF ingestion is unimplemented (matches the reference's fetch_from_pdf stub)")
}
