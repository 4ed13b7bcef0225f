package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Training-data pipeline text operators: repetition scoring, PII
  * redaction, stratified sampling, benchmark decontamination — semantics
  * on constructed documents (the cross-engine value check is the DuckDB
  * oracle gate).
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = tempSfDir(
    "documents" -> Seq(
      (1L, "spam spam spam spam spam spam", "en", "web", 30L),
      (2L, "one two three four five six seven", "en", "web", 33L),
      (3L, "reach me at bob@example.com or +1 (555) 123-4567 today", "en", "web", 54L),
      (4L, "plain text with no contact information at all", "de", "web", 45L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("repetition: repeated 3-grams score high, unique text scores 0") {
    val m = TextAnalysis.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rep_micros")).toMap
    // "spam x6": 4 total 3-grams, 1 distinct -> 750000 micros
    assert(m(1L) === 750000L)
    assert(m(2L) === 0L)
  }

  test("redact_pii: emails and phones replaced and counted") {
    val rows = TextAnalysis.redactPii(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(3L).getAs[Long]("n_emails") === 1L)
    assert(rows(3L).getAs[Long]("n_phones") === 1L)
    val red = rows(3L).getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    assert(!red.contains("bob@example.com"))
    assert(rows(4L).getAs[Long]("n_emails") === 0L)
    assert(rows(4L).getAs[String]("redacted").contains("plain text"))
  }

  test("stratified sample is deterministic and respects per-lang rates") {
    val a = TextAnalysis.sampleStratified(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.sampleStratified(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty)
    val buckets = TextAnalysis.sampleStratified(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("bucket"))
    buckets.foreach { case (lang, bucket) =>
      val cap = lang match { case "en" => 50; case "de" => 30; case "fr" => 20; case _ => 10 }
      assert(bucket < cap, s"$lang bucket $bucket >= $cap")
    }
  }

  test("decontam flags the document that copies a benchmark passage") {
    // doc 10 shares a long verbatim passage with benchmark doc 1
    val contaminated = tempSfDir(
      "documents" -> Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web", 63L),
        (2L, "completely unrelated benchmark text about graph theory and primes", "en", "web", 65L),
        (10L, "prefix words then the quick brown fox jumps over the lazy dog near the river bank suffix", "en", "web", 89L),
        (11L, "nothing in common with any benchmark document whatsoever here", "en", "web", 61L),
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hits = TextAnalysis.decontaminate(spark, contaminated).collect()
    val flagged = hits.map(r => (r.getLong(0), r.getAs[Long]("bench_id"))).toSet
    assert(flagged.contains((10L, 1L)), s"got $flagged")
    assert(!hits.map(_.getLong(0)).contains(11L))
  }
}
