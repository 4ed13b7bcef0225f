package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-6 operators: range search, MaxSim late interaction, embedding /
  * LSH index QA, corpus profiling, returned-item / priority-check /
  * cadence analytics — plus the shared-cache registry semantics.
  */
class Round6OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("memoCache returns the same frame for the same (key, scope), rebuilds on scope change") {
    var builds = 0
    def build = { builds += 1; Graft.documents(spark, dir).select(col("doc_id")) }
    val a = Graft.memoCache("spec_memo", "s1")(build)
    val b = Graft.memoCache("spec_memo", "s1")(build)
    assert(a eq b, "same scope must return the memoized frame")
    assert(builds === 1)
    val c = Graft.memoCache("spec_memo", "s2")(build)
    assert(builds === 2, "a new scope must rebuild")
    assert(!(c eq a))
    Graft.releaseCaches()
    Graft.memoCache("spec_memo", "s2")(build)
    assert(builds === 3, "releaseCaches must clear the memo registry")
    Graft.releaseCaches()
  }

  test("curate fusion matches the composed langid+quality formulation") {
    val composed = {
      val l = TextAnalysis.langid(spark, dir).select(col("doc_id"), col("lang"), col("pred"))
        .filter(col("pred") === col("lang"))
      val q = TextAnalysis.quality(spark, dir)
        .select(col("doc_id").as("q_id"), col("quality_micros"))
        .filter(col("quality_micros") >= 700000L)
      val canon = Dedup.exact(spark, dir).select(col("canonical_id"))
      l.join(q, col("doc_id") === col("q_id"))
        .join(canon, col("doc_id") === col("canonical_id"), "left_semi")
        .select(col("doc_id"), col("pred"), col("quality_micros"))
    }
    val fused = TextAnalysis.curate(spark, dir)
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      "fused curate must be row-identical to the composed operators")
    assert(fused.count() > 0)
  }

  test("rangeSearch returns exactly the vectors at/above the cosine radius") {
    val all = Graft.embeddings(spark, dir)
      .crossJoin(broadcast(SemanticSearch.queryVec(spark, dir)))
      .select(col("vec_id"),
        graft.functions.VectorOps.cosine6(col("embedding"), col("qvec")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Ann.rangeSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = all.filter(_._2 >= 0.2)
    assert(got === expected)
    assert(got.nonEmpty, "query vector itself has cosine 1 and must be in range")
  }

  test("maxSim: top group contains a query token at cosine 1; scores bounded and ordered") {
    val rows = Ann.maxSim(spark, dir).collect()
    assert(rows.length === 5)
    val scores = rows.map(_.getAs[Long]("maxsim_micros"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every per-token max is in [-1, 1] -> the 4-token sum is within 4e6
    assert(scores.forall(s => s >= -4000000L && s <= 4000000L))
    // the query tokens are corpus members, so their own labels score a
    // perfect 1e6 on at least one token; the global top must reflect that
    assert(scores.head >= 1000000L)
  }

  test("normOutliers flags the one blown-up norm in a constructed label") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f), 0), (4L, Array(1f, 0f, 0f), 0),
      (5L, Array(1f, 0f, 0f), 0), (6L, Array(1f, 0f, 0f), 0),
      (7L, Array(9f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val d = tempSfDir("embeddings" -> emb)
    val out = Ann.normOutliers(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_vecs") === 7L)
    // norms in millis: six 1000s and one 9000 -> mean 15000/7 = 2142
    assert(out.head.getAs[Long]("mean_norm_millis") === 2142L)
    assert(out.head.getAs[Long]("n_outliers") === 1L)
  }

  test("lshStats: 4 bands, pair mass covers the candidate join") {
    val stats = Dedup.lshStats(spark, dir).collect()
    assert(stats.map(_.getAs[Long]("band_id")).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    assert(stats.forall(r => r.getAs[Long]("max_bucket") >= 1L))
    // every candidate pair shares >= 1 band bucket, so the summed pair
    // mass is an upper bound on the distinct-pair count
    val mass = stats.map(_.getAs[Long]("cand_pairs")).sum
    val pairs = Dedup.minhashLsh(spark, dir).count()
    assert(mass >= pairs)
  }

  test("entropy: constant doc scores 0, uniform 4-token doc scores ln(4) micros") {
    val docs = Seq(
      (1L, "same same same same", "en", "s", 19L),
      (2L, "a b c d", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tempSfDir("documents" -> docs)
    val out = TextAnalysis.entropy(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("entropy_micros")))
      .toMap
    assert(out(1L) === ((4L, 0L)))
    assert(out(2L) === ((4L, 1386294L))) // round(ln(4) * 1e6)
  }

  test("lengthHistogram: power-of-two buckets from bit arithmetic") {
    val docs = Seq(
      (1L, "one", "en", "s", 3L),             // 1 token  -> bucket 0, lo 1
      (2L, "a b c d e", "en", "s", 9L),       // 5 tokens -> bucket 2, lo 4
      (3L, "a b c d e f g h", "en", "s", 15L)) // 8 tokens -> bucket 3, lo 8
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tempSfDir("documents" -> docs)
    val out = TextAnalysis.lengthHistogram(spark, d).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("bucket_lo"), r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))
      .toMap
    assert(out === Map(0L -> ((1L, 1L, 1L)), 2L -> ((4L, 1L, 5L)), 3L -> ((8L, 1L, 8L))))
  }

  test("priorityLate counts each order once however many lines are late") {
    val day = 86400L * 1000L // an arbitrary base day, in epoch seconds
    def ts(d: Long) = new java.sql.Timestamp(d * 1000)
    val orders = Seq(
      (1L, ts(day), "1-URGENT"), (2L, ts(day), "1-URGENT"), (3L, ts(day), "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts(day + 61 * 86400)), (1L, ts(day + 90 * 86400)), // two late lines, one order
      (2L, ts(day + 10 * 86400)),                             // on time
      (3L, ts(day + 61 * 86400)))
      .toDF("l_orderkey", "l_shipdate")
    val d = tempSfDir("orders" -> orders, "lineitem" -> li)
    val out = Relational.priorityLate(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    assert(out === Map("1-URGENT" -> 1L, "5-LOW" -> 1L))
  }

  test("reorderGap: exact day gaps and integer-micros mean") {
    def ts(d: Long) = new java.sql.Timestamp(d * 86400L * 1000)
    val orders = Seq(
      (10L, 1L, ts(100)), (10L, 2L, ts(110)), (10L, 3L, ts(125)), // gaps 10, 15
      (20L, 4L, ts(50)))                                          // no gap
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val cust = Seq((10L, "BUILDING"), (20L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val d = tempSfDir("orders" -> orders, "customer" -> cust)
    val out = Relational.reorderGap(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("segment") === "BUILDING")
    assert(out.head.getAs[Long]("n_gaps") === 2L)
    assert(out.head.getAs[Long]("sum_gap_days") === 25L)
    assert(out.head.getAs[Long]("mean_gap_micros") === 12500000L)
  }

  test("forecastRevenue: only in-band rows aggregate, exact integer product") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (ts("1997-06-01"), 100.0, 0.06, 10.0), // kept: 10000 * 6 = 60000
      (ts("1997-06-01"), 100.0, 0.06, 30.0), // qty out of band
      (ts("1997-06-01"), 100.0, 0.10, 10.0), // discount out of band
      (ts("1998-06-01"), 100.0, 0.06, 10.0)) // year out of band
      .toDF("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
    val d = tempSfDir("lineitem" -> li)
    val out = Relational.forecastRevenue(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_items") === 1L)
    assert(out.head.getAs[Long]("forecast_e4") === 60000L)
  }

  test("returnedCustomers: descending revenue, only R-flag lines counted") {
    val rows = Relational.returnedCustomers(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("revenue_e4"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val expectTotal = Graft.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Graft.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)" +
        " * (100 - cast(round(l_discount * 100) as bigint))")).as("r"))
      .orderBy(col("r").desc, col("o_custkey")).limit(1).collect()
    assert(revs.head === expectTotal.head.getAs[Long]("r"))
  }
}
