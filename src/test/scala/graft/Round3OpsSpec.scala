package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Ann, Dedup, Relational, TextAnalysis}

/** Round-3 operators: robust stats, range frames, decorrelated
  * subqueries, chunk-level dedup, TF-IDF/PMI, k-means step, PQ search.
  * Semantics checked on constructed micro-tables where the contract is
  * subtle; invariants + cross-operator consistency on real sf0.001.
  */
class Round3OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def ordersDir: String = {
    val orders = Seq(
      // custkey 1: days 0, 10, 50 since epoch; prices 10, 20, 30
      (1L, 1L, "O", 10.0, "1970-01-01", "1-URGENT"),
      (2L, 1L, "O", 20.0, "1970-01-11", "1-URGENT"),
      (3L, 1L, "O", 30.0, "1970-02-20", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    tempSfDir("orders" -> orders)
  }

  test("trailingSpend: RANGE frame accumulates only the 30-day window") {
    val rows = Analytics.trailingSpend(spark, ordersDir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    assert(rows(1L).getAs[Long]("spend_30d_cents") === 1000L)
    assert(rows(2L).getAs[Long]("spend_30d_cents") === 3000L) // day 10 sees day 0
    assert(rows(3L).getAs[Long]("spend_30d_cents") === 3000L) // day 50 sees only itself
    assert(rows(3L).getAs[Long]("n_orders_30d") === 1L)
  }

  test("aboveCustomerAvg: strictly-above comparison, integer arithmetic") {
    val rows = Analytics.aboveCustomerAvg(spark, ordersDir).collect()
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet === Set(3L))
    assert(rows.head.getAs[Long]("cust_avg_micros") === 20000000L) // $20 in micros
  }

  test("madOutliers: one row per type, MAD bounded by sanity") {
    val rows = Analytics.madOutliers(spark, dir).collect()
    val total = Graft.events(spark, dir).count()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") >= 0L && r.getAs[Long]("n_outliers") < total)
    }
  }

  test("cheapestPerPart: exactly one row per part, true minimum") {
    val li = Graft.lineitem(spark, dir)
    val got = Analytics.cheapestPerPart(spark, dir)
    assert(got.count() === li.select("l_partkey").distinct().count())
    val mins = li.groupBy("l_partkey").agg(min("l_extendedprice").as("mn"))
    val joined = got.join(mins, "l_partkey")
      .filter(col("l_extendedprice") =!= col("mn")).count()
    assert(joined === 0L)
  }

  private def dupDocsDir: String = {
    val shared = (1 to 32).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, shared, "en", "a", 1L),
      (1L, shared, "en", "b", 1L),
      (2L, (1 to 32).map(i => s"other$i").mkString(" "), "en", "c", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    tempSfDir("documents" -> docs)
  }

  test("chunkDedup: identical windows collapse to the first occurrence") {
    val rows = Dedup.chunkDedup(spark, dupDocsDir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_copies") === 2L)
    assert(rows.head.getAs[Long]("canonical_doc") === 0L)
    assert(rows.head.getAs[Long]("canonical_chunk") === 0L)
  }

  test("docDupFraction: fully-shared doc scores 1e6, unique doc 0") {
    val rows = Dedup.docDupFraction(spark, dupDocsDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_frac_micros")).toMap
    assert(rows(0L) === 1000000L && rows(1L) === 1000000L && rows(2L) === 0L)
  }

  test("containment dominates Jaccard on every Jaccard pair") {
    val jac = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("jaccard_micros"))
      .toMap
    val cont = Dedup.containment(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("overlap_micros"))
      .toMap
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      assert(cont.contains(pair), s"jaccard pair $pair missing from containment")
      assert(cont(pair) >= j, s"overlap < jaccard for $pair")
    }
  }

  test("tfidfTopk: at most k terms per doc, scores non-negative and ranked") {
    val rows = TextAnalysis.tfidfTopk(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val scores = rs.map(_.getAs[Double]("tfidf6"))
      assert(scores.forall(_ >= 0.0))
    }
  }

  test("cooccurPmi: top-20 adjacent pairs above the count cutoff") {
    val rows = TextAnalysis.cooccurPmi(spark, dir).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[Long]("n_pair") >= 25L))
    val pmis = rows.map(_.getAs[Double]("pmi6"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
  }

  test("kmeansStep: members conserved, shift cosine in (0, 1]") {
    val rows = Ann.kmeansStep(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum === Graft.embeddings(spark, dir).count())
    rows.foreach { r =>
      val c = r.getAs[Double]("shift_cos6")
      assert(c > 0.0 && c <= 1.0, s"cid ${r.getAs[Long]("cid")} shift $c")
      assert(r.getAs[Double]("new_norm6") > 0.0)
    }
  }

  test("eventTransitions: probabilities per source sum to ~1e6") {
    val rows = Analytics.eventTransitions(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val total = rs.map(_.getAs[Long]("prob_micros")).sum
      // integer floor division loses < 1 micro per destination type
      assert(total > 1000000L - rs.length && total <= 1000000L, s"$from sums to $total")
    }
  }

  test("slidingCounts: every event lands in exactly 4 windows") {
    val n = Analytics.slidingCounts(spark, dir).agg(sum("n")).head().getLong(0)
    assert(n === 4L * Graft.events(spark, dir).count())
  }

  test("spendQuartiles: buckets ordered by spend, all four present") {
    val rows = Analytics.spendQuartiles(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("quartile")).toSet === Set(1L, 2L, 3L, 4L))
    val byQ = rows.groupBy(_.getAs[Long]("quartile"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("spend_cents")) }
    for (q <- 1L to 3L)
      assert(byQ(q).max <= byQ(q + 1).min,
        s"quartile $q max overlaps ${q + 1} min")
  }

  test("unigramLogprob: NLL positive, n_toks conserved") {
    val rows = TextAnalysis.unigramLogprob(spark, dir).collect()
    assert(rows.length === Graft.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("nll_per_tok_micros") > 0L) // every p(w) < 1
      assert(r.getAs[Long]("n_toks") > 0L)
    }
  }

  test("marketShare: yearly shares sum to ~1e6, revenue conserved") {
    val rows = Relational.marketShare(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("o_year")).foreach { case (y, rs) =>
      val total = rs.map(_.getAs[Long]("share_micros")).sum
      assert(total > 1000000L - rs.length && total <= 1000000L, s"year $y sums to $total")
    }
  }

  test("nationTraffic: no same-nation pairs, positive revenue") {
    val rows = Relational.nationTraffic(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("cust_nation") !== r.getAs[String]("supp_nation"))
      assert(r.getAs[Long]("revenue_e4") > 0L)
    }
  }

  test("dauWau: DAU never exceeds WAU, stickiness within (0, 1e6]") {
    val rows = Analytics.dauWau(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val s = r.getAs[Long]("stickiness_micros")
      assert(s > 0L && s <= 1000000L)
    }
  }

  test("pagerank: ranks bounded, symmetric-degree graph conserves mass") {
    val rows = Dedup.pagerank(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rank = r.getAs[Long]("rank_micros")
      assert(rank >= 150000L, s"rank below teleport floor: $rank")
      assert(r.getAs[Long]("deg") >= 1L)
    }
    // total rank stays near n * 1e6 (integer floor loses < 1 micro/edge)
    val total = rows.map(_.getAs[Long]("rank_micros")).sum
    val n = rows.length.toLong
    assert(total <= n * 1000000L && total > n * 1000000L - n - rows.map(_.getAs[Long]("deg")).sum)
  }

  test("pqRefine: exact re-rank scores match brute force on the overlap") {
    val refined = Ann.pqRefine(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    val exact = Ann.bruteForce(spark, dir, 50).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    assert(refined.size === 5)
    // every refined score is the TRUE cosine (identical to brute force)
    refined.foreach { case (id, s) =>
      exact.get(id).foreach(e => assert(e === s, s"vec $id score drifted"))
    }
  }

  test("pivotOrders: row counts conserved across the pivoted columns") {
    val rows = Analytics.pivotOrders(spark, dir).collect()
    val total = rows.map(r => (1 to 5).map(i => r.getLong(i)).sum).sum
    val expected = Graft.customer(spark, dir)
      .join(Graft.orders(spark, dir), col("c_custkey") === col("o_custkey")).count()
    assert(total === expected)
  }

  test("topTokensApprox: sketch contains every exact top-20 token") {
    val approx = Analytics.topTokensApprox(spark, dir).collect()
      .map(_.getString(0)).toSet
    val exact = Analytics.topTokens(spark, dir).collect()
      .map(_.getAs[String]("tok")).toSet
    assert(exact.subsetOf(approx),
      s"missing from sketch: ${exact.diff(approx)}")
  }

  test("gapfillHourly: dense grid, zero-filled gaps, counts conserved") {
    val rows = Analytics.gapfillHourly(spark, dir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val hours = rs.map(_.getAs[Long]("hour")).sorted
      assert(hours.length === (hours.max - hours.min + 1).toInt, s"$t grid has holes")
    }
    assert(rows.map(_.getAs[Long]("n")).sum === Graft.events(spark, dir).count())
  }

  test("userSetOps: inclusion-exclusion identity holds") {
    val r = Analytics.userSetOps(spark, dir).collect().head
    val clickers = Graft.events(spark, dir).filter(col("event_type") === "click")
      .select("user_id").distinct().count()
    val purchasers = Graft.events(spark, dir).filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_click_only") + r.getAs[Long]("n_both") === clickers)
    assert(r.getAs[Long]("n_either") ===
      clickers + purchasers - r.getAs[Long]("n_both"))
  }

  test("profileDocs: one row per column, counts bounded by row count") {
    val rows = TextAnalysis.profileDocs(spark, dir).collect()
    val n = Graft.documents(spark, dir).count()
    assert(rows.map(_.getAs[String]("col_name")).toSet ===
      Set("doc_id", "text", "lang", "source", "n_chars"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nulls") === 0L)
      assert(r.getAs[Long]("n_distinct") > 0L && r.getAs[Long]("n_distinct") <= n)
    }
    // the x5 Expand of a multi-countDistinct (full text in the shuffle)
    // must stay out of the plan: values are hashed then single-distinct
    val plan = TextAnalysis.profileDocs(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile_docs plans an Expand:\n$plan")
  }

  test("pq: ADC scores ranked, bounded by the product of norms") {
    val rows = Ann.pq(spark, dir).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("adc6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 10)
  }
}
