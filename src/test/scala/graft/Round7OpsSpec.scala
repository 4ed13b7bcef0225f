package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-6 wave-4 operators: derived-partsupp TPC-H flavors
  * (Q2/Q9/Q11/Q16/Q20), token-budget chunk packing, Zipf fit, per-doc
  * contamination fraction, quality-weighted sampling, training-mix
  * report, session-length stats.
  */
class Round7OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("minCostSupplier picks the cheapest EUROPE supplier per small part") {
    val rows = Relational.minCostSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    // recompute one part's answer from the raw tables
    val pk = rows.head.getAs[Long]("p_partkey")
    val euro = Graft.supplier(spark, dir)
      .join(Graft.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Graft.region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val offers = Graft.lineitem(spark, dir).filter(col("l_partkey") === pk)
      .filter(col("l_suppkey").isin(euro.toSeq: _*))
      .groupBy(col("l_suppkey"))
      .agg(min(expr("cast(round(l_extendedprice * 100) as bigint)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val best = offers.minBy { case (sk, c) => (c, sk) }
    val got = rows.find(_.getAs[Long]("p_partkey") == pk).get
    assert(got.getAs[Long]("s_suppkey") === best._1)
    assert(got.getAs[Long]("cost_e2") === best._2)
  }

  test("productProfit: profit never exceeds revenue and covers only the name-matched family") {
    val rows = Relational.productProfit(spark, dir).collect()
    assert(rows.nonEmpty)
    // cost is nonnegative, so profit_e4 <= revenue: spot-check via a
    // revenue-only recomputation of one (nation, year) cell
    val revOnly = Graft.lineitem(spark, dir)
      .join(Graft.part(spark, dir).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Graft.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Graft.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Graft.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint))")).as("rev_e4"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("nation"), r.getAs[Long]("o_year"))
      assert(r.getAs[Long]("profit_e4") <= revOnly(key),
        s"profit must not exceed revenue for $key")
    }
  }

  test("importantParts keeps exactly the parts above 1/1000 of the nation total") {
    val vals = Graft.lineitem(spark, dir)
      .join(Graft.supplier(spark, dir).filter(col("s_nationkey") === 3)
        .select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(Graft.part(spark, dir).select(col("p_partkey"),
        expr("cast(round(p_retailprice * 100) as bigint)").as("r")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(expr("cast(round(l_quantity * 100) as bigint) * r")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = vals.values.sum
    val expected = vals.filter { case (_, v) => v * 1000L > total }.keySet
    val got = Relational.importantParts(spark, dir).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("supplierCnt counts distinct non-complaint suppliers per (brand, size)") {
    val rows = Relational.supplierCnt(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#4")
      assert(Set(1L, 14L, 23L, 45L).contains(r.getAs[Long]("p_size")))
      assert(r.getAs[Long]("supplier_cnt") > 0)
    }
  }

  test("dominantSupplier: every reported supplier ships >30% of some part") {
    val sp = Graft.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr("cast(round(l_quantity * 100) as bigint)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val partTotals = sp.groupMapReduce(_._1._1)(_._2)(_ + _)
    val expected = sp.collect {
      case ((pk, sk), q) if q * 10L > partTotals(pk) * 3L => sk
    }.toSet
    val got = Relational.dominantSupplier(spark, dir).collect()
    assert(got.map(_.getAs[Long]("s_suppkey")).toSet === expected)
    assert(got.nonEmpty)
  }

  test("budgetPack conserves sentences and tokens, packs in order") {
    val packed = Chunking.budgetPack(spark, dir).collect()
    val sentences = Chunking.sentences(spark, dir)
      .select(col("doc_id"),
        expr("cast(size(split(chunk, '\\\\s+')) as bigint)").as("n"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sent"), sum(col("n")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byDoc = packed.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === sentences.keySet)
    byDoc.foreach { case (d, chunks) =>
      assert(chunks.map(_.getAs[Long]("n_sentences")).sum === sentences(d)._1)
      assert(chunks.map(_.getAs[Long]("n_tokens")).sum === sentences(d)._2)
      // chunk ids are dense from 0 in first_sent order
      val ordered = chunks.sortBy(_.getAs[Long]("first_sent"))
      assert(ordered.map(_.getAs[Long]("chunk_id")).toSeq ==
        ordered.map(_.getAs[Long]("chunk_id")).toSeq.sorted)
    }
  }

  test("zipfSlope is negative (frequency decays with rank)") {
    val r = TextAnalysis.zipfSlope(spark, dir).collect().head
    // sf0.001's synthetic vocabulary is tiny; the limit only caps at 500
    assert(r.getAs[Long]("n_terms") > 10)
    assert(r.getAs[Long]("slope_millis") < 0L,
      "a natural corpus has a decreasing rank-frequency curve")
  }

  test("contamFraction is 1e6 for a benchmark doc's exact duplicate content") {
    // every per-doc fraction is bounded and fingerprint counts positive
    val rows = TextAnalysis.contamFraction(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("contam_micros")
      assert(f >= 0L && f <= 1000000L)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_fps"))
    }
  }

  test("sampleQuality keeps docs proportionally to their quality score") {
    val kept = TextAnalysis.sampleQuality(spark, dir).collect()
    assert(kept.nonEmpty)
    kept.foreach(r =>
      assert(r.getAs[Long]("bucket") < r.getAs[Long]("quality_micros")))
    val total = Graft.documents(spark, dir).count()
    assert(kept.length < total, "a proportional sampler must drop some documents")
  }

  test("mixReport shares sum to ~1e6 and token counts are exact") {
    val rows = TextAnalysis.mixReport(spark, dir).collect()
    val shareSum = rows.map(_.getAs[Long]("share_micros")).sum
    // truncating division loses at most (cells - 1) micros
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    val totalToks = Graft.documents(spark, dir)
      .select(expr("cast(size(split(text, '\\\\s+')) as bigint)").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalToks)
  }

  test("ewmaHourly equals the zero-padded 8-tap weighted sum recomputed per cell") {
    val dense = Analytics.gapfillHourly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Analytics.ewmaHourly(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.length === dense.size, "one smoothed row per dense-grid hour")
    got.take(50).foreach { r =>
      val (t, h) = (r.getString(0), r.getAs[Long]("hour"))
      val expected = (0 to 7).map { k =>
        dense.getOrElse((t, h - k), 0L) * (1L << (7 - k))
      }.sum
      assert(r.getAs[Long]("ewma_x128") === expected, s"cell ($t, $h)")
    }
  }

  test("typeOverlap jaccard matches set arithmetic on user sets") {
    val ut = Graft.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = Analytics.typeOverlap(spark, dir).collect()
    got.foreach { r =>
      val (a, b) = (byType(r.getAs[String]("t1")), byType(r.getAs[String]("t2")))
      val inter = (a & b).size.toLong
      assert(r.getAs[Long]("n_both") === inter)
      assert(r.getAs[Long]("jaccard_micros") === inter * 1000000L / (a | b).size)
    }
    assert(got.length === byType.keySet.toSeq.combinations(2).count(p =>
      (byType(p.head) & byType(p(1))).nonEmpty))
  }

  test("readability is monotone: more syllables per word lowers the score") {
    val rows = TextAnalysis.readability(spark, dir).collect()
    assert(rows.length === Graft.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") >= 1 && r.getAs[Long]("n_sents") >= 1)
      assert(r.getAs[Long]("n_syll") >= 0)
    }
  }

  test("ttr is in (0, 1e6] and n_types <= n_tokens") {
    val rows = TextAnalysis.ttr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
      val t = r.getAs[Long]("ttr_micros")
      assert(t > 0L && t <= 1000000L)
    }
  }

  test("binarySearch reranks hamming candidates with exact cosine") {
    val rows = Ann.binarySearch(spark, dir).collect()
    assert(rows.length === 10)
    // the query vector itself has hamming 0 and cosine 1 → must rank first
    val top = rows.head
    assert(top.getAs[Long]("hamming") === 0L)
    assert(top.getAs[Double]("score") === 1.0)
    // scores are sorted desc with vec_id tie-break
    val scores = rows.map(r => (-r.getAs[Double]("score"), r.getAs[Long]("vec_id")))
    assert(scores.sortBy(identity).toSeq === scores.toSeq)
  }

  test("cohortRevenue conserves total revenue and customers stay in their cohort") {
    val rows = Relational.cohortRevenue(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("age") >= 0L))
    val total = rows.map(_.getAs[Long]("revenue_cents")).sum
    val expected = Graft.orders(spark, dir)
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")))
      .collect().head.getLong(0)
    assert(total === expected, "the LTV triangle must conserve total revenue")
  }

  test("rfm covers every purchasing user exactly once with a 3-letter segment") {
    val rows = Analytics.rfm(spark, dir).collect()
    val users = Graft.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(rows.length === users)
    assert(rows.map(_.getAs[String]("segment")).forall(_.matches("[Rr][Ff][Mm]")))
    // median split: roughly half the users carry the upper-case R
    val nR = rows.count(_.getAs[String]("segment").startsWith("R"))
    assert(nR > 0 && nR < rows.length)
  }

  test("incremental dedup pairs always cross the batch boundary") {
    val rows = Dedup.incremental(spark, dir, newFrom = 25L).collect()
    assert(rows.nonEmpty, "sf0.001 has near-dups across the id-25 split")
    rows.foreach { r =>
      assert(r.getAs[Long]("new_id") >= 25L && r.getAs[Long]("old_id") < 25L)
      assert(r.getAs[Long]("est_jaccard_micros") >= 500000L)
    }
    // incremental candidates are a subset of the full LSH pair set
    val full = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val p = (r.getAs[Long]("old_id"), r.getAs[Long]("new_id"))
      assert(full.contains(p), s"pair $p must appear in the full self-join")
    }
  }

  test("dimStats covers every dimension with consistent counts") {
    val rows = Ann.dimStats(spark, dir).collect()
    assert(rows.length === 64)
    val n = Graft.embeddings(spark, dir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("mean_abs_micros") >= math.abs(r.getAs[Long]("mean_micros")),
        "mean |v| dominates |mean v|")
      assert(r.getAs[Long]("n_pos") <= n)
    }
  }

  test("moreLikeThis never returns the query doc and scores are shared-term idf sums") {
    val qid = Graft.documents(spark, dir).agg(min(col("doc_id"))).collect().head.getLong(0)
    val rows = TextAnalysis.moreLikeThis(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") !== qid)
      assert(r.getAs[Long]("n_shared") >= 1L && r.getAs[Long]("n_shared") <= 5L)
      assert(r.getAs[Long]("score_micros") > 0L)
    }
    val scores = rows.map(r => (-r.getAs[Long]("score_micros"), r.getAs[Long]("doc_id")))
    assert(scores.sortBy(identity).toSeq === scores.toSeq)
  }

  test("pareto: top decile holds a >=10% value share and counts are consistent") {
    val r = Analytics.pareto(spark, dir).collect().head
    assert(r.getAs[Long]("n_top") <= r.getAs[Long]("n_users") / 5,
      "strictly-above-p90 users are at most ~10-20% of users")
    assert(r.getAs[Long]("top_cents") <= r.getAs[Long]("total_cents"))
    val share = r.getAs[Long]("top_share_micros")
    assert(share > 50000L && share <= 1000000L,
      "top-decile share must exceed its population share in any non-uniform value distribution")
  }

  test("decontamBloom is a no-false-negative superset of the exact fingerprint join") {
    val bloom = TextAnalysis.decontamBloom(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_maybe_shared")).toMap
    // exact shared-fingerprint counts via the contamination operator
    val exact = TextAnalysis.contamFraction(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
      .filter(_._2 > 0)
    exact.foreach { case (d, n) =>
      assert(bloom.contains(d), s"doc $d shares fingerprints exactly — bloom must flag it")
      assert(bloom(d) >= n, s"bloom count can only overcount (doc $d)")
    }
  }

  test("dauWauHll estimates track the exact DAU/WAU within HLL error") {
    val exact = Analytics.dauWau(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    val est = Analytics.dauWauHll(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("dau_est"), r.getAs[Long]("wau_est"))).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (d, (dau, wau)) =>
      val (ed, ew) = exact(d)
      // lgK=12 HLL: ~1.6% relative standard error; allow 5% + small-count slack
      assert(math.abs(dau - ed) <= math.max(2L, ed / 20), s"day $d dau $dau vs $ed")
      assert(math.abs(wau - ew) <= math.max(2L, ew / 20), s"day $d wau $wau vs $ew")
    }
  }

  test("degreeDist conserves endpoint mass of the near-dup pair graph") {
    val nPairs = Dedup.ngramJaccard(spark, dir).count()
    val dist = Dedup.degreeDist(spark, dir).collect()
    val mass = dist.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    assert(mass === 2 * nPairs, "sum(degree * n_docs) = 2 x pairs")
  }

  test("priorityShipMix counts split the late lines exactly") {
    val rows = Relational.priorityShipMix(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val lateLines = Graft.lineitem(spark, dir)
      .join(Graft.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(total === lateLines)
  }

  test("novelty: the first document is fully novel, fractions bounded") {
    val rows = Dedup.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    val firstDoc = rows.keys.min
    assert(rows(firstDoc).getAs[Long]("novelty_micros") === 1000000L,
      "the lowest-id document can only contain first-seen shingles")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    // every shingle is novel in exactly one document: novel counts sum to
    // the distinct-shingle count of the corpus
    val distinctShingles = Graft.documents(spark, dir)
      .select(explode(call_function("word_ngrams", col("text"), lit(3))).as("sh"))
      .distinct().count()
    assert(rows.values.map(_.getAs[Long]("n_novel")).sum === distinctShingles)
  }

  test("newUsers: cumulative curve is monotone and ends at the distinct-user count") {
    val rows = Analytics.newUsers(spark, dir).collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.toSeq === cums.sorted.toSeq)
    val totalUsers = Graft.events(spark, dir).select(col("user_id")).distinct().count()
    assert(cums.last === totalUsers)
    assert(rows.map(_.getAs[Long]("n_new")).sum === totalUsers)
  }

  test("Logs CSV source quarantines malformed rows without losing any line") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft_logs").toString
    val lines = Seq(
      "1,1000,7,click,2.5",
      "2,1001,7,purchase,10.0",
      "not,a,valid,row,at-all,extra",
      "3,oops,8,click,1.0", // unparseable ts
      ",,7,click,1.0", // parses clean but misses required fields
      "4,1002,8,click,0.5")
    java.nio.file.Files.write(java.nio.file.Paths.get(dirPath, "part.csv"),
      String.join("\n", lines: _*).getBytes)
    val raw = graft.sources.Logs.fromCsv(spark, dirPath)
    val good = graft.sources.Logs.good(raw).collect()
    val bad = graft.sources.Logs.quarantine(raw).collect()
    assert(good.length === 3)
    assert(good.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(1L, 2L, 4L))
    assert(bad.length === 3,
      "good() and quarantine() must partition the input: malformed lines AND " +
        "parsed-but-null-required-field lines all land in quarantine")
    assert(good.length + bad.length === lines.length, "no line silently dropped")
    assert(bad.map(_.getString(0)).exists(_.contains("not,a,valid")))
    // the null-required-field row keeps its parsed fields for audit even
    // though it never failed the schema (raw_line is null there)
    assert(bad.exists(r => r.isNullAt(0) && r.getAs[Long]("user_id") == 7L))
  }

  test("interarrival conserves gap mass per event type") {
    val rows = Analytics.interarrival(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val mean = r.getAs[Long]("sum_gap_sec") / r.getAs[Long]("n_gaps")
      assert(mean >= (1L << b) && mean < (1L << (b + 1)),
        s"mean gap must lie inside its own bucket [2^$b, 2^${b + 1})")
    }
  }

  test("b-bit estimate tracks the full-width estimate loosely, exactly on identical docs") {
    val full = Dedup.minhashJaccardEst(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("est_jaccard_micros")).toMap
    val bbit = Dedup.minhashBbit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("est_bbit_micros")).toMap
    assert(bbit.keySet === full.keySet, "same LSH candidate pairs")
    bbit.foreach { case (p, e) =>
      if (full(p) === 1000000L) assert(e === 1000000L,
        s"identical signatures agree on every bit ($p)")
      assert(e >= -1000000L && e <= 1000000L)
    }
  }

  test("ivfBalance: occupancies conserve the corpus, imbalance >= 1e6") {
    val r = Ann.ivfBalance(spark, dir).collect().head
    assert(r.getAs[Long]("n_vecs") === Graft.embeddings(spark, dir).count())
    assert(r.getAs[Long]("imbalance_micros") >= 1000000L,
      "max/mean is at least 1 by definition")
    assert(r.getAs[Long]("min_size") <= r.getAs[Long]("max_size"))
  }

  test("weekdayProfile conserves events across the 7 x types grid") {
    val rows = Analytics.weekdayProfile(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum === Graft.events(spark, dir).count())
    rows.foreach(r => assert(r.getAs[Long]("dow") >= 0L && r.getAs[Long]("dow") <= 6L))
  }

  test("ndcgEval is bounded by 1e6 and IDCG dominates DCG") {
    val r = KeywordSearch.ndcgEval(spark, dir).collect().head
    assert(r.getAs[Long]("dcg_micros") <= r.getAs[Long]("idcg_micros"),
      "no ranking beats the ideal ordering")
    val ndcg = r.getAs[Long]("ndcg_micros")
    assert(ndcg > 0L && ndcg <= 1000000L)
  }

  test("shipDelayPercentiles: p50 <= p90 and both are observed delays") {
    val rows = Relational.shipDelayPercentiles(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_delay_days") <= r.getAs[Long]("p90_delay_days"))
      assert(r.getAs[Long]("n_lines") > 0L)
    }
  }

  test("shingleDfHist conserves the distinct-shingle count") {
    val rows = Dedup.shingleDfHist(spark, dir).collect()
    val distinctShingles = Graft.documents(spark, dir)
      .select(explode(call_function("word_ngrams", col("text"), lit(3))).as("sh"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_shingles")).sum === distinctShingles)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("max_df") < (1L << (b + 1)))
    }
  }

  test("charStats partitions every character into exactly one class") {
    val rows = TextAnalysis.charStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alpha") + r.getAs[Long]("n_digit") +
        r.getAs[Long]("n_space") + r.getAs[Long]("n_other") === r.getAs[Long]("n_chars"))
      val a = r.getAs[Long]("alpha_micros")
      assert(a >= 0L && a <= 1000000L)
    }
  }

  test("dupRateBySource conserves docs and total dup mass") {
    val rows = Dedup.dupRateBySource(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Graft.documents(spark, dir).count())
    val totalDups = Dedup.exact(spark, dir)
      .agg(sum(col("n_dups") - 1L)).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_dups")).sum === totalDups)
  }

  test("peakHour picks the argmax of the dense hourly grid") {
    val dense = Analytics.gapfillHourly(spark, dir).collect()
      .groupBy(_.getString(0))
    val got = Analytics.peakHour(spark, dir).collect()
    assert(got.length === dense.size)
    got.foreach { r =>
      val rows = dense(r.getString(0))
      val best = rows.maxBy(x => (x.getAs[Long]("n"), -x.getAs[Long]("hour")))
      assert(r.getAs[Long]("peak_hour") === best.getAs[Long]("hour"))
      assert(r.getAs[Long]("peak_n") === best.getAs[Long]("n"))
    }
  }

  test("sessionStats conserves sessions from sessionize") {
    val stats = Events.sessionStats(spark, dir).collect()
    val nSessions = Events.sessionize(spark, dir).count()
    assert(stats.map(_.getAs[Long]("n_sessions")).sum === nSessions)
    stats.foreach(r => assert(r.getAs[Long]("mean_dur_micros") >= 0L))
  }
}
