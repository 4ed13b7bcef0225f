package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve measurement harness (bench-adjacent main, like Bench):
  * replicates the sf0.1 tables into multiplied corpora under /tmp and
  * times named probes at each decade, emitting one JSONL line per
  * (probe, scale) — the evidence file the round's docs/ curves come
  * from.
  *
  * Corpus replication:
  *  - embeddings: R exact copies with offset vec_ids/labels (a
  *    dup-heavy corpus; build-cost shape is unaffected by duplicate
  *    vectors and real corpora ARE dup-heavy).
  *  - documents: per-replica word SUFFIXING keeps replica vocabularies
  *    disjoint (so true near-dup structure grows linearly — within a
  *    replica only), PLUS every 10th document REPLACED by a fixed
  *    unsuffixed TEMPLATE sentence across all replicas — the
  *    boilerplate stress the dedup_tfidf_cosine df-skew advisory asks
  *    about: for template-only docs the template bigrams ARE the top-8
  *    features (an appended template never is: doc-specific bigrams
  *    out-idf it, ln(N) vs ln(10) — measured linear), so the shared
  *    posting list grows with the corpus and the candidate self-join
  *    on it is quadratic unless capped.
  *
  * Usage: SPARK_GRAFT_PROBES=tfidf,phash SPARK_GRAFT_SCALES=1,10,30
  *   sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {

  val Template = "quarterly compliance disclosure boilerplate notice required by section seven"

  private def scaledDir(s: SparkSession, mult: Int): String = {
    val dir = s"/tmp/graft_scale/x$mult"
    val done = new java.io.File(s"$dir/_DONE")
    if (done.exists()) return dir
    val src = "/root/testdata/sf0.1"
    val e = s.read.parquet(s"$src/embeddings.parquet")
    val d = s.read.parquet(s"$src/documents.parquet")
    val nE = e.count(); val nL = 1000000L
    val nD = d.count()
    val reps = s.range(0, mult.toLong).toDF("rep")
    e.crossJoin(reps)
      .select((col("vec_id") + col("rep") * nE).as("vec_id"),
        col("embedding"),
        (col("label") + col("rep") * nL).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    d.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nD).as("doc_id"),
        when(col("doc_id") % 10 === 0, lit(Template))
          .otherwise(
            expr("array_join(transform(split(text, ' '), w -> concat(w, 'r', cast(rep as string))), ' ')"))
          .as("text"),
        col("source"), col("lang"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    done.createNewFile()
    dir
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Big-Q query batch off a 1-in-7 corpus residue: the residue can't
    * supply Q > N/7, so the batch REPLICATES the residue's vectors
    * under fresh q_ids (offset far above any corpus vec_id) — the Q
    * axis is what every crossq probe measures; per-query work is
    * identical whether vectors repeat. One builder shared by the
    * crossq/hfq/i8fq probes (same batch ⇒ comparable lines).
    */
  private def qbatchOf(spark: SparkSession, dir: String): Int => DataFrame = {
    val qbase = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val nBase = qbase.count()
    (q: Int) => {
      val reps = (q + nBase - 1) / nBase
      qbase.crossJoin(spark.range(reps).toDF("qrep"))
        .select((col("vec_id") + col("qrep") * 1000000000L).as("q_id"),
          col("embedding").as("qv"))
        .orderBy(col("q_id")).limit(q)
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = sys.env.getOrElse("SPARK_GRAFT_PROBES", "tfidf").split(",").toSet
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10").split(",").map(_.toInt)
    val out = new java.io.PrintWriter(new java.io.FileWriter(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp/graft_probe.jsonl"), true))
    def emit(m: (String, Any)*): Unit = {
      val line = m.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v) => s""""$k":$v"""
      }.mkString("{", ",", "}")
      out.println(line); out.flush(); System.err.println(s"[probe] $line")
    }
    for (mult <- scales) {
      val dir = scaledDir(spark, mult)
      Graft.releaseCaches()
      if (probes("tfidf")) {
        val (sec, n) = time(operators.TextAnalysis.tfidfCosinePairs(spark, dir).count())
        val (csec, cands) = time(operators.TextAnalysis.tfidfCosineCandidates(spark, dir).count())
        emit("probe" -> "dedup_tfidf_cosine", "scale" -> s"${mult}x", "sec" -> sec,
          "pairs" -> n, "cand_pairs" -> cands, "cand_sec" -> csec)
      }
      if (probes("phash")) {
        val (hsec, nh) = time(operators.Multimodal.phash(spark, dir).count())
        val (psec, np) = time(operators.Multimodal.phashPairsQuery(spark, dir).count())
        emit("probe" -> "multimodal_phash", "scale" -> s"${mult}x", "hash_sec" -> hsec,
          "n_images" -> nh, "pairs_sec" -> psec, "pairs" -> np)
      }
      if (probes("evals")) {
        val (s1, _) = time(operators.Ann.recallSweep(spark, dir).count())
        val (s2, _) = time(operators.Ann.pqRecallEval(spark, dir).count())
        val (s3, _) = time(operators.Ann.matryoshkaEval(spark, dir).count())
        val (s4, _) = time(operators.Dedup.lshRecallEval(spark, dir).count())
        emit("probe" -> "evaluators", "scale" -> s"${mult}x", "recall_sweep_sec" -> s1,
          "pq_recall_sec" -> s2, "matryoshka_sec" -> s3, "lsh_recall_sec" -> s4)
      }
      if (probes("gsearch")) {
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // build once
        val (ssec, _) = time(operators.Ann.graphSearch(spark, dir).count()) // search reads memo
        val (s2sec, _) = time(operators.Ann.graphSearch(spark, dir).count()) // warm repeat
        emit("probe" -> "ann_graph_search", "scale" -> s"${mult}x", "build_sec" -> bsec,
          "search_sec" -> ssec, "search_warm_sec" -> s2sec)
      }
      if (probes("hsearch")) {
        val (bsec, _) = time(operators.Ann.hnswGraph(spark, dir).count()) // layered build once
        val (ssec, _) = time(operators.Ann.hnswSearch(spark, dir).count())
        val (wsec, _) = time(operators.Ann.hnswSearch(spark, dir).count()) // warm repeat
        emit("probe" -> "ann_hnsw_search", "scale" -> s"${mult}x", "build_sec" -> bsec,
          "search_sec" -> ssec, "search_warm_sec" -> wsec)
      }
      if (probes("i8search")) {
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // float build once
        val (ssec, _) = time(operators.Ann.graphSearchInt8(spark, dir).count())
        val (wsec, _) = time(operators.Ann.graphSearchInt8(spark, dir).count())
        emit("probe" -> "ann_graph_search_int8", "scale" -> s"${mult}x", "build_sec" -> bsec,
          "search_sec" -> ssec, "search_warm_sec" -> wsec)
      }
      if (probes("fsearch")) {
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // build once
        val (ssec, _) = time(operators.Ann.graphSearchFiltered(spark, dir).count())
        val (wsec, _) = time(operators.Ann.graphSearchFiltered(spark, dir).count())
        emit("probe" -> "ann_graph_search_filtered", "scale" -> s"${mult}x", "build_sec" -> bsec,
          "search_sec" -> ssec, "search_warm_sec" -> wsec)
      }
      if (probes("gensearch")) {
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // build once
        val (psec, _) = time(operators.Ann.writtenGraphGen(spark, dir)._1.count()) // publish + load
        val (ssec, _) = time(operators.Ann.graphSearchFromGen(spark, dir).count())
        val (wsec, _) = time(operators.Ann.graphSearchFromGen(spark, dir).count())
        emit("probe" -> "ann_graph_search_from_gen", "scale" -> s"${mult}x", "build_sec" -> bsec,
          "publish_sec" -> psec, "search_sec" -> ssec, "search_warm_sec" -> wsec)
      }
      if (probes("bigq")) {
        // batch-serving shape: Q far beyond the keyed 20-query request,
        // walked through BOTH beam paths (driver-ranked vs distributed
        // rounds) over the same serving index — the routing threshold's
        // evidence line
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // build once
        val undE = operators.Ann.graphSearchIndex(spark, dir)
        val cents = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") < operators.Ann.sqrtFanout(
            Graft.tableRows(spark, dir, "embeddings")))
          .select(col("vec_id").as("node"), col("embedding").as("nv"))
        val queries = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 7 === 3).orderBy(col("vec_id")).limit(2000)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val (dsec, nd) = time(operators.Ann.beamSearchBatch(
          spark, undE, cents, queries, 4, 32, 8, distThreshold = 0).count())
        val (vsec, nv) = time(operators.Ann.beamSearchBatch(
          spark, undE, cents, queries, 4, 32, 8, distThreshold = Int.MaxValue).count())
        emit("probe" -> "beam_bigq", "scale" -> s"${mult}x", "q" -> 2000,
          "build_sec" -> bsec, "dist_sec" -> dsec, "driver_sec" -> vsec,
          "rows_dist" -> nd, "rows_driver" -> nv)
      }
      if (probes("bigq_variants")) {
        // r16: the SAME big-Q evidence line for the three walks that
        // gained a distributed route this round — filtered (dual
        // state), int8 (quantized index) and layered HNSW (descent).
        // Row-count equality across paths is asserted, not just timed.
        val queries = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 7 === 3).orderBy(col("vec_id")).limit(2000)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val (fb, _) = time(operators.Ann.nswGraph(spark, dir).count())
        val (fd, nfd) = time(operators.Ann.graphSearchFilteredBatch(
          spark, dir, queries, 4, 32, 8, byId = true, 5L, 2L, distThreshold = 0).count())
        val (fv, nfv) = time(operators.Ann.graphSearchFilteredBatch(
          spark, dir, queries, 4, 32, 8, byId = true, 5L, 2L,
          distThreshold = Int.MaxValue).count())
        require(nfd == nfv, s"filtered big-Q paths diverged: $nfd != $nfv")
        emit("probe" -> "filtered_bigq", "scale" -> s"${mult}x", "q" -> 2000,
          "build_sec" -> fb, "dist_sec" -> fd, "driver_sec" -> fv, "rows" -> nfd)
        val (id8, n8d) = time(operators.Ann.graphSearchInt8Batch(
          spark, dir, queries, 4, 32, 8, distThreshold = 0).count())
        val (iv8, n8v) = time(operators.Ann.graphSearchInt8Batch(
          spark, dir, queries, 4, 32, 8, distThreshold = Int.MaxValue).count())
        require(n8d == n8v, s"int8 big-Q paths diverged: $n8d != $n8v")
        emit("probe" -> "int8_bigq", "scale" -> s"${mult}x", "q" -> 2000,
          "dist_sec" -> id8, "driver_sec" -> iv8, "rows" -> n8d)
        val (hb, _) = time(operators.Ann.hnswGraph(spark, dir).count())
        val edges = operators.Ann.hnswGraph(spark, dir)
        val (hd, nhd) = time(operators.Ann.hnswSearchBatch(
          spark, dir, edges, "hnsw_search_index", queries, 4, 32, 8,
          distThreshold = 0).count())
        val (hv, nhv) = time(operators.Ann.hnswSearchBatch(
          spark, dir, edges, "hnsw_search_index", queries, 4, 32, 8,
          distThreshold = Int.MaxValue).count())
        require(nhd == nhv, s"layered big-Q paths diverged: $nhd != $nhv")
        emit("probe" -> "hnsw_bigq", "scale" -> s"${mult}x", "q" -> 2000,
          "build_sec" -> hb, "dist_sec" -> hd, "driver_sec" -> hv, "rows" -> nhd)
      }
      if (probes("crossq")) {
        // r17: crossover evidence ABOVE GraphSearchDistQ=8192 — every
        // earlier big-Q probe ran Q=2000, where the driver-ranked path
        // wins 2-3x locally; the 8192 placement was argued from driver
        // MEMORY (Q·beam·2k scored rows per round), never measured.
        // Probe the routed walks above the threshold and record both
        // wall times plus the per-round driver state the driver path
        // holds (scored candidate rows = Q·beam·~2k it collects).
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count())
        val undE = operators.Ann.graphSearchIndex(spark, dir)
        val cents = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") < operators.Ann.sqrtFanout(
            Graft.tableRows(spark, dir, "embeddings")))
          .select(col("vec_id").as("node"), col("embedding").as("nv"))
        emit("probe" -> "crossq_build", "scale" -> s"${mult}x", "build_sec" -> bsec)
        val qbatch = qbatchOf(spark, dir)
        def tryPath(f: => Long): (Double, Long) =
          try time(f) catch { case e: Throwable =>
            System.err.println(s"[probe] path failed: $e"); (-1.0, -1L) }
        for (q <- Seq(16384, 65536)) {
          val queries = qbatch(q)
          val (dsec, nd) = tryPath(operators.Ann.beamSearchBatch(
            spark, undE, cents, queries, 4, 32, 8, distThreshold = 0).count())
          val (vsec, nv) = tryPath(operators.Ann.beamSearchBatch(
            spark, undE, cents, queries, 4, 32, 8, distThreshold = Int.MaxValue).count())
          if (nd >= 0 && nv >= 0) require(nd == nv, s"flat crossq paths diverged: $nd != $nv")
          emit("probe" -> "flat_crossq", "scale" -> s"${mult}x", "q" -> q,
            "dist_sec" -> dsec, "driver_sec" -> vsec, "rows" -> math.max(nd, nv),
            "driver_scored_rows_per_round" -> q.toLong * 32 * 8)
        }
        // the other three routed walks at one above-threshold point
        val q16 = qbatch(16384)
        val (fd, nfd) = tryPath(operators.Ann.graphSearchFilteredBatch(
          spark, dir, q16, 4, 32, 8, byId = true, 5L, 2L, distThreshold = 0).count())
        val (fv, nfv) = tryPath(operators.Ann.graphSearchFilteredBatch(
          spark, dir, q16, 4, 32, 8, byId = true, 5L, 2L,
          distThreshold = Int.MaxValue).count())
        if (nfd >= 0 && nfv >= 0) require(nfd == nfv, s"filtered crossq paths diverged")
        emit("probe" -> "filtered_crossq", "scale" -> s"${mult}x", "q" -> 16384,
          "dist_sec" -> fd, "driver_sec" -> fv, "rows" -> math.max(nfd, nfv))
        val (id8, n8d) = tryPath(operators.Ann.graphSearchInt8Batch(
          spark, dir, q16, 4, 32, 8, distThreshold = 0).count())
        val (iv8, n8v) = tryPath(operators.Ann.graphSearchInt8Batch(
          spark, dir, q16, 4, 32, 8, distThreshold = Int.MaxValue).count())
        if (n8d >= 0 && n8v >= 0) require(n8d == n8v, s"int8 crossq paths diverged")
        emit("probe" -> "int8_crossq", "scale" -> s"${mult}x", "q" -> 16384,
          "dist_sec" -> id8, "driver_sec" -> iv8, "rows" -> math.max(n8d, n8v))
        // the layered descent last (the most round-heavy walk:
        // ~2 greedy rounds x layers + 8 beam rounds)
        val (hb, _) = time(operators.Ann.hnswGraph(spark, dir).count())
        val edges = operators.Ann.hnswGraph(spark, dir)
        val (hd, nhd) = tryPath(operators.Ann.hnswSearchBatch(
          spark, dir, edges, "hnsw_search_index", q16, 4, 32, 8,
          distThreshold = 0).count())
        val (hv, nhv) = tryPath(operators.Ann.hnswSearchBatch(
          spark, dir, edges, "hnsw_search_index", q16, 4, 32, 8,
          distThreshold = Int.MaxValue).count())
        if (nhd >= 0 && nhv >= 0) require(nhd == nhv, s"layered crossq paths diverged")
        emit("probe" -> "hnsw_crossq", "scale" -> s"${mult}x", "q" -> 16384,
          "build_sec" -> hb, "dist_sec" -> hd, "driver_sec" -> hv,
          "rows" -> math.max(nhd, nhv))
      }
      if (probes("hfq")) {
        // r17: the new FILTERED LAYERED walk on both sides of the
        // GraphSearchDistQ threshold — extends the crossover table
        // (bench_r17_crossover.md) to the fifth routed walk
        val (hb, _) = time(operators.Ann.hnswGraph(spark, dir).count())
        val qbatch = qbatchOf(spark, dir)
        for (q <- Seq(2000, 16384)) {
          val queries = qbatch(q)
          val (hd, nhd) = time(operators.Ann.hnswSearchFilteredBatch(
            spark, dir, queries, distThreshold = 0).count())
          val (hv, nhv) = time(operators.Ann.hnswSearchFilteredBatch(
            spark, dir, queries, distThreshold = Int.MaxValue).count())
          require(nhd == nhv, s"hnsw filtered crossq paths diverged: $nhd != $nhv")
          emit("probe" -> "hnsw_filtered_crossq", "scale" -> s"${mult}x", "q" -> q,
            "build_sec" -> hb, "dist_sec" -> hd, "driver_sec" -> hv, "rows" -> nhd)
        }
      }
      if (probes("i8fq")) {
        // r17: the int8-FILTERED walk on both sides of the threshold —
        // the sixth routed walk's crossover evidence
        val (fb, _) = time(operators.Ann.nswGraph(spark, dir).count())
        val qbatch8 = qbatchOf(spark, dir)
        for (q <- Seq(2000, 16384)) {
          val queries = qbatch8(q)
          val (d8, n8d) = time(operators.Ann.graphSearchInt8FilteredBatch(
            spark, dir, queries, distThreshold = 0).count())
          val (v8, n8v) = time(operators.Ann.graphSearchInt8FilteredBatch(
            spark, dir, queries, distThreshold = Int.MaxValue).count())
          require(n8d == n8v, s"int8 filtered crossq paths diverged: $n8d != $n8v")
          emit("probe" -> "int8_filtered_crossq", "scale" -> s"${mult}x", "q" -> q,
            "build_sec" -> fb, "dist_sec" -> d8, "driver_sec" -> v8, "rows" -> n8d)
        }
      }
      if (probes("pipeline")) {
        // r17 pipeline additions. The scaled corpus is the designed
        // worst case for dedup_substring: every 10th document IS the
        // fixed template, so the template's 8-grams accumulate N/10
        // occurrences on ONE gram key — the df-skew the count-window
        // over gram must absorb (the window shuffles exactly what a
        // groupBy would; the probe checks the hot partition doesn't
        // break linearity). pack_sequences should be flat-linear: one
        // shard exchange + a sequential in-partition scan.
        val (dsec, ndup) = time(operators.Dedup.substringDup(spark, dir)
          .agg(sum(col("n_dup"))).collect()(0).getLong(0))
        val (psec, nseq) = time(operators.TextAnalysis.packSequences(spark, dir).count())
        emit("probe" -> "pipeline_ops", "scale" -> s"${mult}x",
          "substring_sec" -> dsec, "dup_positions" -> ndup,
          "pack_sec" -> psec, "sequences" -> nseq)
      }
      if (probes("substr")) {
        // r17 mandate #5 evidence: the ExactSubstr gram exchange keyed
        // by the 128-bit hash vs the raw gram string — wall time AND
        // shuffle-write bytes per route, so the exchange-volume cut is
        // measured, not asserted. The listener tallies stage-level
        // shuffle writes; listener delivery is async, so each route
        // waits for the bus to drain before reading its tally.
        val tally = new java.util.concurrent.atomic.AtomicLong()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            tally.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(listener)
        def route(f: => Long): (Double, Long, Long) = {
          // deterministic bus drain (not a fixed sleep): events queued
          // by prior work are delivered before the tally resets, and the
          // route's own events before it is read
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
          tally.set(0L)
          val (sec, n) = time(f)
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
          (sec, n, tally.get())
        }
        // finally: a diverged require must not leak the listener into
        // every subsequent probe (double-counted tallies for the run)
        try {
          val (hs, nh, hb) = route(operators.Dedup.substringDupHashKeyed(spark, dir)
            .agg(sum(col("n_dup"))).collect()(0).getLong(0))
          val (ss, ns, sb) = route(operators.Dedup.substringDup(spark, dir)
            .agg(sum(col("n_dup"))).collect()(0).getLong(0))
          require(nh == ns, s"hash/string substring routes diverged: $nh != $ns")
          emit("probe" -> "substr_hashkey", "scale" -> s"${mult}x",
            "hash_sec" -> hs, "hash_shuffle_bytes" -> hb,
            "string_sec" -> ss, "string_shuffle_bytes" -> sb,
            "dup_positions" -> nh)
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      if (probes("dedupbuild")) {
        // r19: the dedup-gated build vs the plain build on the scaled
        // corpora — which ARE replica corpora (mult exact copies of
        // each sf0.1 vector), exactly the pathology the repair targets.
        // Expected shape: the plain build's cost grows with the full N
        // and its census fragments; the deduped build collapses to the
        // 2000 canonicals BEFORE the N*sqrt(N) scoring pass (cost ≈ the
        // 1x build + the collapse scan) and censuses at full reach.
        val (psec, pedges) = time(operators.Ann.nswGraph(spark, dir).count())
        val (pcsec, prows) = time(operators.Ann.graphConnectivity(spark, dir).collect())
        val plast = prows.maxBy(_.getLong(0))
        Graft.releaseCaches()
        val (dsec, dedges) = time(operators.Ann.nswGraphDeduped(spark, dir).count())
        val (dcsec, drows) = time(operators.Ann.graphConnectivityDeduped(spark, dir).collect())
        val dlast = drows.maxBy(_.getLong(0))
        emit("probe" -> "dedup_gated_build", "scale" -> s"${mult}x",
          "plain_build_sec" -> psec, "plain_edges" -> pedges,
          "plain_census_sec" -> pcsec, "plain_reach_micros" -> plast.getLong(3),
          "deduped_build_sec" -> dsec, "deduped_edges" -> dedges,
          "deduped_census_sec" -> dcsec, "deduped_reach_micros" -> dlast.getLong(3),
          "n_total" -> dlast.getLong(2))
      }
      if (probes("conn")) {
        // r18: frontier-BFS connectivity census scaling — the census
        // rides the memoized serving index, so the probe separates the
        // build from the 4-round frontier walk; final-round reach shows
        // whether the dup-heavy scaled corpus stays fully connected
        val (bsec, _) = time(operators.Ann.nswGraph(spark, dir).count())
        val (csec, rows) = time(operators.Ann.graphConnectivity(spark, dir).collect())
        val last = rows.maxBy(_.getLong(0))
        emit("probe" -> "graph_connectivity", "scale" -> s"${mult}x",
          "build_sec" -> bsec, "census_sec" -> csec,
          "n_total" -> last.getLong(2), "reach_final" -> last.getLong(1),
          "reach_micros" -> last.getLong(3))
        // the fanout sweep on the same corpus: on a dup-fragmented
        // graph, doubling the entry set should scale reach LINEARLY
        // (more cliques touched), never repair connectivity — the
        // data separating "grow the entry set" from "dedup first"
        val (fsec, frows) = time(operators.Ann.connectivityFanout(spark, dir).collect())
        val finals = frows.filter(_.getLong(1) == operators.Ann.GraphConnRounds.toLong)
          .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
        emit("probe" -> "conn_fanout", "scale" -> s"${mult}x", "sweep_sec" -> fsec,
          "reach_by_thr" -> finals.map { case (t, c) => s"$t:$c" }.mkString("\"", ",", "\""))
      }
      if (probes("dedupinsert")) {
        // r20: incremental maintenance of the DEDUPED generation vs the
        // rebuild — the cost contract behind ann_graph_insert_deduped.
        // The stored corpus is the scaled corpus with each replica's
        // dims ROTATED by its copy index, so every stored vector is a
        // distinct direction (all survive the collapse) and the rebuild
        // pays the full N·sqrt(N) scoring pass — the scoring-dominated
        // regime a real (mostly-unique) corpus lives in. The batch is
        // 2000 exact copies of stored vectors: the fold routes them as
        // dups with work ∝ batch, results rebuild-equal by the spec.
        val permDir = s"/tmp/graft_scale/ins_perm_x$mult"
        if (!new java.io.File(s"$permDir/_DONE").exists()) {
          spark.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"),
              expr("transform(sequence(0, 63), i -> embedding[cast((i + cast(vec_id / 2000 as int)) % 64 as int)])")
                .as("embedding"),
              col("label"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$permDir/embeddings.parquet")
          new java.io.File(s"$permDir/_DONE").createNewFile()
        }
        val eAll = spark.read.parquet(s"$permDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val nAll = eAll.count()
        val batch = eAll.filter(col("vec_id") < 2000)
          .select((col("vec_id") + nAll).as("vec_id"), col("embedding"))
          .localCheckpoint(true)
        val uDir = s"/tmp/graft_scale/ins_perm_union_x$mult"
        if (!new java.io.File(s"$uDir/_DONE").exists()) {
          eAll.unionByName(batch)
            .withColumn("label", (col("vec_id") % 1000L).cast("int"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$uDir/embeddings.parquet")
          new java.io.File(s"$uDir/_DONE").createNewFile()
        }
        // warm the FULL stored state (a deployment holds the generation
        // artifact — graph, attach, maps, cells; the fold's marginal
        // cost is the contract)
        val (ssec, _) = time {
          val st = operators.Ann.dedupedStoredState(spark, permDir, eAll, s"probe_ins_$mult")
          st.storedGraph.count(); st.storedMap.count()
          st.valueCanon.count(); st.survivorCells.count()
        }
        val (isec, in) = time(operators.Ann
          .dedupedInsertBatch(spark, permDir, eAll, s"probe_ins_$mult", batch)._1.count())
        Graft.releaseCaches()
        val (rsec, rn) = time(operators.Ann.nswGraphDeduped(spark, uDir).count())
        require(in == rn, s"insert/rebuild edge counts diverged: $in vs $rn")
        emit("probe" -> "dedup_insert_vs_rebuild", "scale" -> s"${mult}x",
          "stored_n" -> nAll, "batch_n" -> 2000,
          "stored_state_sec" -> ssec, "insert_sec" -> isec,
          "rebuild_sec" -> rsec, "edges" -> in)
      }
      if (probes("hdedupinsert")) {
        // r20b: incremental maintenance of the DEDUPED LAYERED
        // generation vs its rebuild — the dedupinsert contract applied
        // to the hierarchy (ann_hnsw_insert_deduped). Same
        // rotated-replica stored corpus (all-survivor, the
        // scoring-dominated regime), same 2000-copy dup batch; the
        // rebuild pays the per-layer N_l·sqrt(N_l) passes while the
        // fold's marginal cost stays ∝ batch + stored scans.
        val permDir = s"/tmp/graft_scale/ins_perm_x$mult"
        if (!new java.io.File(s"$permDir/_DONE").exists()) {
          spark.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"),
              expr("transform(sequence(0, 63), i -> embedding[cast((i + cast(vec_id / 2000 as int)) % 64 as int)])")
                .as("embedding"),
              col("label"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$permDir/embeddings.parquet")
          new java.io.File(s"$permDir/_DONE").createNewFile()
        }
        val eAll = spark.read.parquet(s"$permDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val nAll = eAll.count()
        val batch = eAll.filter(col("vec_id") < 2000)
          .select((col("vec_id") + nAll).as("vec_id"), col("embedding"))
          .localCheckpoint(true)
        val uDir = s"/tmp/graft_scale/ins_perm_union_x$mult"
        if (!new java.io.File(s"$uDir/_DONE").exists()) {
          eAll.unionByName(batch)
            .withColumn("label", (col("vec_id") % 1000L).cast("int"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$uDir/embeddings.parquet")
          new java.io.File(s"$uDir/_DONE").createNewFile()
        }
        // warm the stored state a deployment holds: routing maps +
        // the stored LAYERED survivor stack
        val (ssec, _) = time {
          val st = operators.Ann.dedupedStoredState(spark, permDir, eAll, s"probe_hins_$mult")
          st.storedMap.count(); st.valueCanon.count(); st.survivorCells.count()
          operators.Ann.hnswGraphDedupedOver(spark, eAll, s"probe_hins_$mult",
            permDir, 4, 3, operators.Ann.BuildDedupTauMicros).count()
        }
        val (isec, in) = time(operators.Ann
          .hnswInsertDedupedBatch(spark, permDir, eAll, s"probe_hins_$mult", batch).count())
        Graft.releaseCaches()
        val (rsec, rn) = time(operators.Ann.hnswGraphDeduped(spark, uDir).count())
        require(in == rn, s"layered insert/rebuild edge counts diverged: $in vs $rn")
        emit("probe" -> "hnsw_dedup_insert_vs_rebuild", "scale" -> s"${mult}x",
          "stored_n" -> nAll, "batch_n" -> 2000,
          "stored_state_sec" -> ssec, "insert_sec" -> isec,
          "rebuild_sec" -> rsec, "edges" -> in)
      }
      if (probes("hdedupbuild")) {
        // r20: the dedup-gated LAYERED build vs the plain hierarchy on
        // the replica corpora — the flat dedupbuild probe's contract
        // applied to the structure the reference serves: the collapse
        // runs once and every layer builds on canonicals, so the cost
        // advantage should widen with replica depth while the census
        // returns to full reach.
        val (psec, pedges) = time(operators.Ann.hnswGraph(spark, dir).count())
        val plainEdges = operators.Ann.hnswGraph(spark, dir)
        val und = plainEdges.select(col("src"), col("dst"))
          .union(plainEdges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint(true)
        val nTot = spark.read.parquet(s"$dir/embeddings.parquet").count()
        val entries = spark.range(operators.Ann.sqrtFanout(nTot)).toDF("node")
        val (pcsec, pcounts) = time(operators.Ann.censusCountsOver(und, entries, 4))
        val preach = pcounts.maxBy(_._1)._2
        Graft.releaseCaches()
        val (dsec, dedges) = time(operators.Ann.hnswGraphDeduped(spark, dir).count())
        val (dcsec, drows) = time(operators.Ann.hnswConnectivityDeduped(spark, dir).collect())
        val dlast = drows.maxBy(_.getLong(0))
        emit("probe" -> "hnsw_dedup_gated_build", "scale" -> s"${mult}x",
          "plain_build_sec" -> psec, "plain_edges" -> pedges,
          "plain_census_sec" -> pcsec,
          "plain_reach_micros" -> preach * 1000000L / math.max(nTot, 1L),
          "deduped_build_sec" -> dsec, "deduped_edges" -> dedges,
          "deduped_census_sec" -> dcsec, "deduped_reach_micros" -> dlast.getLong(3),
          "n_total" -> dlast.getLong(2))
      }
      if (probes("dedupdigest")) {
        // r20: the exact collapse keyed by the raw 256-byte vector value
        // vs the 16-byte digest — wall AND shuffle-write bytes for the
        // isolated groupBy+join-back stage (the scaled corpora are
        // replica corpora, the collapse's target shape). LZ4 narrows raw
        // key-width ratios (the r18 lesson), so the cut is measured.
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val tally = new java.util.concurrent.atomic.AtomicLong()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            tally.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        def route(f: => Long): (Double, Long, Long) = {
          spark.sparkContext.addSparkListener(listener)
          tally.set(0L)
          val (sec, n) = time(f)
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
          spark.sparkContext.removeSparkListener(listener)
          (sec, n, tally.get())
        }
        val (vsec, vn, vbytes) = route {
          e.join(e.groupBy(col("embedding")).agg(min(col("vec_id")).as("ec")), "embedding")
            .filter(col("vec_id") === col("ec")).count()
        }
        val (dsec, dn, dbytes) = route {
          val ed = e.withColumn("dig",
            struct(xxhash64(col("embedding")), xxhash64(reverse(col("embedding")))))
          ed.join(ed.groupBy(col("dig")).agg(min(col("vec_id")).as("ec")), "dig")
            .filter(col("vec_id") === col("ec")).count()
        }
        require(vn == dn, s"digest collapse must find the same survivors: $vn vs $dn")
        emit("probe" -> "dedup_digest_key", "scale" -> s"${mult}x",
          "survivors" -> vn,
          "value_sec" -> vsec, "value_shuffle_bytes" -> vbytes,
          "digest_sec" -> dsec, "digest_shuffle_bytes" -> dbytes)
      }
      if (probes("conngen")) {
        // r20: the census OFF THE WRITTEN GENERATION — the artifact a
        // fleet actually monitors. The narrow-projection eager
        // checkpoint means the generation parquet is scanned ONCE per
        // census whatever the round count; the probe separates the
        // publish (build+write+load) from the walk and runs the census
        // twice to show the flat repeat cost (the second census re-uses
        // nothing across calls by design — each checkpoint is fresh).
        val (psec, _) = time(operators.Ann.writtenGraphGen(spark, dir)._1.count())
        val (c1sec, rows1) = time(operators.Ann.graphConnectivityFromGen(spark, dir).collect())
        val (c2sec, _) = time(operators.Ann.graphConnectivityFromGen(spark, dir).collect())
        val last = rows1.maxBy(_.getLong(0))
        emit("probe" -> "conn_from_gen", "scale" -> s"${mult}x",
          "publish_sec" -> psec, "census_sec" -> c1sec, "census2_sec" -> c2sec,
          "n_total" -> last.getLong(2), "reach_micros" -> last.getLong(3))
      }
      if (probes("streamdedup")) {
        // r18: the streaming near-dup batch-cost contract — a FIXED
        // 1000-doc microbatch against stored signature state growing
        // 10k -> 10M rows; the per-batch cost should grow only with the
        // stored-sigs scan (the band join probes, it doesn't rescore),
        // never with candidate work (synthetic sigs are unique, so the
        // band index yields zero false candidates — the floor line)
        val batch = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(1000)
          .localCheckpoint(true)
        for (storedN <- Seq(10000L, 100000L, 1000000L, 10000000L)) {
          // persist()+count(), NOT localCheckpoint: checkpoint blocks
          // are RDD-level persists invisible to Dataset.unpersist, so
          // the 10M-row notch (~1GB) would stay pinned across loop
          // iterations — persist gives unpersist() real blocks to free
          val stored = spark.range(storedN).select(
              (col("id") + 10000000L).as("doc_id"),
              expr("transform(sequence(1, 12), i -> abs(xxhash64(id, i)) % 1000000006)")
                .as("sigs"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          stored.count()
          val (keptDf, sigsHandle) = graft.streaming.DedupStreams
            .nearDedupBatch(batch, stored, 500000L)
          val (sec, kept) = time(keptDf.count())
          sigsHandle.unpersist()
          emit("probe" -> "stream_neardedup", "scale" -> s"${mult}x",
            "batch_docs" -> 1000, "stored_sigs" -> storedN,
            "sec" -> sec, "kept" -> kept)
          stored.unpersist()
        }
      }
      if (probes("streamdedupbkt")) {
        // r19: the band-bucketed stored probe index vs the per-batch
        // derive-and-shuffle route, on a PARQUET-backed chain (the real
        // stream's stored side) — wall AND shuffle-write bytes per
        // route, so the co-location claim is measured, not asserted.
        // Routes are result-checked equal per notch.
        val batch = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(1000)
          .localCheckpoint(true)
        val tally = new java.util.concurrent.atomic.AtomicLong()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            tally.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(listener)
        def route(f: => Long): (Double, Long, Long) = {
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
          tally.set(0L)
          val (sec, n) = time(f)
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
          (sec, n, tally.get())
        }
        try {
          for (storedN <- Seq(1000000L, 10000000L)) {
            val root = s"/tmp/graft_scale/ndroot_$storedN"
            val fs = new java.io.File(s"$root/gen=0/sigs")
            if (!new java.io.File(s"$root/gen=0/kept/_SUCCESS").exists()) {
              spark.range(storedN).select(
                  (col("id") + 10000000L).as("doc_id"),
                  expr("transform(sequence(1, 12), i -> abs(xxhash64(id, i)) % 1000000006)")
                    .as("sigs"))
                .write.mode("overwrite").parquet(fs.getPath)
              spark.range(0).select(col("id").as("doc_id"))
                .write.mode("overwrite").parquet(s"$root/gen=0/kept")
            }
            val storedSigs = spark.read.parquet(fs.getPath)
            val (dsec, dkept, dbytes) = route {
              val (k, sh) = graft.streaming.DedupStreams
                .nearDedupBatch(batch, storedSigs, 500000L)
              val n = k.count(); sh.unpersist(); n
            }
            val (csec, (sigsT, bandsT)) = time(graft.streaming.DedupStreams
              .compactProbeIndexAt(spark, root, 0L))
            val (bsec, bkept, bbytes) = route {
              val (k, sh) = graft.streaming.DedupStreams
                .nearDedupBatchWithBands(batch, sigsT, bandsT, 500000L)
              val n = k.count(); sh.unpersist(); n
            }
            require(dkept == bkept, s"bucketed/derive routes diverged: $bkept != $dkept")
            emit("probe" -> "stream_neardedup_bucketed", "scale" -> s"${mult}x",
              "stored_sigs" -> storedN, "derive_sec" -> dsec,
              "derive_shuffle_bytes" -> dbytes, "bucketed_sec" -> bsec,
              "bucketed_shuffle_bytes" -> bbytes, "compact_sec" -> csec,
              "kept" -> dkept)
          }
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      if (probes("hinsert")) {
        // layered-insert cost contract: marginal insert work ∝ batch,
        // vs the full layered rebuild as the yardstick
        val (fsec, _) = time(operators.Ann.hnswGraph(spark, dir).count())
        Graft.releaseCaches()
        val nTot = Graft.tableRows(spark, dir, "embeddings")
        val split = nTot * operators.Ann.InsertSplitNum / operators.Ann.InsertSplitDen
        val (ssec, _) = time(operators.Ann.hnswStoredGraph(spark, dir, split, 4, 3).count())
        val (isec, n) = time(operators.Ann.hnswGraphInsert(spark, dir).count())
        emit("probe" -> "ann_hnsw_insert", "scale" -> s"${mult}x", "rebuild_sec" -> fsec,
          "stored_build_sec" -> ssec, "insert_marginal_sec" -> isec, "edges" -> n)
      }
      if (probes("ginsert")) {
        val (fsec, _) = time(operators.Ann.nswGraph(spark, dir).count()) // full-rebuild yardstick
        Graft.releaseCaches()
        val nTot = Graft.tableRows(spark, dir, "embeddings")
        val split = nTot * operators.Ann.InsertSplitNum / operators.Ann.InsertSplitDen
        val (ssec, _) = time(operators.Ann.nswStoredGraph(spark, dir, split, 4, 3).count())
        val (isec, n) = time(operators.Ann.nswGraphInsert(spark, dir).count())
        emit("probe" -> "ann_graph_insert", "scale" -> s"${mult}x", "rebuild_sec" -> fsec,
          "stored_build_sec" -> ssec, "insert_marginal_sec" -> isec, "edges" -> n)
      }
      Graft.releaseCaches()
    }
    out.close()
    spark.stop()
  }
}
