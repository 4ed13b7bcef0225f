package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.{DedupStreams, IndexStreams}

/** Streaming exact-dedup over versioned fingerprint generations: the
  * ingest-edge pass that keeps only first-seen texts across
  * microbatches. House batch-parity proof: the streamed survivor set
  * must equal the batch exact-dedup over the union corpus (duplicate
  * ids constructed so first-arrival copies carry the smaller id, making
  * the two canonical rules coincide). Scheme-qualified roots throughout
  * (the GenFs core resolves file:/hdfs:/s3a: alike).
  */
class DedupStreamsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def schemedTemp(prefix: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(prefix).toString

  /** Batch twin: sha2 exact dedup (min doc_id per text) over a corpus. */
  private def exactTwin(docs: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    docs.select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def seedEmpty(root: String): Unit = {
    import spark.implicits._
    Seq.empty[String].toDF("fp")
      .write.parquet(s"$root/gen=0/fingerprints")
    Seq.empty[(Long, String)].toDF("doc_id", "fp")
      .write.parquet(s"$root/gen=0/kept")
  }

  test("streamed survivors equal the batch exact-dedup over the union corpus") {
    val root = schemedTemp("graft-dds")
    val inDir = java.nio.file.Files.createTempDirectory("graft-ddsin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ddsck").toString
    seedEmpty(root)
    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text"))
    val n = d.count()
    val cut = n / 2
    val b1 = d.filter(col("doc_id") < cut)
    // batch 2: fresh docs + CROSS-BATCH dups (batch-1 texts under new,
    // LARGER ids) + a WITHIN-BATCH dup pair (two new ids, same text)
    val crossDups = b1.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val withinDup = d.filter(col("doc_id") === cut)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val b2 = d.filter(col("doc_id") >= cut).unionByName(crossDups).unionByName(withinDup)

    val q = DedupStreams.maintainExactDedup(
      IndexStreams.fromParquetDir(spark, inDir, d), root, ckpt)
    try {
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"dedup stream failed: ${q.exception}")
    } finally q.stop()

    // generation 1 = batch-1 survivors; generation 2 = batch-2 novel
    val kept1 = spark.read.parquet(s"$root/gen=1/kept")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"))).toSet
    assert(kept1 === exactTwin(b1), "generation 1 diverged from its batch twin")
    val streamed = DedupStreams.keptThrough(spark, root, 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"))).toSet
    // first-arrival ids are smaller by construction, so the streamed
    // survivors equal the global batch dedup of the union corpus
    assert(streamed === exactTwin(b1.unionByName(b2)),
      "streamed survivor set diverged from the batch exact-dedup twin")
    // every cross-batch and within-batch duplicate was dropped
    val dupIds = streamed.map(_._1).filter(_ >= 100000L)
    assert(dupIds.isEmpty, s"duplicate copies survived: $dupIds")
    info(s"${streamed.size} survivors across 2 generations equal the batch twin " +
      s"(${crossDups.count()} cross-batch + 1 within-batch dups dropped)")
  }

  test("streaming near-dup: LSH-candidate verified drops match the sequential twin") {
    // the second streaming dedup tier: exact copies AND near-copies
    // (trivial edits) drop across batches. Plumbing parity: each
    // streamed generation must equal the direct sequential
    // nearDedupBatch call over the same stored state; behaviorally,
    // exact copies always verify at est=1.0 and fresh disjoint-vocab
    // docs never do.
    val root = "file:" + java.nio.file.Files.createTempDirectory("graft-ndds").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-nddsin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nddsck").toString
    import spark.implicits._
    Seq.empty[(Long, Seq[Long])].toDF("doc_id", "sigs")
      .write.parquet(s"$root/gen=0/sigs")
    Seq.empty[Tuple1[Long]].toDF("doc_id").write.parquet(s"$root/gen=0/kept")

    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text"))
    val n = d.count()
    val cut = n / 2
    val b1 = d.filter(col("doc_id") < cut)
    // batch 2: fresh docs + EXACT cross-batch copies + a NEAR copy
    // (first 8 words of a batch-1 doc appended with one novel token —
    // high but not full shingle overlap) + an exact within-batch pair
    val exactCross = b1.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val withinPair = d.filter(col("doc_id") === cut)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val b2 = d.filter(col("doc_id") >= cut).unionByName(exactCross).unionByName(withinPair)

    val q = DedupStreams.maintainNearDedup(
      IndexStreams.fromParquetDir(spark, inDir, d), root, ckpt)
    try {
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"near-dup stream failed: ${q.exception}")
    } finally q.stop()

    def keptIds(g: Long): Set[Long] =
      spark.read.parquet(s"$root/gen=$g/kept").collect().map(_.getLong(0)).toSet
    // sequential twin over the same evolving state
    val empty0 = spark.read.parquet(s"$root/gen=0/sigs")
    val (twin1, sig1) = DedupStreams.nearDedupBatch(b1, empty0, 500000L)
    assert(keptIds(1) === twin1.select("doc_id").collect().map(_.getLong(0)).toSet,
      "generation 1 diverged from the sequential twin")
    val (twin2, sig2) = DedupStreams.nearDedupBatch(b2,
      empty0.unionByName(twin1.select(col("doc_id"), col("sigs"))), 500000L)
    val kept2 = keptIds(2)
    assert(kept2 === twin2.select("doc_id").collect().map(_.getLong(0)).toSet,
      "generation 2 diverged from the sequential twin")
    sig1.unpersist(); sig2.unpersist()
    // exact copies verify at est = 1.0 and must be gone; the
    // within-batch pair keeps only its smaller id
    assert(!kept2.exists(_ >= 200000L), "within-batch exact copy survived")
    assert(!kept2.exists(id => id >= 100000L && id < 200000L),
      "cross-batch exact copy survived")
    assert(kept2.contains(cut), "the smaller id of the within-batch pair must survive")
    info(s"2 streamed near-dup generations equal their sequential twins " +
      s"(${keptIds(1).size} + ${kept2.size} survivors)")
  }

  test("bucketed probe index: nearDedupBatchWithBands equals the derive route") {
    // the >=10^7-stored-sigs layout: band index bucketed by band_hash +
    // sig table bucketed by doc_id (compactProbeIndexAt). The bucketed
    // probe must drop exactly what the per-batch derive route drops.
    import spark.implicits._
    val root = schemedTemp("graft-ndbkt")
    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text"))
    val cut = d.count() / 2
    val b1 = d.filter(col("doc_id") < cut)
    // batch 2 carries fresh docs + exact copies of stored batch-1 docs
    val b2 = d.filter(col("doc_id") >= cut)
      .unionByName(b1.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    // seed chain: batch-1 survivors' sigs as the gen-0 full checkpoint
    val empty = Seq.empty[(Long, Seq[Long])].toDF("doc_id", "sigs")
    val (k1, s1) = DedupStreams.nearDedupBatch(b1, empty, 500000L)
    k1.select(col("doc_id"), col("sigs")).write.parquet(s"$root/gen=0/sigs")
    s1.unpersist()
    Seq.empty[Tuple1[Long]].toDF("doc_id").write.parquet(s"$root/gen=0/kept")

    val stored = spark.read.parquet(s"$root/gen=0/sigs")
    val (kd, sd) = DedupStreams.nearDedupBatch(b2, stored, 500000L)
    val derive = kd.select("doc_id").collect().map(_.getLong(0)).toSet
    sd.unpersist()
    val (sigsT, bandsT) = DedupStreams.compactProbeIndexAt(spark, root, 0L, buckets = 4)
    val (kb, sb) = DedupStreams.nearDedupBatchWithBands(b2, sigsT, bandsT, 500000L)
    val bucketed = kb.select("doc_id").collect().map(_.getLong(0)).toSet
    sb.unpersist()
    assert(bucketed === derive, "bucketed probe diverged from the derive route")
    assert(derive.nonEmpty)
    assert(!bucketed.exists(_ >= 100000L), "cross-batch exact copies must drop on the bucketed route")
    info(s"${bucketed.size} survivors on both routes")
  }

  test("probe-index refresh keeps prior handles live; two suites at one generation union") {
    import spark.implicits._
    // versioned catalog names: a second compaction (the maintenance-job
    // refresh) must not invalidate the table handles a prior call
    // returned, and a second ROOT must coexist in the same session
    val root = schemedTemp("graft-ndver")
    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text")).limit(40)
    val empty = Seq.empty[(Long, Seq[Long])].toDF("doc_id", "sigs")
    val (k1, s1) = DedupStreams.nearDedupBatch(d, empty, 500000L)
    k1.select(col("doc_id"), col("sigs")).write.parquet(s"$root/gen=0/sigs")
    s1.unpersist()
    Seq.empty[Tuple1[Long]].toDF("doc_id").write.parquet(s"$root/gen=0/kept")
    val (sigs0, bands0) = DedupStreams.compactProbeIndexAt(spark, root, 0L, buckets = 2)
    val n0 = sigs0.count()
    // a later generation of the SAME root refreshes under a NEW name
    k1.select(col("doc_id"), col("sigs")).limit(5)
      .write.parquet(s"$root/gen=1/newsigs")
    Seq.empty[Tuple1[Long]].toDF("doc_id").write.parquet(s"$root/gen=1/kept")
    val (sigs1, bands1) = DedupStreams.compactProbeIndexAt(spark, root, 1L, buckets = 2)
    assert(sigs1.count() >= n0 && bands1.count() >= bands0.count())
    // a second root coexists (distinct root-hash tag)
    val root2 = schemedTemp("graft-ndver2")
    k1.select(col("doc_id"), col("sigs")).write.parquet(s"$root2/gen=0/sigs")
    Seq.empty[Tuple1[Long]].toDF("doc_id").write.parquet(s"$root2/gen=0/kept")
    val (sigsB, _) = DedupStreams.compactProbeIndexAt(spark, root2, 0L, buckets = 2)
    assert(sigsB.count() === n0)
    assert(sigs1.count() > 0, "refreshed handle must stay readable")

    // appendEvalSuite twice at ONE generation: the second suite must
    // union with the first, not overwrite it
    val evroot = schemedTemp("graft-evapp")
    val s13a = "alpha " + (1 to 12).map(i => s"wa$i").mkString(" ")
    val s13b = "bravo " + (1 to 12).map(i => s"wb$i").mkString(" ")
    DedupStreams.appendEvalSuite(spark,
      evroot, 0L, Seq((1L, s13a)).toDF("doc_id", "text"))
    DedupStreams.appendEvalSuite(spark,
      evroot, 0L, Seq((2L, s13b)).toDF("doc_id", "text"))
    val gids = spark.read.parquet(s"$evroot/gen=0/newevalgrams")
      .collect().map(_.getString(0)).toSet
    assert(gids === Set(s13a.toLowerCase, s13b.toLowerCase),
      s"both suites' grams must survive a same-generation double append, got $gids")
  }

  test("streaming decontamination accounts equal the batch operator; late eval suites take effect") {
    // the third ingest-edge tier: per-batch contamination accounts
    // against the stored eval-gram chain. Parity: every generation's
    // account equals the batch decontaminateAgainst over that batch,
    // and the per-doc accounts compose (union of generations = the
    // batch account of the union corpus); a suite appended at the head
    // generation is visible from the next batch onward.
    import spark.implicits._
    val root = schemedTemp("graft-dcds")
    val inDir = java.nio.file.Files.createTempDirectory("graft-dcdsin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dcdsck").toString
    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text"))
    val eval1 = d.filter(col("doc_id") % 50 === 0)
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val cut = d.count() / 2
    val b1 = train.filter(col("doc_id") < cut)
    val b2 = train.filter(col("doc_id") >= cut)
    // suite 2 is a synthetic 13-gram; batch 3 has one doc leaking it
    // mid-document and one clean doc
    val leak = (0 until 13).map(i => s"z$i").mkString(" ")
    val eval2 = Seq((900000L, leak)).toDF("doc_id", "text")
    val b3 = Seq(
      (800001L, s"lead0 lead1 $leak tail0"),
      (800002L, (0 until 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")

    // seed: suite-1 census + the empty account that commits gen 0
    DedupStreams.evalGramsOf(eval1, 13).write.parquet(s"$root/gen=0/evalgrams")
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("doc_id", "n_grams", "n_contaminated", "contaminated")
      .write.parquet(s"$root/gen=0/account")

    def account(g: Long): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(s"$root/gen=$g/account").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def twin(t: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      Dedup.decontaminateAgainst(t, e).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val q = DedupStreams.maintainDecontam(
      IndexStreams.fromParquetDir(spark, inDir, d), root, ckpt)
    try {
      b1.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      // suite 2 publishes at the head generation -> next batch sees it
      DedupStreams.appendEvalSuite(spark, root, 2L, eval2)
      b3.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"decontam stream failed: ${q.exception}")
    } finally q.stop()

    assert(account(1L) === twin(b1, eval1), "generation 1 diverged from the batch twin")
    assert(account(2L) === twin(b2, eval1), "generation 2 diverged from the batch twin")
    // per-doc accounts compose: generations union = the union-corpus account
    assert(account(1L) ++ account(2L) === twin(b1.unionByName(b2), eval1),
      "streamed accounts do not compose to the union-corpus batch account")
    // the late suite is live for batch 3: its leak doc is flagged with
    // exactly one contaminated position, the clean doc with none
    val g3 = account(3L)
    assert(g3 === twin(b3, eval1.unionByName(eval2)),
      "generation 3 diverged from the two-suite batch twin")
    assert(g3.contains((800001L, 4L, 1L, 1L)), s"leak doc mis-accounted: $g3")
    assert(g3.contains((800002L, 8L, 0L, 0L)), s"clean doc mis-accounted: $g3")
    info(s"3 streamed decontam generations equal their batch twins " +
      s"(${account(1L).size}+${account(2L).size}+${g3.size} accounts)")
  }

  test("pruning keeps the dedup decision state: post-prune batches still dedup") {
    val root = schemedTemp("graft-ddsp")
    seedEmpty(root)
    val d = Graft.documents(spark, dir).select(col("doc_id"), col("text"))
    val n = d.count()
    val (c1, c2) = (n * 2 / 5, n * 4 / 5)
    // two sequential generations written directly (the foreachBatch
    // body's exact writes), then prune, then a third fold
    def writeGen(g: Long, batch: org.apache.spark.sql.DataFrame): Unit = {
      val stored = g - 1
      val seen = DedupStreams.fingerprintsThrough(spark, root, stored).select(col("fp"))
      val kept = batch.select(col("doc_id"), sha2(col("text"), 256).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .join(seen, Seq("fp"), "left_anti")
      kept.select(col("fp")).write.parquet(s"$root/gen=$g/newfingerprints")
      kept.select(col("doc_id"), col("fp")).write.parquet(s"$root/gen=$g/kept")
    }
    writeGen(1L, d.filter(col("doc_id") < c1))
    writeGen(2L, d.filter(col("doc_id") >= c1 && col("doc_id") < c2))
    val seenBefore = DedupStreams.fingerprintsThrough(spark, root, 2L)
      .collect().map(_.getString(0)).toSet

    val base = DedupStreams.pruneGenerations(spark, root, keep = 2)
    assert(base === 1L)
    assert(!new java.io.File(root.stripPrefix("file:") + "/gen=0").exists())
    // the fingerprint chain survives compaction intact
    val seenAfter = DedupStreams.fingerprintsThrough(spark, root, 2L)
      .collect().map(_.getString(0)).toSet
    assert(seenAfter === seenBefore, "pruning changed the seen-fingerprint set")

    // a post-prune batch re-sending ALL earlier texts + genuinely new
    // ones keeps only the new ones
    val replay = d.filter(col("doc_id") < c2)
      .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
    val fresh = d.filter(col("doc_id") >= c2)
    writeGen(3L, replay.unionByName(fresh))
    val kept3 = spark.read.parquet(s"$root/gen=3/kept")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"))).toSet
    assert(kept3 === exactTwin(fresh),
      "post-prune generation re-admitted texts the pruned generations had seen")
    info(s"prune to base $base kept ${seenAfter.size} fingerprints; " +
      s"post-prune fold admitted only the ${kept3.size} novel texts")
  }
}
