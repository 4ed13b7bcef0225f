package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EXACT-DEDUP — the continuous-ingestion face of the dedup
  * family: documents arrive on a stream and each microbatch keeps only
  * its first-seen texts, measured against everything any EARLIER batch
  * kept. This is the pass a training pipeline runs at the ingest edge
  * (crawl snapshots, log drops) so downstream storage and the heavier
  * near-dup passes never see the exact-duplicate mass at all.
  *
  * Same hash, same canonical rule as the keyed batch operator
  * ([[graft.operators.Dedup.exact]]: sha2-256 of the text, smallest
  * doc_id wins within a batch), so the streamed survivors compose with
  * every batch-side audit query.
  *
  * State is the [[GenFs]] versioned-generation protocol — NOT
  * `mapGroupsWithState`: the seen-fingerprint set at 100 TB is itself
  * multi-TB, and state-store checkpoints would rewrite it per batch,
  * while the generation chain appends ONE delta dir per batch (work and
  * bytes ∝ the batch's novel mass) and compacts/GCs on the same
  * schedule as the index streams. Layout under `genRoot`:
  *
  *  - `gen=0/fingerprints`: the seed full checkpoint (the deployment's
  *    backfill; an empty frame for a fresh root) — `gen=0/kept` (may be
  *    empty) commits the seed;
  *  - `gen=<b+1>/kept`: microbatch b's surviving (doc_id, fp) rows,
  *    written LAST = the generation's commit marker;
  *  - `gen=<b+1>/newfingerprints`: the same batch's novel fingerprints,
  *    the chain delta future batches dedup against.
  *
  * Exactly-once by idempotence, hole-tolerant, `_SUCCESS`-gated — the
  * index streams' contract verbatim, inherited from the shared core.
  * Per microbatch the stored side is a fingerprint-keyed hash anti
  * join: the seen set never visits the driver and never rewrites.
  */
object DedupStreams {

  /** Resolve the seen-fingerprint set at generation `g`. */
  private[graft] def fingerprintsThrough(s: SparkSession, root: String, g: Long): DataFrame =
    GenFs.chainThrough(s, root, g, "fingerprints", "newfingerprints")

  /** Compact the fingerprint chain into a full checkpoint at `g`. */
  def compactFingerprintsAt(s: SparkSession, root: String, g: Long): Unit =
    GenFs.compactAt(s, root, g, "fingerprints", "newfingerprints")

  /** Generation GC for the exact-dedup root (keep >= 2 — see [[GenFs.prune]]). */
  def pruneGenerations(s: SparkSession, root: String, keep: Int = 2): Long =
    GenFs.prune(s, root, keep, "kept", "fingerprints", "newfingerprints")

  /** Generation GC for the near-dup root: compacts the signature chain. */
  def pruneNearGenerations(s: SparkSession, root: String, keep: Int = 2): Long =
    GenFs.prune(s, root, keep, "kept", "sigs", "newsigs")

  /** Materialize the near-dup chain's PROBE INDEX at generation `g` as
    * two bucketed tables (IndexBuilder.compact's bucketBy-with-path
    * layout): the band index bucketed by `band_hash` and the signature
    * table bucketed by `doc_id` — the layout the batch probe joins
    * cluster on, so past ~10^7 stored sigs the per-batch cost drops to
    * the bucketed SCAN plus work ∝ the batch (the stored side never
    * re-shuffles; only the batch's own band/candidate rows move).
    * Returns (sigs table, bands table) for
    * [[nearDedupBatchWithBands]]; a maintenance job refreshes it on the
    * compaction schedule (bucket counts sized so one bucket ≈ one
    * executor-task's worth of the design-scale index).
    */
  def compactProbeIndexAt(s: SparkSession, root: String, g: Long,
                          buckets: Int = 32): (DataFrame, DataFrame) = {
    // VERSIONED catalog names (root-hash + generation): a fixed name
    // would be dropped/recreated on every refresh, invalidating the
    // table handles a prior call returned (a maintenance-job refresh
    // racing an in-flight probe) and preventing two roots or two
    // generations from coexisting in one session. Stale generations of
    // THIS root are dropped only AFTER the new pair is published.
    val tag = java.lang.Integer.toHexString(root.hashCode)
    val sigsName = s"graft_nd_sigs_${tag}_g$g"
    val bandsName = s"graft_nd_bands_${tag}_g$g"
    val sigs = GenFs.chainThrough(s, root, g, "sigs", "newsigs")
    s.sql(s"DROP TABLE IF EXISTS $sigsName")
    sigs.write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$root/gen=$g/sigindex")
      .saveAsTable(sigsName)
    s.sql(s"DROP TABLE IF EXISTS $bandsName")
    bandsOf(sigs).write.mode("overwrite")
      .bucketBy(buckets, "band_hash").sortBy("band_hash")
      .option("path", s"$root/gen=$g/bandindex")
      .saveAsTable(bandsName)
    // retire older generations of this root now that the swap is live
    s.catalog.listTables().collect().map(_.name)
      .filter(n => (n.startsWith(s"graft_nd_sigs_${tag}_g") ||
        n.startsWith(s"graft_nd_bands_${tag}_g")) &&
        n != sigsName && n != bandsName)
      .foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
    (s.table(sigsName), s.table(bandsName))
  }

  /** Start the streaming dedup: `docStream` is a streaming frame with
    * (doc_id, text). Each microbatch b writes generation b+1 with its
    * survivors and their fingerprints.
    */
  def maintainExactDedup(docStream: DataFrame, genRoot: String,
                         checkpoint: String): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          // same hole-tolerant pick as the index streams: fold against
          // the latest COMMITTED generation at or below this batch id
          val stored = GenFs.latestGenAtMost(s, genRoot, batchId, "kept")
          val seen = fingerprintsThrough(s, genRoot, stored).select(col("fp"))
          // within-batch canonical first (smallest doc_id per text),
          // then the cross-generation anti join against the seen set.
          // kept is persisted across the two sink writes so the chain
          // scan + anti join (multi-TB stored side at design scale) run
          // ONCE per batch, and unpersisted before the sink returns —
          // a long-running stream never relies on GC to reclaim storage
          val kept = batch
            .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
            .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
            .join(seen, Seq("fp"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            kept.select(col("fp"))
              .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newfingerprints")
            // kept commits the generation (written LAST)
            kept.select(col("doc_id"), col("fp"))
              .write.mode("overwrite").parquet(s"$genRoot/gen=$target/kept")
          } finally kept.unpersist()
        }
        ()
      }
      .start()

  /** MinHash signatures of a (doc_id, text) frame — the exact kernels
    * and layout of the keyed batch family (word 3-gram shingles →
    * 12-component minhash; Dedup.withShingles/minhashBands).
    */
  private def sigsOf(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"),
      call_function("minhash_sigs",
        call_function("word_ngrams", col("text"), lit(3))).as("sigs"))

  /** LSH bands (4 bands × 3 rows) from a sigs frame; the shingle-less
    * sentinel signature is filtered so empty docs never bucket together
    * — same rule as the batch `minhashBands`.
    */
  private def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, 3),
          | b -> concat(cast(element_at(sigs, 3*b + 1) as string), '|',
          |             cast(element_at(sigs, 3*b + 2) as string), '|',
          |             cast(element_at(sigs, 3*b + 3) as string)))""".stripMargin))
        .as(Seq("band_id", "band_hash")))
      .filter(col("band_hash") =!= "1000000007|1000000007|1000000007")

  private val estAgree =
    expr("""aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),
           | cast(0 as bigint), (acc, v) -> acc + v) * 1000000 div 12""".stripMargin)

  /** One near-dedup microbatch against the stored signature state: LSH
    * band probe for candidates, 12-component signature-agreement
    * verification at `tauMicros`, greedy within-batch rule (a doc drops
    * when ANY smaller-id batch doc verifies against it — deterministic,
    * order-free) plus the cross-batch drop against stored survivors.
    * Returns (kept (doc_id, sigs) rows, the PERSISTED per-batch sigs
    * frame) — the caller MUST unpersist the sigs handle after its
    * terminal action on kept, so neither the stream sink nor a probe
    * loop leaks a cached dataset per batch. Factored out of the sink so
    * the spec drives the identical computation sequentially.
    */
  private[graft] def nearDedupBatch(batch: DataFrame, storedSigs: DataFrame,
                                    tauMicros: Long): (DataFrame, DataFrame) =
    // stored bands derive from the stored sigs by a cheap projection
    // (12 longs per doc — no kernel re-run); past ~10^7 stored sigs a
    // deployment persists the BUCKETED band/sig index instead
    // ([[compactProbeIndexAt]]) so the probe joins co-locate
    nearDedupBatchWithBands(batch, storedSigs, bandsOf(storedSigs), tauMicros)

  /** [[nearDedupBatch]] with an externally-supplied stored band index —
    * the route for a band_hash-BUCKETED stored layout: the bucketed
    * scan satisfies the probe join's clustering (band_hash is a subset
    * of the (band_id, band_hash) join key), so the multi-TB stored side
    * never re-shuffles; only the batch's own band rows move.
    */
  private[graft] def nearDedupBatchWithBands(batch: DataFrame, storedSigs: DataFrame,
                                             storedBands: DataFrame,
                                             tauMicros: Long): (DataFrame, DataFrame) = {
    val sigs = sigsOf(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = bandsOf(sigs)
    val withinDrop = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("lo"), col("b.doc_id").as("hi")).distinct()
      .join(sigs.select(col("doc_id").as("lo"), col("sigs").as("sa")), "lo")
      .join(sigs.select(col("doc_id").as("hi"), col("sigs").as("sb")), "hi")
      .filter(estAgree >= lit(tauMicros))
      .select(col("hi").as("doc_id")).distinct()
    val crossDrop = bands
      .join(storedBands
          .select(col("band_id").as("ob"), col("band_hash").as("oh"),
            col("doc_id").as("old_id")),
        col("band_id") === col("ob") && col("band_hash") === col("oh"))
      .select(col("doc_id").as("new_id"), col("old_id")).distinct()
      .join(sigs.select(col("doc_id").as("new_id"), col("sigs").as("sa")), "new_id")
      .join(storedSigs.select(col("doc_id").as("old_id"), col("sigs").as("sb"))
        .hint("SHUFFLE_HASH"), "old_id")
      .filter(estAgree >= lit(tauMicros))
      .select(col("new_id").as("doc_id")).distinct()
    (sigs.join(withinDrop, Seq("doc_id"), "left_anti")
      .join(crossDrop, Seq("doc_id"), "left_anti"), sigs)
  }

  /** Streaming NEAR-dup dedup — the second dedup tier on the stream:
    * exact dedup ([[maintainExactDedup]]) kills byte-identical copies;
    * this kills near-copies (boilerplate re-hosts, trivial edits) via
    * the keyed batch family's exact machinery — word-3-gram MinHash,
    * 4×3 LSH band probe for candidates, 12-component
    * signature-agreement verification at `tauMicros` (default 0.5, the
    * `dedup_incremental` rule). State = the (doc_id, sigs) chain under
    * the same [[GenFs]] contract (`sigs` full checkpoint + `newsigs`
    * deltas, `kept` commits); per batch the stored side costs one sigs
    * scan + band-keyed hash joins — candidate work ∝ the NEW batch's
    * band collisions, never a corpus self-join.
    */
  def maintainNearDedup(docStream: DataFrame, genRoot: String, checkpoint: String,
                        tauMicros: Long = 500000L): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          val stored = GenFs.latestGenAtMost(s, genRoot, batchId, "kept")
          val storedSigs = GenFs.chainThrough(s, genRoot, stored, "sigs", "newsigs")
          // persist kept across the two writes (the first materializes
          // it) so the band joins against the stored chain run once per
          // batch; unpersist BOTH caches before the sink returns
          val (keptLazy, sigs) = nearDedupBatch(batch, storedSigs, tauMicros)
          val kept = keptLazy
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            kept.select(col("doc_id"), col("sigs"))
              .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newsigs")
            kept.select(col("doc_id"))
              .write.mode("overwrite").parquet(s"$genRoot/gen=$target/kept")
          } finally { sigs.unpersist(); kept.unpersist() }
        }
        ()
      }
      .start()

  /** DISTINCT k-gram census of an eval/benchmark frame — the content of
    * the decontamination tier's stored generations: one row per
    * contaminating gram (`gid`), exactly the gram identity
    * [[graft.operators.Dedup.decontaminateAgainst]]'s single-scan core
    * windows on (lowercased whitespace tokens, k-token joins).
    */
  private[graft] def evalGramsOf(evalDocs: DataFrame, k: Int): DataFrame =
    evalDocs.select(expr("split(lower(text), '\\\\s+')").as("toks"))
      .filter(expr(s"size(toks) >= $k"))
      .select(explode(expr(s"transform(sequence(1, size(toks) - ${k - 1}), j -> " +
        s"array_join(slice(toks, j, $k), ' '))")).as("gid"))
      .distinct()

  /** Benchmark-release job: append a new eval suite's gram census as a
    * `newevalgrams` delta at generation `gen`. Convention: append at
    * `currentGen(root, "account")` — visible to every batch from the
    * next one onward (batch b chains through generation b, and the head
    * account generation is head-batch+1), while a checkpoint REPLAY of
    * any already-committed batch still resolves the chain it originally
    * saw. The stream itself never writes eval grams, only accounts.
    */
  def appendEvalSuite(s: SparkSession, root: String, gen: Long,
                      evalDocs: DataFrame, k: Int = 13): Unit = {
    // two suites can land at the same head generation: UNION with an
    // already-committed delta instead of silently discarding it (the
    // mode("overwrite") alone would quietly weaken decontamination).
    // The union is materialized into executor blocks BEFORE the
    // overwrite so the write never reads the directory it replaces.
    val path = s"$root/gen=$gen/newevalgrams"
    val fresh = evalGramsOf(evalDocs, k)
    val committed = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = committed.getFileSystem(s.sparkContext.hadoopConfiguration)
    val grams =
      if (fs.exists(committed))
        fresh.unionByName(s.read.parquet(path)).distinct().localCheckpoint(true)
      else fresh
    grams.write.mode("overwrite").parquet(path)
  }

  /** One decontamination microbatch against the stored eval-gram chain:
    * the batch's 13-gram positions left-join the DISTINCT stored gram
    * set (distinct on the probe side: two suites may share a gram, and
    * a duplicated gid would multiply join rows and inflate n_grams),
    * then the per-doc account — (doc_id, n_grams, n_contaminated,
    * contaminated), the exact output contract of the batch operator
    * [[graft.operators.Dedup.decontaminateAgainst]] (a gram position is
    * contaminated iff its gid occurs in the eval census; sub-k-token
    * docs drop out on both paths). Factored out of the sink so the spec
    * drives the identical computation sequentially.
    */
  private[graft] def decontamBatch(batch: DataFrame, storedGrams: DataFrame,
                                   k: Int): DataFrame = {
    val grams = batch
      .select(col("doc_id"), expr("split(lower(text), '\\\\s+')").as("toks"))
      .filter(expr(s"size(toks) >= $k"))
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${k - 1}), j -> " +
          s"array_join(slice(toks, j, $k), ' '))")).as("gid"))
    grams
      .join(storedGrams.select(col("gid")).distinct()
        .select(col("gid"), lit(1L).as("hit")).hint("SHUFFLE_HASH"),
        Seq("gid"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated") > 0).cast("long").as("contaminated"))
  }

  /** Streaming DECONTAMINATION — the third dedup tier at the ingest
    * edge (exact copies → near copies → benchmark leakage): training
    * documents arrive on the stream and each microbatch is accounted
    * against the stored eval-gram generation chain — `gen=0/evalgrams`
    * seeds the benchmark census, [[appendEvalSuite]] lands new suites
    * as `newevalgrams` deltas, and generation b+1's `account` dir (the
    * commit marker) holds batch b's per-doc contamination account.
    * Unlike the other two tiers the stream APPENDS no state of its own:
    * the eval census evolves only by admin appends, so per-batch work is
    * the batch's gram explode + one gid-keyed hash probe of the chain
    * (∝ batch + one stored scan, never a pair join) — a deployment
    * bucket-partitions the stored grams by gid so the probe co-locates
    * (IndexBuilder.compact). Exactly-once by idempotence, hole-tolerant,
    * `_SUCCESS`-gated — the shared [[GenFs]] contract.
    */
  def maintainDecontam(docStream: DataFrame, genRoot: String, checkpoint: String,
                       k: Int = 13): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          val stored = GenFs.latestGenAtMost(s, genRoot, batchId, "account")
          val grams = GenFs.chainThrough(s, genRoot, stored, "evalgrams", "newevalgrams")
          decontamBatch(batch, grams, k)
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/account")
        }
        ()
      }
      .start()

  /** Generation GC for the decontam root: compacts the eval-gram chain. */
  def pruneDecontamGenerations(s: SparkSession, root: String, keep: Int = 2): Long =
    GenFs.prune(s, root, keep, "account", "evalgrams", "newevalgrams")

  /** All surviving documents through generation `g` WITHIN THE
    * RETAINED WINDOW — a plain union of immutable committed `kept` dirs
    * (survivors are never revoked, no join). Contract note: `kept` is
    * the stream's OUTPUT, which a downstream consumer drains forward;
    * [[pruneGenerations]] deletes generations below the compacted base,
    * so pruned batches' kept rows are gone FROM THIS ROOT by design
    * (they live wherever downstream landed them). The dedup DECISION
    * state — the fingerprint chain — is what compaction preserves
    * forever: post-prune batches still dedup against every fingerprint
    * any pruned generation contributed.
    */
  def keptThrough(s: SparkSession, root: String, g: Long): DataFrame = {
    val fs = GenFs.fsOf(s, root)
    val paths = (0L to g).map(i => s"$root/gen=$i/kept")
      .filter(p => GenFs.committed(fs, p))
    require(paths.nonEmpty, s"DedupStreams: no committed kept dirs <= gen $g under $root")
    paths.map(s.read.parquet(_)).reduce(_.unionByName(_))
  }
}
