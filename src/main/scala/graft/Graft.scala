package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table plumbing shared by SparkEntry / Verify / Bench / tests.
  *
  * Scale notes: all configs here are cluster-safe — nothing pins partition
  * counts inside operators; AQE re-plans at runtime. `local[32]` is only the
  * test harness.
  */
object Graft {

  /** Apply graft-wide configs to any builder (Verify/Bench own their master). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // runtime skew mitigation: a hot join key (one viral doc's dup
    // cluster, one hot fingerprint bucket) gets its oversized partitions
    // split at runtime instead of stalling a straggler task — the safety
    // net under every self-join in the dedup family at 100 TB
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // the generated-class cache defaults to 100 entries, but one cold
    // ANN graph build compiles 129-182 distinct classes (JobProbe r20:
    // 1.2-2.0s of Janino time per build) — sequential LRU access with
    // more classes than entries evicts everything, so a REPEAT of the
    // same plan recompiles from scratch. 2000 entries keeps every
    // plan's classes live for the lifetime of a bench/serving JVM at a
    // bounded metaspace cost (classes are a few KB each); the knob is
    // per-JVM and scale-independent (driver and executors both compile)
    .config("spark.sql.codegen.cache.maxEntries", "2000")
    // some testdata generations write events.ts as parquet TIMESTAMP(NANOS):
    // read those as long nanos (this Spark build has no native nanos type);
    // newer generations write timestamp[us], normalized in events() below.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamps in testdata are naive (isAdjustedToUTC=false); read them as
    // plain TIMESTAMP under the UTC session so literals compare directly and
    // filters still push down to the scan.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  def session(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One parquet table from a scale-factor dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Memoized table row count — the size estimate behind adaptive
    * route choices (e.g. dedup_embedding's exact-vs-LSH pick). Parquet
    * makes this a footer-metadata aggregate, and the memo ensures one
    * such job per (dir, table) per session instead of one per
    * DataFrame construction.
    *
    * IMMUTABLE-CORPUS assumption: data dirs are read-only snapshots, so
    * a memoized count never goes stale within a session; a pipeline
    * that rewrites a table in place must use a new dir (the sf-dir
    * key). The count job runs OUTSIDE the registry lock — it is a
    * distributed job that can take seconds at scale, and holding the
    * lock would serialize every other registry user (memoCache,
    * trackCaches) behind it; two racing threads may both count, but
    * they write the identical value.
    */
  private val rowCounts = scala.collection.mutable.Map.empty[(String, String), Long]
  def tableRows(spark: SparkSession, sfDir: String, name: String): Long = {
    val key = (sfDir, name)
    synchronized(rowCounts.get(key)).getOrElse {
      val n = table(spark, sfDir, name).count()
      synchronized(rowCounts.getOrElseUpdate(key, n))
    }
  }

  /** Per-operator cache lifecycle. Iterative operators (pagerank) persist
    * intermediate frames that every iteration re-references; those caches
    * must outlive the returned (lazy) DataFrame, so the operator cannot
    * unpersist them itself without eagerly materializing its result.
    * Instead it registers them here: registering under the same key
    * unpersists the PREVIOUS generation, so at most one generation per
    * operator is ever cached in a session. Unpersisting is always
    * correctness-safe (Spark recomputes from lineage); a caller that holds
    * a result across a LATER invocation of the same operator only loses
    * the cache speedup.
    */
  private val trackedCaches = scala.collection.mutable.Map.empty[String, Seq[DataFrame]]
  private val memoScopes = scala.collection.mutable.Map.empty[String, (String, DataFrame)]

  def trackCaches(key: String, frames: DataFrame*): Unit = synchronized {
    trackedCaches.remove(key).foreach(_.foreach(_.unpersist(false)))
    trackedCaches(key) = frames
  }

  /** Memoized tracked cache: operators that share an expensive subtree
    * (the near-dup pair graph feeds pagerank, triangles AND clustering)
    * register it here under one key, so a session running several of
    * them persists and computes it ONCE. `scope` is the data directory:
    * a call with the same (key, scope) returns the already-persisted
    * frame; a different scope replaces the generation (the registry
    * unpersists the old one), so at most one copy per key is ever
    * cached. Unpersisting stays correctness-safe — lineage recomputes.
    */
  def memoCache(key: String, scope: String)(build: => DataFrame): DataFrame = synchronized {
    memoScopes.get(key) match {
      case Some((`scope`, df)) => df
      case _ =>
        val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        memoScopes(key) = (scope, df)
        trackCaches(key, df)
        df
    }
  }

  /** Memoized FLATTENED cache: like [[memoCache]] but stores the frame
    * behind an eager localCheckpoint instead of a SQL-cache persist.
    * A SQL-cached index whose build plan is deep (AQE stages over other
    * caches) pays per-ACTION re-planning on every probe — measured 7×
    * per probe round on the graph serving index at 10× (1.2-1.6s → 0.2s
    * for the identical broadcast-join probe) — while a localCheckpoint
    * rewrites the plan to a flat scan of materialized blocks, the same
    * lineage-cut `clustersUnionFind` uses per iteration. Use it for
    * frames probed once per ROUND (serving indexes); keep [[memoCache]]
    * for frames read a handful of times. The blocks are RDD-level, not
    * SQL-cache entries: replaced/cleared generations are freed by the
    * ContextCleaner once unreferenced (unpersist would be a no-op), and
    * a lost block fails the job instead of recomputing — the standard
    * localCheckpoint trade, acceptable for an in-session index.
    */
  def memoFlat(key: String, scope: String)(build: => DataFrame): DataFrame = synchronized {
    memoScopes.get(key) match {
      case Some((`scope`, df)) => df
      case _ =>
        // a different-scope entry under this key is superseded NOW, not
        // at session end: unpersist its checkpoint blocks at replacement
        // time, else a session interleaving scopes pins every dead
        // generation's blocks until releaseCaches (the r15 eviction
        // scenario). The memo entry is overwritten in the same
        // synchronized block, so nothing can read the dead frame.
        flatCheckpointRdds.remove(key).foreach(_.unpersist(false))
        val df = build.localCheckpoint(true)
        memoScopes(key) = (scope, df)
        // the checkpoint's RDD blocks live OUTSIDE the SQL cache, so
        // trackCaches/unpersist(df) can't free them — capture the
        // LogicalRDD's backing RDD and release it in releaseCaches(),
        // else every memoFlat index LEAKS its blocks for the session
        // (measured: a 30x stored-cells frame left behind slowed the
        // next cold build ~1.6x). Unpersisting kills the data, but the
        // memo entry is dropped in the same release, so nothing can
        // read the dead frame.
        df.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(flatCheckpointRdds(key) = _)
        df
    }
  }

  /** Backing RDDs of the [[memoFlat]] checkpoints, keyed by memo key so
    * a replaced generation is freed at replacement time; the remainder
    * is released with the rest of the session caches.
    */
  private val flatCheckpointRdds =
    scala.collection.mutable.Map.empty[String, org.apache.spark.rdd.RDD[_]]

  /** Session-end teardown: unpersist every tracked cache. Wired into
    * Bench/Verify before spark.stop() and into SparkSpec's afterAll.
    */
  def releaseCaches(): Unit = synchronized {
    trackedCaches.values.foreach(_.foreach(_.unpersist(false)))
    trackedCaches.clear()
    flatCheckpointRdds.values.foreach(_.unpersist(false))
    flatCheckpointRdds.clear()
    memoScopes.clear()
    teardownHooks.foreach(_())
  }

  /** Operators that hold session state OUTSIDE the cache registry (the
    * written-index memo maps) register a teardown hook so
    * [[releaseCaches]] clears them too — otherwise a memoized frame
    * whose persist was unpersisted above would be served stale from the
    * side map on the next request (ScaleProbe releases between scales).
    */
  private val teardownHooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  def onRelease(hook: () => Unit): Unit = synchronized { teardownHooks += hook }

  /** Run INDEPENDENT driver-side branches of one query concurrently
    * (guide §2.6: actions are only sequential because driver code calls
    * them sequentially). Used by the sweep/curve operators whose
    * branches each drive their own bounded job loop (selectivity-curve
    * walks, fanout censuses): submitting them from a small pool lets
    * each branch's tiny probe jobs back-fill the idle executor slots of
    * the others' scheduling gaps. Branch order is preserved in the
    * result, each branch computes exactly what the sequential loop
    * computed (no shared mutable state beyond the synchronized session
    * memos), so values are unchanged — only wall-clock overlaps.
    */
  def inParallel[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(xs.map(x => Future(f(x)))), Duration.Inf)
  }

  /** Absolute root for written index artifacts (generations, bucketed
    * chunk tables). CWD-relative `target/` paths let two concurrent
    * JVMs sharing a working dir clobber each other's generations with
    * mode(overwrite); anchoring to one configurable absolute root keyed
    * by artifact name keeps the layout deterministic per deployment.
    *
    * Scheme-qualified roots (`hdfs://…`, `s3a://…`, `file:/…`) pass
    * through UNTOUCHED — every write/read against the root goes through
    * Spark's Hadoop FileSystem layer, which resolves the scheme itself;
    * absolutization is only for bare local paths, where CWD-relativity
    * is the hazard. Note on object stores: artifact publishes here rely
    * on `mode(overwrite)` + the committer's `_SUCCESS` marker, never on
    * directory rename, so the layout is S3-safe (no atomic-rename
    * assumption); concurrent publishers to the SAME artifact key still
    * need external coordination, exactly as on HDFS.
    */
  def artifactRoot: String = {
    val raw = sys.env.getOrElse("GRAFT_ARTIFACT_DIR", "target")
    if (raw.contains("://") || raw.startsWith("file:")) raw.stripSuffix("/")
    else new java.io.File(raw).getAbsolutePath
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events` with `ts` normalized to long epoch-nanoseconds whatever the
    * physical parquet type: older testdata generations wrote
    * TIMESTAMP(NANOS) (a long under nanosAsLong), newer ones write
    * timestamp[us]. Downstream operators and the streaming twins all do
    * exact integer-ns arithmetic, and the DuckDB oracle's epoch()/
    * epoch_ns() calls are storage-agnostic, so this is the one seam that
    * absorbs the difference.
    */
  def events(s: SparkSession, d: String): DataFrame = nanosTs(table(s, d, "events"))

  /** Normalize a frame's `ts` column to epoch-ns long (no-op when already
    * long). Shared by the batch reader above and the streaming file source.
    */
  def nanosTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.TimestampType =>
      df.withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
    case _ => df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
