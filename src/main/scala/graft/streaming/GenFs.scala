package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-generation root protocol, factored out of
  * [[IndexStreams]] so every streaming family (ANN index maintenance,
  * streaming dedup) shares ONE tested core instead of re-implementing
  * listing/commit/chain semantics per sink:
  *
  *  - all path operations go through the Hadoop [[FileSystem]] resolved
  *    from the root's own scheme (`hdfs://`/`s3a://`/`file:`/bare local);
  *  - a directory counts as written ONLY when its `_SUCCESS` marker
  *    exists (Spark's committer drops it at job end) — bare existence is
  *    never trusted, so crashed/in-flight writes are invisible and
  *    `mode(overwrite)` + marker-gating is object-store-safe without
  *    atomic rename;
  *  - a GENERATION is committed when its `commitSub` directory (the one
  *    written LAST by the sink) is committed;
  *  - per-generation state chains: a full checkpoint dir (`full`) at
  *    some base generation plus one delta dir (`delta`) per later
  *    generation, resolved newest-committed-base-first so pruning can
  *    drop superseded generations without breaking replay.
  */
private[graft] object GenFs {

  def fsOf(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  def committed(fs: FileSystem, dir: String): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Generation numbers under the root whose `commitSub` write committed. */
  def committedGens(s: SparkSession, root: String, commitSub: String): Seq[Long] = {
    val fs = fsOf(s, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(g => committed(fs, s"$root/gen=$g/$commitSub"))
  }

  def currentGen(s: SparkSession, root: String, commitSub: String): Long = {
    val gens = committedGens(s, root, commitSub)
    require(gens.nonEmpty, s"GenFs: no seed generation under $root — " +
      s"write gen=0 (including $commitSub) before starting the stream")
    gens.max
  }

  def latestGenAtMost(s: SparkSession, root: String, cap: Long, commitSub: String): Long = {
    val gens = committedGens(s, root, commitSub).filter(_ <= cap)
    require(gens.nonEmpty, s"GenFs: no generation <= $cap under $root")
    gens.max
  }

  /** The chained state at generation `g`: newest COMMITTED `full`
    * checkpoint at or below `g`, unioned with every later generation's
    * committed `delta`.
    */
  def chainThrough(s: SparkSession, root: String, g: Long,
                   full: String, delta: String): DataFrame = {
    val fs = fsOf(s, root)
    val bases = (0L to g).filter(i => committed(fs, s"$root/gen=$i/$full"))
    require(bases.nonEmpty, s"GenFs: no full $full checkpoint <= gen $g " +
      s"under $root — the seed gen=0/$full is missing and nothing was compacted")
    val base = bases.max
    val paths = (s"$root/gen=$base/$full" +:
      ((base + 1) to g).map(i => s"$root/gen=$i/$delta"))
      .filter(p => committed(fs, p))
    paths.map(s.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** Materialize the full chained state at generation `g` as a new
    * `full` checkpoint. Skips only if a COMMITTED checkpoint already
    * exists; a half-written one is overwritten (and stays invisible
    * until its own marker lands).
    */
  def compactAt(s: SparkSession, root: String, g: Long,
                full: String, delta: String): Unit = {
    val target = s"$root/gen=$g/$full"
    if (!committed(fsOf(s, root), target)) {
      chainThrough(s, root, g, full, delta)
        .write.mode("overwrite").parquet(target)
    }
  }

  /** Retain the newest `keep` generations (keep >= 2: replay of the
    * newest batch folds into a generation BELOW currentGen), compacting
    * the chain into the oldest retained generation first. Returns the
    * new base.
    */
  def prune(s: SparkSession, root: String, keep: Int,
            commitSub: String, full: String, delta: String): Long = {
    require(keep >= 2, s"GenFs.prune: keep must be >= 2 (checkpoint replay " +
      s"of the newest batch folds into a generation BELOW currentGen), got $keep")
    val cur = currentGen(s, root, commitSub)
    val cutoff = math.max(cur - keep + 1, 0L)
    val base = latestGenAtMost(s, root, cutoff, commitSub)
    compactAt(s, root, base, full, delta)
    val fs = fsOf(s, root)
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen=") &&
        st.getPath.getName.stripPrefix("gen=").toLong < base)
      .foreach(st => fs.delete(st.getPath, true))
    base
  }
}
