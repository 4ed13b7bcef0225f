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

  /** Generation GC for the dedup root (keep >= 2 — see [[GenFs.prune]]). */
  def pruneGenerations(s: SparkSession, root: String, keep: Int = 2): Long =
    GenFs.prune(s, root, keep, "kept", "fingerprints", "newfingerprints")

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
          // then the cross-generation anti join against the seen set
          val kept = batch
            .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
            .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
            .join(seen, Seq("fp"), "left_anti")
          kept.select(col("fp"))
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newfingerprints")
          // kept commits the generation (written LAST)
          kept.select(col("doc_id"), col("fp"))
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/kept")
        }
        ()
      }
      .start()

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
