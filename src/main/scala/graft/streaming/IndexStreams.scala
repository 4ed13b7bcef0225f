package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ann

/** Streaming ANN-index maintenance — the 18g versioned-generation
  * pattern (EventStreams/IndexBuilder: immutable generations + atomic
  * pointer advance) pointed at the NSW serving index: new vectors
  * arrive on a stream and each microbatch is folded into the current
  * stored generation by the batch-proportional [[Ann.nswInsertBatch]]
  * (no stored-corpus rescore — the keyed `ann_graph_insert` cost
  * contract), writing generation b+1. The reference's serving store
  * does exactly this online (qdrant.py:150-170 upserts points into a
  * live HNSW collection); here the same capability is a Structured
  * Streaming sink over the batch insert operator.
  *
  * Layout under `genRoot`:
  *  - `gen=0/edges` + `gen=0/members`: the seed build (written by the
  *    caller before starting the stream);
  *  - `gen=<b+1>/edges` + `gen=<b+1>/newmembers`: microbatch b's
  *    output. Generation dirs are written ONCE with overwrite and the
  *    generation number is a pure function of the checkpointed batch
  *    id, so a replayed batch rewrites its own generation unchanged
  *    (exactly-once by idempotence, like 30g's twin); members are
  *    never copied forward — a generation's corpus is the union of the
  *    seed members and every earlier generation's `newmembers`.
  *
  * All path operations go through the Hadoop [[FileSystem]] API
  * resolved from the root's own scheme, so a generation root on
  * `hdfs://` or `s3a://` lists, resolves and GCs exactly like a local
  * one — the deployment shape at 100 TB, where the serving fleet reads
  * generations straight off the object store. Commit detection is the
  * `_SUCCESS` marker Spark's FileOutputCommitter drops at job end:
  * a directory is only a checkpoint/generation once its marker exists,
  * never on bare existence (a crashed or in-flight write leaves
  * `_temporary` but no marker), which is also the object-store-safe
  * choice — no rename-into-place is ever needed, `mode(overwrite)` +
  * marker-gating gives the same only-committed-data-is-visible
  * contract without assuming atomic directory rename (S3 has none).
  *
  * Scale: per microbatch the insert scores |B|·√|S| centroids and
  * |B|-proportional candidate pairs (see nswGraphInsert's measured
  * 100× evidence: 86s insert vs 273s rebuild at a 20% batch); the
  * stored edge frame is read once per batch and only touched srcs are
  * re-ranked. Compaction of the accumulated generation chain is
  * [[graft.operators.IndexBuilder.compact]]'s job, unchanged.
  */
object IndexStreams {

  /** Current generation number = max committed gen=* dir under the
    * root; a generation is committed once its `edges` job dropped its
    * `_SUCCESS` marker (the dir the sink writes LAST). All semantics —
    * scheme-aware FileSystem resolution, marker-gated commits, chained
    * full+delta state, keep>=2 pruning — live in the shared
    * [[GenFs]] core; this object binds them to the index layout
    * (commit = `edges`, chain = `members` + `newmembers`).
    */
  private[graft] def currentGen(s: SparkSession, root: String): Long =
    GenFs.currentGen(s, root, "edges")

  /** Latest committed generation at or below `cap` — the stored state a
    * microbatch folds into. The generation chain may have holes (empty
    * microbatches write nothing), so contiguity cannot be assumed.
    */
  private[graft] def latestGenAtMost(s: SparkSession, root: String, cap: Long): Long =
    GenFs.latestGenAtMost(s, root, cap, "edges")

  /** All member frames up to and including generation `g`: the newest
    * COMMITTED full `members` checkpoint at or below `g` (the seed's
    * gen=0, or a [[compactMembersAt]] rewrite), plus every later
    * generation's committed `newmembers` delta. Starting from the
    * newest full checkpoint — rather than always from gen=0 — is what
    * lets [[pruneGenerations]] garbage-collect superseded generations
    * without breaking replay. Only `_SUCCESS`-marked writes are ever
    * selected as a base or as a delta: a crashed compaction or a
    * mid-flight member write is skipped, and the chain keeps resolving
    * through the previous committed base.
    */
  private[graft] def membersThrough(s: SparkSession, root: String, g: Long): DataFrame =
    GenFs.chainThrough(s, root, g, "members", "newmembers")

  /** Materialize the FULL member set at generation `g` as
    * `gen=<g>/members` — a member-chain checkpoint. Idempotent (skips
    * only if a COMMITTED checkpoint already exists; a half-written one
    * from a crashed compaction is overwritten, and until the rewrite's
    * `_SUCCESS` lands nothing ever reads it) and safe against
    * concurrent readers: the write target never participates in its
    * own [[membersThrough]] read set, and existing readers keep
    * resolving through their old base until the new checkpoint's
    * marker exists.
    */
  def compactMembersAt(s: SparkSession, root: String, g: Long): Unit =
    GenFs.compactAt(s, root, g, "members", "newmembers")

  /** Generation GC: retain the newest `keep` generations and delete
    * everything older, first compacting the member chain into the
    * oldest retained generation so every surviving generation still
    * reconstructs its full member set. Returns the new base generation.
    *
    * Contract: only generations STRICTLY BELOW the compacted base are
    * deleted, and the base is <= currentGen - keep + 1 — so the
    * stream's checkpoint replay region and every retained serving
    * generation are untouched. `keep >= 2` is REQUIRED, not advisory:
    * replay of the batch that produced the newest generation folds into
    * `latestGenAtMost(batchId)` — a generation strictly BELOW
    * currentGen — so at least one older generation must survive any
    * prune or a post-crash replay finds nothing to fold into and wedges
    * the stream. (`keep = 2` also leaves the previous generation for
    * in-flight readers mid-pointer-swing.)
    */
  def pruneGenerations(s: SparkSession, root: String, keep: Int = 2): Long =
    GenFs.prune(s, root, keep, "edges", "members", "newmembers")

  /** Start the maintenance stream: `vecStream` is a streaming frame of
    * (vec_id, embedding) arrivals (ids dense above the stored corpus —
    * the generation id contract). Each microbatch b reads the current
    * generation, inserts, and writes generation b+1.
    */
  def maintainNswIndex(vecStream: DataFrame, genRoot: String, checkpoint: String,
                       k: Int = 4, nprobe: Int = 3): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          // stored = the latest generation at or below batchId, NOT
          // batchId itself: empty microbatches skip their write, so the
          // generation chain has holes; assuming contiguity would read a
          // non-existent gen=<batchId>/edges after any empty batch and
          // wedge the stream (the checkpoint replays into the same hole).
          // Replay stays bit-identical: a crashed write of gen=target is
          // above batchId and thus never selected here.
          val stored = latestGenAtMost(s, genRoot, batchId)
          val storedEmb = membersThrough(s, genRoot, stored)
          val storedEdges = s.read.parquet(s"$genRoot/gen=$stored/edges")
          val merged = Ann.nswInsertBatch(storedEmb, storedEdges,
            batch.select(col("vec_id"), col("embedding")), k, nprobe)
          // members before edges: the generation only becomes visible
          // when edges/_SUCCESS lands (committedGens gates on it), so a
          // crash between the two writes leaves an invisible half-gen
          // that replay overwrites — never a served generation whose
          // member delta is missing
          batch.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newmembers")
          merged.write.mode("overwrite").parquet(s"$genRoot/gen=$target/edges")
        }
        ()
      }
      .start()

  /** Streaming maintenance of the LAYERED index — [[maintainNswIndex]]'s
    * versioned-generation fold applied to the hierarchy the layered
    * serving walk ([[Ann.hnswSearch]]) actually reads: each microbatch
    * folds into the current generation's (layer, src, dst, cos, rn)
    * edges via the batch-proportional [[Ann.hnswInsertBatch]] (new
    * nodes draw their levels from the same deterministic md5 function
    * of vec_id, so a node's layer membership is identical whether it
    * arrived by stream or by rebuild). Same layout, hole-tolerance and
    * exactly-once-by-idempotence contract as the flat twin; the seed
    * generation's `edges` must be a layered build
    * ([[Ann.hnswStoredGraph]] / a prior generation of this stream).
    */
  def maintainHnswIndex(vecStream: DataFrame, genRoot: String, checkpoint: String,
                        k: Int = 4, nprobe: Int = 3): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          // same hole-tolerant generation pick as the flat stream (an
          // empty microbatch writes nothing; contiguity can't be assumed)
          val stored = latestGenAtMost(s, genRoot, batchId)
          val storedEmb = membersThrough(s, genRoot, stored)
          val storedEdges = s.read.parquet(s"$genRoot/gen=$stored/edges")
          val merged = Ann.hnswInsertBatch(storedEmb, storedEdges,
            batch.select(col("vec_id"), col("embedding")), k, nprobe)
          // same members-before-edges commit order as the flat stream
          batch.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newmembers")
          merged.write.mode("overwrite").parquet(s"$genRoot/gen=$target/edges")
        }
        ()
      }
      .start()

  /** Publish the SEED generation of the DEDUPED index stream: the full
    * dedup-gated build over `seedEmb` plus every stored-state frame the
    * per-batch fold reads — members, the (value → canon) map, the full
    * canonical map, the survivor cells (with vectors/norms) and the
    * survivor centroid array. `edges` is written LAST = the commit
    * marker, exactly the other index streams' convention.
    */
  def seedDedupedGen(s: SparkSession, dir: String, seedEmb: DataFrame,
                     seedTag: String, genRoot: String, k: Int = 4, nprobe: Int = 3,
                     tauMicros: Long = Ann.BuildDedupTauMicros): Unit = {
    val st = Ann.dedupedStoredState(s, dir, seedEmb, seedTag, k, nprobe, tauMicros)
    st.storedEmb.write.mode("overwrite").parquet(s"$genRoot/gen=0/members")
    st.valueCanon.write.mode("overwrite").parquet(s"$genRoot/gen=0/values")
    st.storedMap.write.mode("overwrite").parquet(s"$genRoot/gen=0/canon")
    st.survivorCells.write.mode("overwrite").parquet(s"$genRoot/gen=0/cells")
    st.cents.write.mode("overwrite").parquet(s"$genRoot/gen=0/cents")
    st.storedGraph.select(col("src"), col("dst"), col("cos"), col("rn"),
        org.apache.spark.sql.functions.lit(false).as("is_attach"))
      .unionByName(st.storedAtt)
      .write.mode("overwrite").parquet(s"$genRoot/gen=0/edges")
  }

  /** The DEDUPED generation's stored state at generation `g`, read
    * entirely OFF THE ARTIFACT — no collapse, no assignment, no
    * stored-corpus scoring ever runs on the microbatch path: members /
    * canon / values / cells resolve through the GenFs full+delta
    * chains, the centroid array is the epoch-fixed seed checkpoint,
    * and the graph/attach split is one filter of the generation's
    * edge frame.
    */
  private[graft] def dedupedStateAt(s: SparkSession, genRoot: String,
                                    g: Long): Ann.DedupStoredState = {
    val storedMap = GenFs.chainThrough(s, genRoot, g, "canon", "newcanon")
    val edges = s.read.parquet(s"$genRoot/gen=$g/edges")
    Ann.DedupStoredState(
      storedEmb = membersThrough(s, genRoot, g),
      valueCanon = GenFs.chainThrough(s, genRoot, g, "values", "newvalues"),
      survivorCells = GenFs.chainThrough(s, genRoot, g, "cells", "newcells"),
      cents = GenFs.chainThrough(s, genRoot, g, "cents", "newcents"),
      survivors = storedMap.filter(col("canon") === col("vec_id")).select(col("vec_id")),
      storedMap = storedMap,
      storedGraph = edges.filter(!col("is_attach"))
        .select(col("src"), col("dst"), col("cos"), col("rn")),
      storedAtt = edges.filter(col("is_attach")))
  }

  /** Streaming maintenance of the DEDUPED index — the dup-routed fold
    * ([[Ann.dedupedInsertOver]]) under the versioned-generation
    * protocol: without it every arriving duplicate would wire a fresh
    * clique into the repaired graph. Per microbatch the stored side is
    * read off the generation artifact (state chains above), the batch
    * routes exact/near dups to attach edges + canon-map deltas and
    * inserts true survivors, and generation b+1 persists the deltas
    * (`newmembers`/`newcanon`/`newvalues`/`newcells`) plus the merged
    * `edges` (written LAST = commit). Same hole-tolerance and
    * exactly-once-by-idempotence contract as the other index streams.
    * Per-canon weights are a groupBy over the canon chain at any
    * generation — derived, never stored.
    */
  def maintainDedupedIndex(vecStream: DataFrame, genRoot: String, checkpoint: String,
                           k: Int = 4, nprobe: Int = 3,
                           tauMicros: Long = Ann.BuildDedupTauMicros): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = batchId + 1
          val stored = latestGenAtMost(s, genRoot, batchId)
          val st = dedupedStateAt(s, genRoot, stored)
          val (edges, bMap, bCells, newVals) = Ann.dedupedInsertOver(
            s, st, batch.select(col("vec_id"), col("embedding")), k, nprobe, tauMicros)
          batch.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(s"$genRoot/gen=$target/newmembers")
          bMap.write.mode("overwrite").parquet(s"$genRoot/gen=$target/newcanon")
          newVals.write.mode("overwrite").parquet(s"$genRoot/gen=$target/newvalues")
          bCells.write.mode("overwrite").parquet(s"$genRoot/gen=$target/newcells")
          edges.write.mode("overwrite").parquet(s"$genRoot/gen=$target/edges")
        }
        ()
      }
      .start()

  /** File-source entry point: stream (vec_id, embedding) arrivals from
    * a growing parquet dir, one file per microbatch — the spec's feed
    * and the shape of a production drop-folder ingest.
    */
  def fromParquetDir(s: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    s.readStream.schema(schemaFrom.schema).option("maxFilesPerTrigger", 1).parquet(dir)
}
