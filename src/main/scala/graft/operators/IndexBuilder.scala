package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.VectorOps

/** The reference's indexing/upload path (qdrant.py:139-176 `_upload`:
  * MAIN doc-level collection + CHUNKS paragraph-level collection) as a
  * Spark write-time layout:
  *
  *  - MAIN: one row per document — deterministic hash point id, the
  *    mean-pooled document vector, payload columns.
  *  - CHUNKS: one row per chunk — chunk vector + (doc, chunk_id,
  *    section) metadata, written BUCKETED BY the document key so the
  *    id-filtered per-document chunk lookup (reference qdrant.py:227)
  *    and all candidate self-joins co-locate without a shuffle
  *    (ScaleLayoutSpec demonstrates the bucketed-join property).
  *
  * Instead of Qdrant's HNSW, scale-out search uses the IVF layout: an
  * extra centroid assignment column partitions CHUNKS so a probe scans
  * one cluster (see Ann.ivf).
  */
object IndexBuilder {

  /** Build both collections from chunk vectors (embeddings table schema:
    * vec_id, embedding, label=document key).
    */
  def build(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    buildFrom(Graft.embeddings(s, dir)
      .select(col("label").as("doc_key"), col("vec_id").as("chunk_id"), col("embedding")))

  /** Build MAIN+CHUNKS from any (doc_key, chunk_id, embedding) frame. */
  def buildFrom(chunks: DataFrame): (DataFrame, DataFrame) = {
    val main = chunks
      .groupBy(col("doc_key"))
      .agg(call_function("fvec_avg", col("embedding"), lit(SemanticSearch.Dim)).as("doc_vec"),
        count(lit(1)).as("n_chunks"))
      .select(
        col("doc_key"),
        substring(sha2(col("doc_key").cast("string"), 256), 1, 16).as("point_id"),
        col("doc_vec"), col("n_chunks"))
    (main, chunks)
  }

  /** Upsert a batch of chunk rows into an existing index (the Spark
    * analog of the reference's `client.upsert` loop, qdrant.py:149-176):
    * documents present in the batch are replaced wholesale — point ids
    * are deterministic functions of the doc key, so re-upserting the
    * same batch is idempotent. Untouched documents survive via an anti
    * join. The merged index is written as a NEW versioned directory
    * (immutable index generations + atomic pointer swap is the scale
    * pattern; rewriting in place would race readers). Only the batch's
    * doc keys shuffle: the anti join broadcasts the (small) replaced-key
    * set against the bucketed existing index.
    */
  def upsert(s: SparkSession, indexDir: String, batch: DataFrame, outDir: String): (DataFrame, DataFrame) = {
    val (newMain, newChunks) = buildFrom(batch)
    val replacedKeys = newMain.select(col("doc_key")).distinct()
    val oldMain = s.read.parquet(s"$indexDir/main")
    val oldChunks = s.read.parquet(s"$indexDir/chunks")
    val mergedMain = oldMain
      .join(broadcast(replacedKeys), Seq("doc_key"), "left_anti")
      .unionByName(newMain)
    val mergedChunks = oldChunks
      .join(broadcast(replacedKeys), Seq("doc_key"), "left_anti")
      .unionByName(newChunks)
    mergedMain.write.mode("overwrite").parquet(s"$outDir/main")
    mergedChunks.write.mode("overwrite").parquet(s"$outDir/chunks")
    (s.read.parquet(s"$outDir/main"), s.read.parquet(s"$outDir/chunks"))
  }

  /** Compact an index generation: upsert generations accumulate small
    * unbucketed parquet fragments (each merge writes plain files);
    * compaction rewrites CHUNKS into the bucketed+sorted layout and
    * MAIN re-clustered by doc key, restoring the shuffle-free
    * id-filtered lookup property and the small-file budget. Pure
    * rewrite — row set must be identical (IndexBuilderSpec asserts
    * read-equivalence); emitted as a NEW generation like upsert, so
    * readers never see a half-compacted index.
    */
  def compact(s: SparkSession, indexDir: String, outDir: String, buckets: Int = 16): (DataFrame, DataFrame) = {
    val main = s.read.parquet(s"$indexDir/main")
    val chunks = s.read.parquet(s"$indexDir/chunks")
    main.repartition(col("doc_key")).sortWithinPartitions("doc_key")
      .write.mode("overwrite").parquet(s"$outDir/main")
    s.sql("DROP TABLE IF EXISTS graft_chunks_compacted")
    chunks.write.mode("overwrite")
      .bucketBy(buckets, "doc_key").sortBy("doc_key", "chunk_id")
      .option("path", s"$outDir/chunks")
      .saveAsTable("graft_chunks_compacted")
    (s.read.parquet(s"$outDir/main"), s.table("graft_chunks_compacted"))
  }

  /** Hive-style partitioned corpus layout: documents written
    * `partitionBy(source, lang)` so a per-cell slice (one training-mix
    * cell of `doc_mix_report`) prunes at the FILE LISTING level — the
    * scan for one (source, lang) touches only that directory, never the
    * corpus (IndexBuilderSpec asserts PartitionFilters reach the scan).
    * Dynamic partition overwrite replaces only the cells present in the
    * incoming frame, so refreshing one source is a cell-sized write.
    * This is the third write layout next to [[write]]'s bucketed CHUNKS
    * (join co-location) and [[compact]] (generation rewrite): pruning
    * for slice reads, bucketing for key joins.
    */
  def writePartitionedCorpus(s: SparkSession, dir: String, outDir: String): DataFrame = {
    Graft.documents(s, dir).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source", "lang").parquet(outDir)
    s.read.parquet(outDir)
  }

  /** Materialize the two collections: MAIN plain parquet (small: one row
    * per doc), CHUNKS bucketed by doc_key. Returns re-loaded frames.
    */
  def write(s: SparkSession, dir: String, outDir: String, buckets: Int = 16,
            table: String = "graft_chunks"): (DataFrame, DataFrame) = {
    val (main, chunks) = build(s, dir)
    main.write.mode("overwrite").parquet(s"$outDir/main")
    s.sql(s"DROP TABLE IF EXISTS $table")
    chunks.write.mode("overwrite")
      .bucketBy(buckets, "doc_key").sortBy("doc_key", "chunk_id")
      .option("path", s"$outDir/chunks")
      .saveAsTable(table)
    (s.read.parquet(s"$outDir/main"), s.table(table))
  }

  private val writtenIndexes =
    scala.collection.mutable.Map.empty[String, (DataFrame, DataFrame)]
  Graft.onRelease(() => writtenIndexes.clear())

  /** Session-memoized written index generation per data dir — the disk
    * twin of Graft.memoCache: the first consumer writes MAIN + bucketed
    * CHUNKS once (a deployment's index build job), every later consumer
    * reads the same generation (the serving tier). Keyed per dir with a
    * dir-derived table name so generations for different corpora
    * coexist in one catalog.
    */
  def writtenIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = synchronized {
    writtenIndexes.getOrElseUpdate(dir, {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val out = s"${Graft.artifactRoot}/graft_index/$safe"
      write(s, dir, out, buckets = 16, table = s"graft_chunks$safe")
    })
  }
}
