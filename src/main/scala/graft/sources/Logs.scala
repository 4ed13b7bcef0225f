package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV / log-line ingestion with explicit malformed-row handling — the
  * ingestion-robustness pattern every production feed needs: at 100 TB
  * some slice of any external feed is corrupt, and silently dropping
  * (or worse, crashing on) bad rows is not an option.
  *
  * PERMISSIVE mode + a `_corrupt_record` column turns parse failures
  * into data: good rows parse to typed columns, bad rows land intact in
  * the corrupt column for quarantine. The reader is a pure map stage —
  * schema-on-read, line-parallel, no shuffle; the quarantine split is
  * one codegen'd filter each way.
  */
object Logs {

  /** Event-log CSV schema (event_id, ts_sec, user_id, event_type, value). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_sec", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("_corrupt_record", StringType)))

  /** Read a CSV event log permissively: every line becomes a row — typed
    * when it parses, quarantined in `_corrupt_record` when it doesn't.
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** The clean side: fully-parsed rows only (corrupt column dropped). */
  def good(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull &&
        col("event_id").isNotNull && col("ts_sec").isNotNull)
      .drop("_corrupt_record")

  /** The quarantine side: the exact complement of [[good]], so the two
    * sides PARTITION the input and no line is ever silently lost. That
    * is two classes of row: lines that failed the schema (verbatim in
    * `_corrupt_record`, for reprocessing/audit) AND lines that parsed
    * but are missing a required field (e.g. ',,7,click,1.0' — empty
    * leading fields parse to typed nulls with a null corrupt column, so
    * a corrupt-only filter would drop them from both sides). Keeping
    * the full row is not just convenience — it is load-bearing twice:
    * Spark rejects scans referencing ONLY the corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and CSV column pruning means a
    * row is only flagged corrupt if the failing FIELD is actually
    * parsed — a projection of id+corrupt silently un-flags rows whose
    * only bad field was pruned away.
    */
  def quarantine(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNotNull ||
        col("event_id").isNull || col("ts_sec").isNull)
      .select(col("_corrupt_record").as("raw_line"),
        col("event_id"), col("ts_sec"), col("user_id"), col("event_type"), col("value"))
}
