package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: regex over query names, for fast local iteration
    // on a handful of queries (the driver always runs the full set)
    val nameFilter = args.lift(2).map(_.r)
    def keep(name: String): Boolean =
      nameFilter.forall(_.findFirstIn(name).isDefined)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the generated layered oracles carry a static 0..OracleMaxLayer CTE
    // stack — fail the whole dump loudly if this corpus draws a higher
    // level, instead of emitting oracles that silently omit layers
    operators.Ann.assertOracleLayerCap(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    var columnsByQuery = Map.empty[String, Seq[String]]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      // pre-delete so a failing query can never leave a stale result
      // from an earlier run for the comparer to pick up
      val target = new java.io.File(s"$outDir/$name")
      if (target.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(target)
      }
      // write rows in a deterministic total order (sorted column-name
      // order) so the compare is correct whether or not the driver's
      // hash is row-order-sensitive; the oracle SQL gets the matching
      // ORDER BY wrapper below.
      try {
        val df = fn(spark, sfDir)
        val sortCols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
        df.coalesce(1).sortWithinPartitions(sortCols: _*)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        columnsByQuery += (name -> df.columns.toSeq)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // wrap each oracle in the same deterministic ORDER BY the parquet
    // dump uses (full sorted column list = a total order for every
    // query, since each output is unique on its key columns)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val wrapped = columnsByQuery.get(k) match {
          case Some(cols) =>
            s"SELECT * FROM (\n$v\n) graft_ordered ORDER BY " +
              cols.sorted.map(c => "\"" + c + "\"").mkString(", ")
          case None => v
        }
        s"${q(k)}: ${q(wrapped)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Graft.releaseCaches()
    spark.stop()
  }
}
