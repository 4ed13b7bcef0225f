package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Shared local SparkSession + temp-dir helpers for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Graft.session("local[4]")

  /** The session is shared across suites (getOrCreate), but tracked
    * operator caches are generation-replaced anyway — releasing them
    * between suites keeps the executor store bounded and exercises the
    * recompute-from-released path. Unpersisting is correctness-safe.
    */
  override def afterAll(): Unit = {
    Graft.releaseCaches()
    super.afterAll()
  }

  /** Write constructed tables as `<name>.parquet` under a temp dir so
    * specs drive the same (SparkSession, sfDir) operator entry points the
    * driver uses.
    */
  def tempSfDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft-spec").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }
}
