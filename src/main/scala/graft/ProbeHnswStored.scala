package graft

import org.apache.spark.sql.functions._

/** Focused probe for the r15 stored-slice anomaly: at 100x the layered
  * STORED build (4/5 of the corpus) cost 247s where the FULL layered
  * rebuild cost 132s. Hypothesis: hnswCellsOver embeds a SHUFFLE_HASH
  * hint in the cells frame, but hnswStoredCells is session-CACHED and
  * hints do not survive a read through an InMemoryRelation — so the
  * stored pair self-join degrades to sort-merge over the fat exploded
  * vectors frame (the flat nswStoredGraph re-applies the hint on its
  * cached cells and shows no anomaly).
  *
  * Usage: SPARK_GRAFT_SCALE_DIR=/tmp/graft_scale/x100 \
  *   sbt "runMain graft.ProbeHnswStored [plan|time]"
  */
object ProbeHnswStored {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale/x100")
    val nTot = Graft.tableRows(spark, dir, "embeddings")
    val split = nTot * operators.Ann.InsertSplitNum / operators.Ann.InsertSplitDen
    val mode = args.headOption.getOrElse("time")
    if (mode == "plan") {
      println("=== hnswStoredGraph plan ===")
      operators.Ann.hnswStoredGraph(spark, dir, split, 4, 3).explain("formatted")
    } else {
      def time[T](f: => T): (Double, T) = {
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
      }
      val (fsec, _) = time(operators.Ann.hnswGraph(spark, dir).count())
      Graft.releaseCaches()
      val (ssec, n) = time(operators.Ann.hnswStoredGraph(spark, dir, split, 4, 3).count())
      Graft.releaseCaches()
      // isolation variant: the same stored-slice edges but with the
      // cell assignment INLINE (uncached), exactly the full build's
      // shape — discriminates "caching the cells frame is the cost"
      // from "the stored slice is inherently slower"
      val (vsec, nv) = time(operators.Ann.hnswStoredGraphInline(spark, dir, split, 4, 3).count())
      println(f"""{"probe":"hnsw_stored_anomaly","dir":"$dir","rebuild_sec":$fsec%.1f,"stored_build_sec":$ssec%.1f,"stored_inline_sec":$vsec%.1f,"stored_edges":$n,"inline_edges":$nv}""")
    }
    Graft.releaseCaches()
    spark.stop()
  }
}
