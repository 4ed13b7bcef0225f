package graft

import org.apache.spark.sql.functions._

/** Ad-hoc graph-build probe (not part of the driver contract): measures
  * the blocked candidate-pair volume and cell-occupancy skew behind the
  * NSW/HNSW builds at whatever SPARK_GRAFT_SF_DIR points at, so a
  * scale experiment can attribute build wall-time to pair count vs
  * executor-side constant factors. Usage: runMain graft.ProbeGraph
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val n = Graft.tableRows(spark, dir, "embeddings")
    println(s"[probe] corpus vectors: $n, sqrt fanout: ${graft.operators.Ann.sqrtFanout(n)}")
    val cells = graft.operators.Ann.nswCells(spark, dir, nprobe = 3)
    time("cells.count")(cells.count())
    val occ = cells.groupBy("cid").agg(count(lit(1)).as("occ"))
    time("occupancy: cells/max/sum(occ^2)")(
      occ.agg(count(lit(1)), max(col("occ")), sum(col("occ") * col("occ"))).collect().toSeq)
    val pairs = cells.as("x").join(cells.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("x.cid").as("cid"), col("y.vec_id").as("dst"),
        round(graft.functions.VectorOps.dot(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm")), 6).as("cos"))
    time("pair stream count+cos")(pairs.select(count(lit(1)), sum(col("cos"))).collect().toSeq)

    // stage-by-stage timings of the NSW edge pipeline (mirrors
    // Ann.nswEdgesFromCells so each downstream stage can be attributed)
    import org.apache.spark.sql.expressions.Window
    val k = 4
    val wCell = Window.partitionBy(col("src"), col("cid"))
      .orderBy(col("cos").desc, col("dst"))
    val perCell = pairs
      .withColumn("rn", row_number().over(wCell)).filter(col("rn") <= k)
      .select(col("src"), col("dst"), col("cos"))
    time("perCell heap")(perCell.count())
    val wTop = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    val r1 = perCell.distinct()
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= k)
      .select(col("src"), col("dst"), col("cos"))
    time("r1 top-k")(r1.count())
    val und = r1.select(col("src"), col("dst"))
      .union(r1.select(col("dst").as("src"), col("src").as("dst")))
    val hop2 = und.as("a").join(und.as("b"),
        col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
      .distinct()
    time("hop2 pairs")(hop2.count())
    val full = graft.operators.Ann.nswGraph(spark, dir)
    time("full nswGraph")(full.count())
    spark.stop()
  }
}
