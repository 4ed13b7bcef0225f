package graft

/** Plan-inspection tool: prints formatted physical plans for the named
  * queries (all if none given). Usage: runMain graft.Explain [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n=== $n ===")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
