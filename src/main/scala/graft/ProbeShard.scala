package graft

/** Ad-hoc shard-and-merge probe (not part of the driver contract):
  * times the flat NSW build vs [[graft.operators.Ann.nswGraphSharded]]
  * at whatever SPARK_GRAFT_SF_DIR points at, so the sharded retune path
  * has measured scale evidence, not just a spec. Prints one JSON line
  * per build. Usage: runMain graft.ProbeShard [nshards ...]
  */
object ProbeShard {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shards = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(4)
    val n = Graft.tableRows(spark, dir, "embeddings")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val edges = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","n_vectors":$n,"edges":$edges,"sec":$sec%.2f}""")
    }
    timed("nsw_flat")(graft.operators.Ann.nswGraph(spark, dir).count())
    for (sh <- shards) {
      Graft.releaseCaches()
      timed(s"nsw_sharded_S$sh")(
        graft.operators.Ann.nswGraphSharded(spark, dir, nshards = sh).count())
    }
    spark.stop()
  }
}
