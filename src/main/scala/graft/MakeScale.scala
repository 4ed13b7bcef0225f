package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up tool: replicate an SF dir k times with offset keys to probe
  * how operator runtimes scale (10x sf0.1 ~ sf1). Text is decorrelated
  * per copy (every 3rd token tagged with the copy id, which breaks
  * almost all 3-gram shingles) so the dedup workload grows linearly
  * instead of quadratically in near-dup pairs; dims (region/nation) are
  * shared. Usage: runMain graft.MakeScale <inDir> <outDir> <k>
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args.take(3)
    val k = kStr.toInt
    val spark = Graft.session()

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => f(df, i)).reduce(_ unionByName _)

    def off(c: String, i: Int, step: Long) = (col(c) + lit(i * step)).as(c)

    val S = 10000000L
    for ((name, fn) <- Seq[(String, (DataFrame, Int) => DataFrame)](
      "region" -> ((df, i) => if (i == 0) df else df.limit(0)),
      "nation" -> ((df, i) => if (i == 0) df else df.limit(0)),
      "customer" -> ((df, i) => df.withColumn("c_custkey", off("c_custkey", i, S))),
      "supplier" -> ((df, i) => df.withColumn("s_suppkey", off("s_suppkey", i, S))),
      "part" -> ((df, i) => df.withColumn("p_partkey", off("p_partkey", i, S))),
      "orders" -> ((df, i) => df
        .withColumn("o_orderkey", off("o_orderkey", i, S))
        .withColumn("o_custkey", off("o_custkey", i, S))),
      "lineitem" -> ((df, i) => df
        .withColumn("l_orderkey", off("l_orderkey", i, S))
        .withColumn("l_partkey", off("l_partkey", i, S))
        .withColumn("l_suppkey", off("l_suppkey", i, S))),
      "events" -> ((df, i) => df
        .withColumn("event_id", off("event_id", i, S))
        .withColumn("user_id", off("user_id", i, S))),
      "documents" -> ((df, i) => df
        .withColumn("doc_id", off("doc_id", i, S))
        .withColumn("text", if (i == 0) col("text")
          else expr(s"array_join(transform(split(text, '\\\\s+'), (t, p) -> IF(p % 3 = 0, concat(t, '_c$i'), t)), ' ')"))),
      "embeddings" -> ((df, i) => df.withColumn("vec_id", off("vec_id", i, S))),
    )) {
      val src = Graft.table(spark, inDir, name)
      copies(src)(fn).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[makescale] $name done")
    }
    spark.stop()
  }
}
