package graft

import org.apache.spark.sql.functions._

/** Skew-mitigation pattern: salted two-phase aggregation produces the
  * same result as the direct aggregation while splitting a hot key
  * across partitions (SURVEY.md §5 — salting for skew; AQE skew-join
  * handles the join case at runtime).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    // key "hot" is 100x more frequent than the others
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).flatMap(i => Seq((s"k$i", i.toDouble)))
    val df = rows.toDF("key", "v").repartition(8)

    val direct = df.groupBy($"key")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap

    val salted = df
      .withColumn("salt", pmod(hash($"v"), lit(16)))
      .groupBy($"key", $"salt")
      .agg(sum($"v").as("ps"), count(lit(1)).as("pn"))
      .groupBy($"key")
      .agg(sum($"ps").as("s"), sum($"pn").as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap

    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }
}
