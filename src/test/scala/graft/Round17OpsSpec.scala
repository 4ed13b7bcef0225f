package graft

import graft.operators.Ann

/** Round-17 depth work: the quantized serving tier's deployment split.
  * Flat (18p11) and layered (18p13) serving already run off written
  * generations; these specs assert the same contract for the int8
  * index — the artifact a serving fleet actually ships (4× memory cut):
  * loading the written generation and walking it returns byte-identical
  * rows to the live in-memory walk, and the artifact carries ONLY
  * quantized codes + integer-exact norms (no float vectors).
  */
class Round17OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("q_id", "rn", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("int8 walk off the written generation equals the live walk") {
    val live = rows(Ann.graphSearchInt8(spark, dir))
    val fromGen = rows(Ann.graphSearchInt8FromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation int8 serving diverged from the live in-memory walk")
    info(s"${live.map(_._1).distinct.size} queries, ${live.size} rows, " +
      "live and written-generation paths identical")
  }

  test("filtered walk off the written generation equals the live filtered walk") {
    // the last serving walk without a deployment split: the written
    // generation's adjacency carries dlabel and its entry set nlabel,
    // so the metadata-constrained query serves off the same on-disk
    // artifact the unfiltered walk reads
    val live = rows(Ann.graphSearchFiltered(spark, dir))
    val fromGen = rows(Ann.graphSearchFilteredFromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation filtered serving diverged from the live walk")
    info(s"${live.map(_._1).distinct.size} queries, ${live.size} rows, " +
      "live and written-generation filtered paths identical")
  }

  test("the written int8 generation carries no float vectors") {
    val (adj, entry) = Ann.writtenInt8Gen(spark, dir)
    // the artifact's whole point is the 4x memory cut: quantized codes
    // (+ their exact norms) only — a float embedding column in either
    // frame would silently ship the full-precision index
    assert(adj.columns.toSet === Set("src", "dst", "dq", "dn8"))
    assert(entry.columns.toSet === Set("node", "nq", "nn8"))
    val floatish = (adj.schema ++ entry.schema).filter { f =>
      f.dataType.simpleString.contains("float")
    }
    assert(floatish.isEmpty, s"float vector columns in the quantized artifact: $floatish")
    assert(adj.count() > 0 && entry.count() > 0)
  }
}
