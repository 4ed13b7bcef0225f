package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Cross-validation: each native kernel must produce values identical to
  * the portable SQL-HOF formulation it replaced (the same SQL the DuckDB
  * oracles run).
  */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    "spark shuffles data across the cluster for wide ops",
    "ops wide for cluster the across data shuffles spark",
    "a", "x y", "one two three four five six",
  ).toDF("text")

  test("simhash128 kernel == SQL-HOF simhash") {
    val rows = docs.select(
      call_function("simhash128", col("text")).as("native"),
      expr(
        """concat_ws('', transform(sequence(0, 127), b ->
          | CASE WHEN aggregate(transform(split(text, '\\s+'), t -> md5(t)), 0, (acc, h) ->
          |   acc + (CASE WHEN ((instr('0123456789abcdef', substring(h, cast(b div 4 as int) + 1, 1)) - 1)
          |       div (CASE WHEN b % 4 = 0 THEN 1 WHEN b % 4 = 1 THEN 2
          |            WHEN b % 4 = 2 THEN 4 ELSE 8 END)) % 2 = 1
          |     THEN 1 ELSE -1 END)) >= 0
          | THEN '1' ELSE '0' END))""".stripMargin).as("hof")).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("bloom builders reject wrong arity with an analysis error, not IndexOutOfBounds") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bloom_agg(id) FROM range(10)").collect()
    }
    assert(e1.getMessage.contains("bloom_agg"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bloom_might_contain(CAST(NULL AS BINARY))").collect()
    }
    assert(e2.getMessage.contains("bloom_might_contain"))
  }

  test("sha3_point_id matches reference-computed ids bit-for-bit") {
    // fixtures computed independently with CPython:
    //   int.from_bytes(hashlib.sha3_512(s.encode()).digest()[:8], 'little')
    // (qdrant.py:137) — values above 2^63 appear as negative signed longs
    val expected = Map(
      "0" -> -7734081392436689875L,     // unsigned 10712662681272861741
      "1" -> 5876116778554240202L,
      "2" -> -8356079311666983338L,     // unsigned 10090664762042568278
      "42" -> -9150227198273350578L,    // unsigned 9296516875436201038
      "12345" -> -9014450812678100470L) // unsigned 9432293261031451146
    val got = expected.keys.toSeq.toDF("id")
      .select(col("id"), call_function("sha3_point_id", col("id")).as("pid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // and the operator wires doc_id through the same kernel
    val op = graft.operators.Chunking.pointIdsSha3(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id").isin(0L, 1L, 2L)).collect()
      .map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(op === expected.view.filterKeys(Set("0", "1", "2")).toMap)
  }

  test("simhash_bands kernel == conv(substring(simhash128))") {
    val rows = docs.select(
      call_function("simhash_bands", col("text")).as("native"),
      expr(
        """transform(sequence(0, 3), b ->
          | cast(conv(substring(simhash128(text), 32 * b + 1, 32), 2, 10) as bigint))""".stripMargin)
        .as("via_string")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("word_ngrams kernel == SQL-HOF shingles") {
    val rows = docs.select(
      call_function("word_ngrams", col("text"), lit(3)).as("native"),
      // sequence(1, 0) DESCENDS in Spark, so guard short docs explicitly
      expr(
        """CASE WHEN size(split(text, '\\s+')) < 3 THEN array()
          |ELSE array_distinct(transform(sequence(1, size(split(text, '\\s+')) - 2),
          | i -> concat_ws(' ', element_at(split(text, '\\s+'), i),
          |   element_at(split(text, '\\s+'), i + 1), element_at(split(text, '\\s+'), i + 2))))
          |END""".stripMargin)
        .as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("minhash_sigs kernel == SQL integer-permutation fold") {
    val hexToLong = (1 to 12).map { k =>
      s"cast(instr('0123456789abcdef', substring(h, $k, 1)) - 1 as bigint) * ${1L << (4 * (12 - k))}"
    }.mkString("(", " + ", ")")
    val rows = docs.select(call_function("word_ngrams", col("text"), lit(3)).as("shingles"))
      .filter(size(col("shingles")) >= 1)
      .select(
        call_function("minhash_sigs", col("shingles")).as("native"),
        expr(
          s"""aggregate(
             |  transform(
             |    transform(transform(shingles, g -> md5(g)), h -> $hexToLong),
             |    v -> transform(sequence(0, 11),
             |           p -> ((16385 + 77 * p) * v + 52361 + 9199 * p) % 1000000007)),
             |  array_repeat(cast(1000000007 as bigint), 12),
             |  (acc, pv) -> zip_with(acc, pv, (x, y) -> least(x, y)))""".stripMargin).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("fingerprint_md5 kernel == md5 of sorted distinct lowercase tokens") {
    val rows = docs.select(
      call_function("fingerprint_md5", col("text")).as("native"),
      md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), "\\s+"))))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("fvec_dot == HOF dot on float and double arrays") {
    val df = Seq((Array(1.5f, -2.0f, 3.25f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).head()
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("word_ngram_hashes == sorted distinct xxhash64 of word_ngrams") {
    val rows = docs.select(
      call_function("word_ngram_hashes", col("text"), lit(3)).as("native"),
      array_sort(expr("transform(word_ngrams(text, 3), s -> xxhash64(s))")).as("via_sql"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("sorted_intersect_count on long arrays == array_intersect size") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(7L), Array(7L))).toDF("a", "b")
    val rows = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("via_sql")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("fvec_avg == positional-explode mean") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 4.0f)),
      (0L, Array(3.0f, 0.0f, 8.0f)),
      (1L, Array(-1.0f, 5.0f, 0.5f))).toDF("label", "embedding")
    val viaAgg = df.groupBy(col("label"))
      .agg(call_function("fvec_avg", col("embedding"), lit(3)).as("m"))
      .select(col("label"), posexplode(col("m")).as(Seq("pos", "v")))
    val viaExplode = df
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v0")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v0").cast("double")).as("v"))
    val a = viaAgg.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = viaExplode.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k: $v vs ${b(k)}") }
  }

  test("ivf_assign == max_by over rounded cosine with cid tie-break") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)), (12L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
      .agg(collect_list(struct(col("vec_id").as("cid"), col("embedding").as("cvec"))).as("cents"))
    val native = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), call_function("ivf_assign", col("embedding"), col("cents")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = vecs.crossJoin(
        vecs.filter(col("vec_id") < 2).select(col("vec_id").as("cid"), col("embedding").as("cvec")))
      .select(col("vec_id"), col("cid"),
        round(VectorOps.cosine(col("embedding"), col("cvec")), 6).as("cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cs"), (-col("cid")).as("nc"))).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === viaJoin)
  }
}
