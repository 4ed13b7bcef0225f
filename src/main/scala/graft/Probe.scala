package graft

import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for operator internals (not part of the driver
  * contract). Usage: runMain graft.Probe
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = Graft.documents(spark, dir)
    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"),
      call_function("word_ngrams", col("text"), lit(3)).as("shingles"))
    time("shingles kernel")(sh.select(sum(size(col("shingles")))).count())
    time("shingles kernel x2")(sh.select(sum(size(col("shingles")))).count())
    val sorted = sh.select(col("doc_id"), array_sort(col("shingles")).as("s"))
    time("array_sort")(sorted.select(sum(size(col("s")))).count())
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode")(ex.count())
    time("explode+agg")(ex.groupBy("s").count().count())
    val exj = ex
    time("self-join broadcast")(
      exj.as("a").join(exj.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .count())
    time("self-join shuffle")(
      exj.as("a").hint("SHUFFLE_HASH").join(exj.as("b").hint("SHUFFLE_HASH"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")).count())
    val hx = docs.select(col("doc_id"),
      explode(expr("transform(word_ngrams(text, 3), s -> xxhash64(s))")).as("h"))
    time("hashed explode")(hx.count())
    time("hashed self-join shuffle")(
      hx.as("a").hint("SHUFFLE_HASH").join(hx.as("b").hint("SHUFFLE_HASH"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")).count())

    val termsArr = array(Seq("data","model","results","analysis","method").map(lit): _*)
    val tc = docs.select(col("doc_id"),
      call_function("term_counts", coalesce(col("text"), lit("")), termsArr).as("tc"))
    time("term_counts scan")(tc.select(sum(element_at(col("tc"),1))).count())
    time("term_counts scan x2")(tc.select(sum(element_at(col("tc"),1))).count())
    time("bm25 full")(graft.operators.KeywordSearch.bm25(spark, dir).count())
    time("bm25 full x2")(graft.operators.KeywordSearch.bm25(spark, dir).count())


    val hs = docs.select(col("doc_id"),
      call_function("word_ngram_hashes", coalesce(col("text"), lit("")), lit(3)).as("shingles"))
    val sorted2 = hs.select(col("doc_id"), col("shingles").as("sh_sorted"),
      size(col("shingles")).cast("long").as("n"))
    val pre = sorted2.select(col("doc_id"), col("n"),
      explode(expr("slice(sh_sorted, 1, cast(n - ((n + 1) div 2) + 1 as int))")).as("sh"))
      .hint("SHUFFLE_HASH")
    time("prefix explode")(pre.count())
    val candsJ = pre.as("a").join(pre.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * lit(1000000L) >= col("b.n") * lit(500000L) &&
        col("b.n") * lit(1000000L) >= col("a.n") * lit(500000L))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    time("prefix self-join")(candsJ.count())
    val cands2 = candsJ.distinct()
    time("prefix self-join+distinct")(cands2.count())
    time("jaccardPrefix full")(graft.operators.Dedup.jaccardPrefix(spark, dir).count())
    time("ngram full")(graft.operators.Dedup.ngramJaccard(spark, dir).count())

    {
      val sorted3 = docs.select(col("doc_id"),
        call_function("word_ngram_hashes", coalesce(col("text"), lit("")), lit(3)).as("sh_sorted"))
        .select(col("doc_id"), col("sh_sorted"), size(col("sh_sorted")).cast("long").as("n"))
      val occ3 = sorted3.select(col("doc_id"), col("n"), explode(col("sh_sorted")).as("sh"))
      val dfreq3 = occ3.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val pre3 = occ3.join(dfreq3, "sh")
        .groupBy(col("doc_id"), col("n"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ranked"))
        .select(col("doc_id"), col("n"),
          explode(expr("transform(slice(ranked, 1, cast(n - ((n + 1) div 2) + 1 as int)), r -> r.sh)")).as("sh"))
      val cands3 = pre3.as("a").join(pre3.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      time("ppjoin candidates")(cands3.count())
    }
    spark.stop()
  }
}
