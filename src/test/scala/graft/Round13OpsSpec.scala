package graft

import graft.operators._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._

/** Round-13 fixes: the memoized NSW cell assignment (one N·√N scoring
  * pass per session shared by the health probe, the graph builds and
  * SemDeDup), the heaps-law decimal(38) closing products, and the
  * k-center early stop on an exhausted point set.
  */
class Round13OpsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val dir = "/root/testdata/sf0.001"

  test("nswAssign is memoized: stats-then-build share ONE assignment pass") {
    Graft.releaseCaches()
    // the health probe runs first (the retune-before-build sequence) and
    // pays the N·sqrt(N) scoring pass into the memo...
    assert(Ann.nswCellStats(spark, dir).count() > 0)
    // ...the memo registry returns the SAME persisted frame afterwards
    assert(Ann.nswCells(spark, dir, 3) eq Ann.nswCells(spark, dir, 3))
    // ...and the subsequent graph build consumes the cached assignment:
    // its executed plan reads InMemoryTableScan leaves, and NONE of the
    // non-cached plan (outside the memo's own cachedPlan) re-derives the
    // assignment (the centroid-array crossjoin shows up as a
    // collect_list aggregate — absent outside the cache)
    val g = Ann.nswGraph(spark, dir)
    g.count()
    val plan = g.queryExecution.executedPlan
    val cachedScans = collectWithSubqueries(plan) { case s: InMemoryTableScanExec => s }
    assert(cachedScans.nonEmpty, "graph build must read the memoized assignment")
    // collectWithSubqueries does NOT descend into relation.cachedPlan, so
    // expressions found here are genuinely outside the memo: the centroid
    // collect_list aggregation must not appear (it would mean the
    // assignment is re-derived instead of read from cache)
    val outsideAggs = collectWithSubqueries(plan) { case n => n.expressions }
      .flatten.flatMap(_.collect { case e => e.prettyName })
    assert(!outsideAggs.contains("collect_list"),
      "assignment centroid aggregation must live only inside the memoized cachedPlan")
  }

  test("second consumer of the memo does not recompute: dedup_semantic memoizes nprobe=1") {
    Graft.releaseCaches()
    val a = Ann.semanticDedup(spark, dir)
    val b = Ann.semanticDedup(spark, dir)
    assert(a.count() == b.count())
    assert(Ann.nswCells(spark, dir, 1) eq Ann.nswCells(spark, dir, 1))
  }

  test("heapsLaw closing products survive int64 overflow (decimal path)") {
    import spark.implicits._
    // ~11k docs of 20-119 tokens: n*sxy ≈ n^2 * (ln n_tok * 1000)^2
    // ≈ 1.2e8 * 1.2e8 > 9.2e18 — the r12 int64 formulation wrapped here
    val docs = (0L until 11000L).map { i =>
      val ntok = 20 + (i % 100).toInt
      (i, (0 until ntok).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val d = tempSfDir("documents" -> docs)
    val got = TextAnalysis.heapsLaw(spark, d).collect().head
    // plain-BigInt recomputation of the same quantized OLS
    val pts = docs.collect().map { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+")
      (toks.length, toks.distinct.length)
    }.filter(p => p._1 >= 2 && p._2 >= 1)
    def q(v: Int): BigInt = BigInt(math.round(math.log(v.toDouble) * 1000))
    val n = BigInt(pts.length)
    val sx = pts.map(p => q(p._1)).sum
    val sy = pts.map(p => q(p._2)).sum
    val sxx = pts.map(p => q(p._1) * q(p._1)).sum
    val sxy = pts.map(p => q(p._1) * q(p._2)).sum
    assert(((n * sxy - sx * sy) * 1000000).bitLength > 63,
      "test corpus must actually exceed int64 in the closing product")
    val beta = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    assert(got.getLong(0) == pts.length)
    assert(got.getLong(1) == beta.toLong,
      s"beta_micros ${got.getLong(1)} != BigInt OLS $beta")
  }

  test("32-bit simhash bands stay unsaturated where 16-bit bands go hot") {
    import spark.implicits._
    // 30k distinct-token docs: iid-uniform signatures. 16-bit bands have
    // 65k buckets -> expected C(30k,2)/65k ~ 6.9k collision pairs PER BAND
    // (the saturation that goes quadratic at 10^9 docs); 32-bit bands have
    // 4.3e9 buckets -> expected ~0.1 pairs. The candidate join's cost IS
    // sum sz*(sz-1)/2 over buckets, so this contrast is the scale claim.
    val docs = (0L until 30000L)
      .map(i => (i, s"a$i b$i c$i")).toDF("doc_id", "text")
    val bands = docs
      .select(posexplode(call_function("simhash_bands", col("text")))
        .as(Seq("band_id", "band_val")))
    def candPairs(bucket: org.apache.spark.sql.Column): Long = bands
      .groupBy(col("band_id"), bucket.as("b")).agg(count(lit(1)).as("sz"))
      .agg(sum(expr("sz * (sz - 1) div 2")).as("p")).collect().head.getLong(0)
    val pairs32 = candPairs(col("band_val"))
    val pairs16 = candPairs(expr("band_val div 65536")) // top 16 bits: the old band width
    info(s"candidate pairs: 32-bit bands=$pairs32, 16-bit bands=$pairs16")
    assert(pairs16 > 10000L, "16-bit bands must actually saturate on this corpus")
    assert(pairs32 * 100 < pairs16, "32-bit bands must stay ~collision-free")
  }

  test("matryoshka eval: full-dim row is exact parity; sweep rows are k-bounded") {
    val m = Ann.matryoshkaEval(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(64L) == 1000000L, "d=64 must rank identically to the full-dim exact top-k")
    assert(m.keySet == Set(8L, 16L, 32L, 64L))
    val sweep = Ann.recallSweep(spark, dir).collect()
    assert(sweep.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(sweep.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1)))
  }

  test("kcenterSample stops when the point set is exhausted (no duplicate picks)") {
    import spark.implicits._
    // 2 distinct directions, each duplicated 3x: greedy k-center covers
    // the space after 2 picks; rounds 3..6 would all select dist 0
    val base = Seq(
      Array.fill(8)(1.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    val vecs = (0 until 6).map(i => (i.toLong, base(i % 2).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val d = tempSfDir("embeddings" -> vecs)
    val rows = Ann.kcenterSample(spark, d).collect()
    assert(rows.length == 2, s"expected 2 picks, got ${rows.length}")
    assert(rows.forall(r => r.isNullAt(2) || r.getLong(2) > 0L),
      "no pick may report distance 0")
    // and on a corpus with >= k distinct vectors the full curve still emits
    assert(Ann.kcenterSample(spark, dir).count() == Ann.KCenterPicks)
  }
}
