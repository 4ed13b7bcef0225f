package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.operators.{Dedup, Events, Relational, TextAnalysis}

/** Round-5 operators. Semantics on constructed micro-tables where the
  * contract is subtle; invariants and plan shapes on real sf0.001.
  */
class Round5OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("smallQtyRevenue: keeps exactly the lineitems under 20% of the part avg") {
    // part 1: quantities 1, 10, 10, 10 -> avg 7.75, 0.2*avg = 1.55 -> qty 1 kept
    // part 2: quantities 5, 5 -> 0.2*avg = 1.0 -> nothing kept (strict <)
    val li = Seq(
      (1L, 100L, 1.0, 11.0), (1L, 101L, 10.0, 20.0),
      (1L, 102L, 10.0, 20.0), (1L, 103L, 10.0, 20.0),
      (2L, 104L, 5.0, 7.0), (2L, 105L, 5.0, 7.0))
      .toDF("l_partkey", "l_orderkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#4"), (2L, "Brand#4")).toDF("p_partkey", "p_brand")
    val d = tempSfDir("lineitem" -> li, "part" -> part)
    val out = Relational.smallQtyRevenue(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_items") === 1L)
    assert(out.head.getAs[Long]("revenue_e2") === 1100L)
  }

  test("largeOrders: every row tops the threshold, ordered by qty desc, count matches") {
    val rows = Relational.largeOrders(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("qty_e2") > 15000L))
    val qtys = rows.map(_.getAs[Long]("qty_e2"))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b })
    val expected = Graft.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_quantity * 100) as bigint)")).as("q"))
      .filter(col("q") > 15000L).count()
    assert(rows.length === math.min(expected, 100L))
  }

  test("disjunctive: part-side prefilter preserves the unsplit predicate's result") {
    val pred =
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 30))
    val unsplit = Graft.lineitem(spark, dir)
      .join(Graft.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(pred).count()
    val out = Relational.disjunctiveRevenue(spark, dir).collect()
    assert(out.head.getAs[Long]("n_items") === unsplit)
  }

  test("soleLateSupplier: only the sole late supplier on multi-supplier orders counts") {
    val base = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    def day(n: Int) = new java.sql.Timestamp(base.getTime + n * 86400000L)
    // order 1: supp 1 late, supp 2 on time  -> supp 1 counted
    // order 2: supp 1 and 2 both late       -> nobody (two late)
    // order 3: supp 1 late, single supplier -> nobody (no other supplier)
    val li = Seq(
      (1L, 1L, day(100)), (1L, 2L, day(10)),
      (2L, 1L, day(100)), (2L, 2L, day(100)),
      (3L, 1L, day(100)))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Seq((1L, base), (2L, base), (3L, base)).toDF("o_orderkey", "o_orderdate")
    val supp = Seq((1L, "Supplier#1"), (2L, "Supplier#2")).toDF("s_suppkey", "s_name")
    val d = tempSfDir("lineitem" -> li, "orders" -> ord, "supplier" -> supp)
    val out = Relational.soleLateSupplier(spark, d).collect()
    assert(out.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toSeq
      === Seq(("Supplier#1", 1L)))
  }

  test("idleRichCustomers: matches an independent NOT-IN formulation") {
    val out = Relational.idleRichCustomers(spark, dir).collect()
      .map(r => (r.getAs[String]("segment"),
        r.getAs[Long]("n_cust"), r.getAs[Long]("sum_bal_e2"))).toSet
    Graft.customer(spark, dir).createOrReplaceTempView("r5_cust")
    Graft.orders(spark, dir).createOrReplaceTempView("r5_ord")
    val expected = spark.sql(
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |  cast(round(c_acctbal * 100) as bigint) AS bal_e2 FROM r5_cust),
        |pos AS (SELECT sum(bal_e2) AS s, count(*) AS n FROM c WHERE bal_e2 > 0)
        |SELECT c_mktsegment, count(*) AS n_cust, sum(bal_e2) AS sum_bal_e2
        |FROM c, pos
        |WHERE bal_e2 * n > s AND c_custkey NOT IN
        | (SELECT o_custkey FROM r5_ord WHERE o_orderdate >= timestamp'2000-07-01 00:00:00')
        |GROUP BY 1""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("attribution: 30-min window is half-open — same-instant and 31-min clicks excluded") {
    def ns(sec: Long) = sec * 1000000000L
    val ev = Seq(
      (1L, ns(10000), 7L, "click", 1.0, "{}"),    // 29:50 before -> in
      (2L, ns(10010), 7L, "click", 1.0, "{}"),    // 29:40 before -> in
      (3L, ns(9900), 7L, "click", 1.0, "{}"),     // 31:40 before -> out
      (4L, ns(11790), 7L, "purchase", 1.0, "{}"), // the purchase
      (5L, ns(11790), 7L, "click", 1.0, "{}"),    // same instant -> out
      (6L, ns(10005), 8L, "click", 1.0, "{}"))    // other user -> out
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = tempSfDir("events" -> ev)
    val got = Events.attribution(spark, d).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("lag_sec"))).toSet
    assert(got === Set((4L, 1L, 1790L), (4L, 2L, 1780L)))
  }

  test("samplePerKey: at most k per key, deterministic, and rewritten to TopKPerKey") {
    val df = TextAnalysis.samplePerKey(spark, dir, k = 5)
    val rows = df.collect()
    val perKey = rows.groupBy(_.getAs[String]("lang")).map(_._2.length)
    assert(perKey.forall(_ <= 5))
    val again = TextAnalysis.samplePerKey(spark, dir, k = 5).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected the WindowTopKRule rewrite:\n$plan")
  }

  test("trianglesOf: counts each oriented triangle once") {
    // 1-2-3 closed (one triangle); 3-4 dangles; 4-5-6 open path
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    assert(Dedup.trianglesOf(pairs).head().getLong(0) === 1L)
    // adding 4-6 closes a second triangle
    val closed = pairs.union(Seq((4L, 6L)).toDF("id_a", "id_b"))
    assert(Dedup.trianglesOf(closed).head().getLong(0) === 2L)
  }

  test("fuzzyNames: blocked edit-distance pairs on the name dictionary") {
    val part = Seq(
      (1L, "red bolt"), (2L, "red bolt"), (3L, "wed bolt"),
      (4L, "blue bolt"), (5L, "red gear"))
      .toDF("p_partkey", "p_name")
    val d = tempSfDir("part" -> part)
    val got = Dedup.fuzzyNames(spark, d, maxDist = 3).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("dist"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSet
    // "red bolt"-"wed bolt" dist 1 (in); "blue bolt"-"wed bolt" dist 4 and
    // "blue bolt"-"red bolt" dist 4 (out); "red gear" blocks apart (out,
    // despite dist 3 to "red bolt" — blocking bounds the compare set)
    assert(got === Set(("red bolt", "wed bolt", 1L, 2L, 1L)))
  }
}
