package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's attribution-by-construction contract: families are
  * never split across child JVMs, solo families (the graph builds,
  * whose JVM debt measurably contaminated chunk-mates at the 100x
  * corpus — ann_graph_nsw charged 353.8s in the shared ann chunk vs
  * 104.8s isolated) are never packed with anything else, and every
  * query lands in exactly one chunk.
  */
class BenchChunkSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  test("every query lands in exactly one chunk") {
    val chunks = Bench.chunkFamilies(names, maxPerChunk = 28)
    assert(chunks.flatten.sorted == names.sorted)
  }

  test("families are never split across chunks") {
    val chunks = Bench.chunkFamilies(names, maxPerChunk = 28)
    val famToChunks = names.groupBy(Bench.family).map { case (fam, qs) =>
      fam -> chunks.zipWithIndex.collect {
        case (c, i) if qs.exists(c.contains) => i
      }.distinct
    }
    val split = famToChunks.filter(_._2.size > 1)
    assert(split.isEmpty, s"families split across child JVMs: ${split.keys.mkString(", ")}")
  }

  test("solo families get a dedicated child JVM") {
    val chunks = Bench.chunkFamilies(names, maxPerChunk = 28)
    for (solo <- Bench.soloFamilies) {
      val hosts = chunks.filter(_.exists(n => Bench.family(n) == solo))
      assert(hosts.size == 1 && hosts.head.forall(n => Bench.family(n) == solo),
        s"$solo must run alone in its chunk, got: ${hosts.map(_.mkString(","))}")
    }
  }

  test("solo families are real registered queries") {
    // a renamed query would silently turn the solo rule into a no-op
    assert(Bench.soloFamilies.subsetOf(names.toSet))
  }

  test("chunk membership is name-deterministic: growth in one family moves no other") {
    def mates(chunks: Seq[Seq[String]]): Map[String, Set[String]] =
      chunks.flatMap(c => c.map(q => q -> c.toSet)).toMap
    val before = mates(Bench.chunkFamilies(names, maxPerChunk = 28))
    // a next round adds queries to an existing family...
    val grown = names ++ Seq("events_r14_new_a", "events_r14_new_b")
    val after = mates(Bench.chunkFamilies(grown, maxPerChunk = 28))
    for (q <- names if Bench.family(q) != "events") {
      assert(after(q) -- Set("events_r14_new_a", "events_r14_new_b") == before(q),
        s"$q changed chunk-mates when an unrelated family grew")
    }
    // ...and input order never matters
    val shuffled = mates(Bench.chunkFamilies(scala.util.Random.shuffle(names), 28))
    assert(shuffled == before, "chunking must be independent of input order")
  }
}
