package graft

import graft.operators.Ann

/** Behavior of the layered HNSW build (Ann.hnswLevels / hnswGraph):
  * the level draw's geometric shape, base-layer equivalence with the
  * flat NSW graph, and the property the layers exist for — greedy
  * descent over the layered graph reaches the true nearest neighbor in
  * no more hops than flat-NSW greedy from a fixed entry point.
  */
class HnswSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    Graft.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val levels: Map[Long, Long] =
    Ann.hnswLevels(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Undirected per-layer adjacency from the layered edge frame. */
  private lazy val adj: Map[Long, Map[Long, Seq[Long]]] =
    Ann.hnswGraph(spark, dir).select("layer", "src", "dst").collect()
      .flatMap { r =>
        val (l, s, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
        Seq((l, s, d), (l, d, s))
      }
      .groupBy(_._1)
      .map { case (l, rows) =>
        l -> rows.groupBy(_._2).map { case (s, es) => s -> es.map(_._3).distinct.toSeq }
      }

  /** Greedy walk within one layer: move to the best-cosine neighbor
    * while it improves on the current node; returns (endNode, hops).
    */
  private def greedy(layer: Long, start: Long, q: Array[Float]): (Long, Int) = {
    val nbrs = adj.getOrElse(layer, Map.empty)
    var cur = start
    var curScore = cos(vecs(cur), q)
    var hops = 0
    var moved = true
    while (moved) {
      moved = false
      val cands = nbrs.getOrElse(cur, Seq.empty)
      if (cands.nonEmpty) {
        val best = cands.maxBy(n => (cos(vecs(n), q), -n))
        val bestScore = cos(vecs(best), q)
        if (bestScore > curScore) { cur = best; curScore = bestScore; hops += 1; moved = true }
      }
    }
    (cur, hops)
  }

  test("levels decay geometrically and layer 0 holds every node") {
    val hist = Ann.hnswLayerHistogram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.values.sum === vecs.size.toLong)
    // expected 4x decay per level: cumulative occupancy at or above a
    // level is well below half the occupancy one level down
    val maxL = hist.keys.max
    def atOrAbove(l: Long): Long = hist.collect { case (k, n) if k >= l => n }.sum
    // the 4x decay is only observable while a level still has mass;
    // the 1-2 node tail (the entry point) is exempt
    for (l <- 1L to maxL; if atOrAbove(l - 1) >= 8)
      assert(atOrAbove(l) * 2 <= atOrAbove(l - 1),
        s"levels >= $l (${atOrAbove(l)} nodes) not decaying vs ${atOrAbove(l - 1)}")
    assert(hist(0L) * 4 >= vecs.size * 3L, "level 0 should hold ~3/4 of draws")
  }

  test("layer 0 of the HNSW graph is exactly the flat NSW graph") {
    val flat = Ann.nswGraph(spark, dir).select("src", "dst", "cos", "rn", "mutual")
      .collect().map(_.toSeq).toSet
    val base = Ann.hnswGraph(spark, dir).filter("layer = 0")
      .select("src", "dst", "cos", "rn", "mutual").collect().map(_.toSeq).toSet
    assert(base === flat)
  }

  test("upper layers only contain nodes drawn at that level or above") {
    val viol = Ann.hnswGraph(spark, dir).select("layer", "src", "dst").collect()
      .filter(r => levels(r.getLong(1)) < r.getLong(0) || levels(r.getLong(2)) < r.getLong(0))
    assert(viol.isEmpty, s"${viol.length} edges reference nodes below their layer")
  }

  /** HNSW-style best-first beam search within one layer: expand the
    * closest unexpanded candidate until none can improve the current
    * top-`ef` set. Returns the best node found and the number of node
    * expansions (the search's cost unit — each expansion reads one
    * adjacency list, i.e. one "hop").
    */
  private def beam(layer: Long, start: Long, q: Array[Float], ef: Int): (Long, Int) = {
    val nbrs = adj.getOrElse(layer, Map.empty)
    val score = scala.collection.mutable.Map(start -> cos(vecs(start), q))
    def sc(n: Long): Double = score.getOrElseUpdate(n, cos(vecs(n), q))
    val visited = scala.collection.mutable.Set(start)
    var frontier = List(start) // unexpanded, kept sorted best-first
    var top = List(start)      // best ef found so far, sorted best-first
    var expansions = 0
    while (frontier.nonEmpty && sc(frontier.head) >= sc(top.last)) {
      val cur = frontier.head
      frontier = frontier.tail
      expansions += 1
      for (n <- nbrs.getOrElse(cur, Seq.empty); if !visited.contains(n)) {
        visited += n
        if (top.size < ef || sc(n) > sc(top.last)) {
          top = (n :: top).sortBy(m => (-sc(m), m)).take(ef)
          frontier = (n :: frontier).sortBy(m => (-sc(m), m))
        }
      }
    }
    (top.head, expansions)
  }

  test("layered descent beats flat-NSW search from the canonical entry") {
    val maxLayer = adj.keys.max
    assert(maxLayer >= 1L, "corpus drew no upper layers")
    // both searches run the SAME layer-0 beam; they differ only in how
    // the entry point is chosen — flat starts at the min vec_id node
    // (the only canonical entry a flat index has), HNSW descends the
    // upper layers greedily (long-range hops over geometrically tiny
    // graphs) and starts the beam where the descent lands.
    val flatEntry = vecs.keys.min
    val topEntry = adj(maxLayer).keys.min
    val queries = vecs.keys.toSeq.sorted.filter(_ % 25 == 7).take(20)
    var flatCost = 0; var flatFound = 0
    var layerCost = 0; var layerFound = 0
    for (qid <- queries) {
      val q = vecs(qid)
      val trueNN = (vecs - qid).maxBy { case (id, v) => (cos(v, q), -id) }._1
      val (fEnd, fCost) = beam(0L, flatEntry, q, ef = 8)
      flatCost += fCost; if (fEnd == trueNN) flatFound += 1
      var cur = topEntry; var descentHops = 0
      for (l <- maxLayer to 1L by -1L; if adj.contains(l)) {
        val (end, h) = greedy(l, cur, q)
        cur = end; descentHops += h
      }
      val (lEnd, lCost) = beam(0L, cur, q, ef = 8)
      layerCost += descentHops + lCost
      if (lEnd == trueNN) layerFound += 1
    }
    info(s"flat: $flatFound/${queries.size} found, $flatCost expansions; " +
      s"layered: $layerFound/${queries.size} found, $layerCost expansions")
    assert(layerFound >= flatFound,
      s"layered descent found $layerFound true NNs vs flat's $flatFound")
    assert(layerCost <= flatCost,
      s"layered descent cost $layerCost expansions vs flat's $flatCost")
  }
}
