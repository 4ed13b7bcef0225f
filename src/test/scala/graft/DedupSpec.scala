package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 0/1 exact dups; 2 is 1 reordered; 3 is 1 with one word changed
  // (near-dup); 4 unrelated.
  private lazy val dir = tempSfDir(
    "documents" -> Seq(
      (0L, "spark shuffles data across the cluster for wide ops", "en", "s", 1L),
      (1L, "spark shuffles data across the cluster for wide ops", "en", "s", 1L),
      (2L, "ops wide for cluster the across data shuffles spark", "en", "s", 1L),
      (3L, "spark shuffles data across the cluster for narrow ops", "en", "s", 1L),
      (4L, "completely different text about databases and storage engines", "en", "s", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(spark, dir).collect()
    assert(groups.length === 4)
    val dup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("canonical_id") === 0L)
  }

  test("fingerprint dedup catches token reorderings") {
    val groups = Dedup.fingerprint(spark, dir).collect()
    assert(groups.length === 3) // {0,1,2} fold together, {3}, {4}
    assert(groups.map(_.getAs[Long]("n_dups")).sorted.toSeq === Seq(1L, 1L, 3L))
  }

  test("ngram jaccard finds near-dup pair and skips unrelated") {
    val pairs = Dedup.ngramJaccard(spark, dir, tauMicros = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix-filtered jaccard returns exactly the inverted-index result") {
    val full = Dedup.ngramJaccard(spark, dir, tauMicros = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pref = Dedup.jaccardPrefix(spark, dir, tauMicros = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pref === full)
    assert(full.nonEmpty)
  }

  test("minhash lsh surfaces exact and near dup candidates") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))           // identical -> all bands agree
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs equal, near docs within small hamming") {
    val sh = Dedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(0L) === sh(1L))
    val hamming = sh(0L).zip(sh(3L)).count { case (a, b) => a != b }
    assert(hamming < 32, s"hamming=$hamming") // 128-bit signature: r13 2x-widened bound
    val far = sh(0L).zip(sh(4L)).count { case (a, b) => a != b }
    assert(far > hamming)
  }

  test("embedding near-dup respects label blocking and threshold") {
    val edir = tempSfDir(
      "embeddings" -> Seq(
        (0L, Array(1.0f, 0.0f, 0.0f), 0),
        (1L, Array(0.999f, 0.04f, 0.0f), 0),  // near-dup of 0, same label
        (2L, Array(1.0f, 0.0f, 0.0f), 1),     // identical to 0 but other label
        (3L, Array(0.0f, 1.0f, 0.0f), 0),     // orthogonal
      ).toDF("vec_id", "embedding", "label"))
    val pairs = Dedup.embeddingNearDup(spark, edir, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("embedding LSH blocking recalls high-cosine pairs, subset of exact") {
    // high-cosine near-dups collide in at least one SRP band w.h.p.;
    // planes are vec_id 8..23, so give them spread-out directions
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = new Array[Float](64); a(axis) = 1.0f; a((axis + 1) % 64) = eps; a
    }
    val rows = (8L until 24L).map(i => (i, vec((i % 16).toInt * 4, 0.3f), 9)) ++ Seq(
      (0L, vec(0, 0.00f), 0),
      (1L, vec(0, 0.02f), 0),   // cos ~0.9998 with 0, same label
      (2L, vec(0, 0.01f), 1),   // near 0 but different label
      (3L, vec(32, 0.0f), 0))   // orthogonal
    val edir = tempSfDir("embeddings" ->
      rows.toDF("vec_id", "embedding", "label"))
    val lsh = Dedup.embeddingNearDupLsh(spark, edir, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((0L, 1L)), s"high-cosine pair not recalled: $lsh")
    val exact = Dedup.embeddingNearDup(spark, edir, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"lsh $lsh must be a subset of exact $exact")
  }

  test("clusters: multi-hop chains collapse to the min-id representative") {
    // A~B, B~C by 3-gram jaccard >= 0.5, but A and C are NOT a pair
    // themselves -> transitivity must still cluster all three; D isolated
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val cdir = tempSfDir(
      "documents" -> Seq(
        (10L, base + " one two", "en", "w", 1L),
        (20L, base + " one three", "en", "w", 1L),        // ~ 10
        (30L, base + " four three", "en", "w", 1L),       // ~ 20, farther from 10
        (40L, "completely different words entirely here now", "en", "w", 1L),
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val reps = Dedup.clusters(spark, cdir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps(10L) === 10L)
    assert(reps(20L) === 10L)
    assert(reps(30L) === 10L, s"transitive closure failed: $reps")
    assert(reps(40L) === 40L)
  }

  test("cluster paths agree: driver union-find == distributed propagation") {
    val real = "/root/testdata/sf0.001"
    val pairs = Dedup.ngramJaccard(spark, real).select("id_a", "id_b")
    val viaUf = Dedup.clustersOf(spark, real, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = Dedup.clustersOf(spark, real, pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf === viaProp)
  }

  test("embedding LSH on real corpus is a recalled subset of exact pairs") {
    val real = "/root/testdata/sf0.01"
    val exact = Dedup.embeddingNearDup(spark, real)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(spark, real)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty)
  }

  test("embedding near-dup auto-routes to the LSH plan above the size threshold") {
    val real = "/root/testdata/sf0.001"
    val routed = Dedup.embeddingNearDup(spark, real, routeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(spark, real)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed === lsh, "above the threshold the router must produce the LSH plan")
    val exact = Dedup.embeddingNearDup(spark, real, routeThreshold = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact) && lsh.nonEmpty)
  }
}
