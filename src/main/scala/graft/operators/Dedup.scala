package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.VectorOps

/** Deduplication family for training-data pipelines: exact,
  * fingerprint, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: no operator ever does a global all-pairs compare.
  * Candidate generation is always a co-partitioned self-join on a bucket
  * key (shingle, LSH band, label block); everything upstream of the
  * bucket shuffle is one codegen'd projection per row (shingling, minhash
  * and simhash are higher-order array expressions, never exploded until
  * the bucket key itself is needed).
  *
  * Similarity values exposed for oracle comparison are micro-scaled
  * integers (exact cross-engine arithmetic) or 6dp-rounded cosines.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** OpenRefine-style fingerprint dedup: md5 of sorted distinct lowercase
    * tokens — catches token-reordered / duplicated-word variants.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .groupBy(call_function("fingerprint_md5", col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct word-3-gram shingles via the native word_ngrams kernel
    * (one JVM call per row; no explode until candidate generation).
    * No emptiness filter here: a `size(shingles) >= 1` predicate gets
    * pushed below the projection and re-evaluates the kernel per
    * reference — consumers guard downstream instead (explode drops
    * empties for free; minhash filters on the sentinel signature).
    */
  private def withShingles(s: SparkSession, dir: String): DataFrame =
    // memoized per session+dir: every minhash-family query starts from
    // this same kernel pass, so one cached copy serves them all
    Graft.memoCache("dedup_shingles", dir)(
      Graft.documents(s, dir)
        .select(col("doc_id"), call_function("word_ngrams", col("text"), lit(3)).as("shingles")))

  /** N-gram Jaccard near-dup pairs: shingle-inverted-index self-join
    * (candidates share >= 1 shingle), Jaccard as exact integer micros.
    * At 100 TB the shingle join is the standard inverted-index candidate
    * pass — work is proportional to shared-shingle pairs, not all pairs.
    */
  /** Shingle sets as SORTED xxhash64 longs (native kernel): primitive
    * join keys for the inverted-index pass, primitive two-pointer verify.
    * coalesce folds away the inferred isnotnull(...) filter that would
    * otherwise re-evaluate the kernel below the projection.
    */
  private def withHashedShingles(s: SparkSession, dir: String): DataFrame =
    // memoized per session+dir: the Jaccard family (inverted index,
    // prefix, ppjoin, verify passes, containment) all read this frame
    Graft.memoCache("dedup_hashed_shingles", dir)(
      Graft.documents(s, dir)
        .select(col("doc_id"),
          call_function("word_ngram_hashes", coalesce(col("text"), lit("")), lit(3))
            .as("shingles")))

  def ngramJaccard(s: SparkSession, dir: String, tauMicros: Long = 500000L): DataFrame = {
    // shingle-set size travels WITH each inverted-index row: no second
    // scan, no sizes join after the pair aggregation. SHUFFLE_HASH on the
    // self-join: both sides shuffle the identical subtree on the shingle
    // hash, so ReusedExchange computes the kernel + explode ONCE (a
    // broadcast self-join would build and compute both sides separately).
    val sh = withHashedShingles(s, dir)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n"),
        explode(col("shingles")).as("sh"))
      .hint("SHUFFLE_HASH")
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          // size-compatibility pruning: jaccard >= tau forces
          // min(n_a,n_b) >= tau * max(n_a,n_b); exactness-preserving,
          // applied before the aggregation shuffle.
          col("a.n") * lit(1000000L) >= col("b.n") * lit(tauMicros) &&
          col("b.n") * lit(1000000L) >= col("a.n") * lit(tauMicros))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_micros"))
      .filter(col("jaccard_micros") >= tauMicros)
  }

  /** First 12 hex digits of a hex string `h` as a 48-bit integer —
    * portable SQL (posFn = instr for Spark, strpos for DuckDB).
    */
  private def hexToLong(h: String, posFn: String): String =
    (1 to 12).map { k =>
      s"cast($posFn('0123456789abcdef', substring($h, $k, 1)) - 1 as bigint) * ${1L << (4 * (12 - k))}"
    }.mkString("(", " + ", ")")

  /** MinHash + banded LSH candidate pairs: 12 hashes in 4 bands of 3;
    * docs sharing any band hash are candidates. The signature is ONE
    * native kernel call per row (md5 per shingle once, 48-bit prefix,
    * integer permutations, min fold — graft.functions.TextHashes); the
    * only shuffle is the band-bucket self-join.
    */
  /** One row per (doc, LSH band): 12 minhashes in 4 bands of 3, band
    * value as a joined string. Shared by the candidate join and the
    * index-health stats.
    */
  private def minhashBands(s: SparkSession, dir: String): DataFrame =
    withShingles(s, dir)
      .select(col("doc_id"), call_function("minhash_sigs", col("shingles")).as("sigs"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, 3),
          | b -> concat(cast(element_at(sigs, 3*b + 1) as string), '|',
          |             cast(element_at(sigs, 3*b + 2) as string), '|',
          |             cast(element_at(sigs, 3*b + 3) as string)))""".stripMargin))
        .as(Seq("band_id", "band_hash")))
      // shingle-less docs carry the all-P sentinel signature; they must
      // not bucket together. Filtering on the *generated* band string
      // stays above the Generate (no pushdown re-evaluating the kernel).
      .filter(col("band_hash") =!= "1000000007|1000000007|1000000007")

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    // self-join via shuffle so ReusedExchange computes the signature
    // subtree once (broadcast would build both sides separately)
    val bands = minhashBands(s, dir).hint("SHUFFLE_HASH")
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Incremental (delta-batch) near-dup detection: documents of the NEW
    * ingest batch (doc_id >= newFrom stands in for the arrival split)
    * probe the EXISTING corpus's LSH band buckets — the asymmetric join
    * every production dedup pipeline actually runs. Candidate work is
    * proportional to the NEW batch's bands (at 100 TB the old side is
    * the stored band index, read not recomputed — see IndexBuilder's
    * generations), never a full-corpus self-join; survivors are
    * filtered by the 12-component signature-agreement estimate, exactly
    * like [[minhashVerified]]'s middle stage.
    */
  def incremental(s: SparkSession, dir: String, newFrom: Long = 450L): DataFrame = {
    val bands = minhashBands(s, dir)
    val sigs = withShingles(s, dir)
      .select(col("doc_id"), call_function("minhash_sigs", col("shingles")).as("sigs"))
    val cand = bands.filter(col("doc_id") >= newFrom)
      .select(col("band_id").as("nb"), col("band_hash").as("nh"), col("doc_id").as("new_id"))
      .join(bands.filter(col("doc_id") < newFrom)
          .select(col("band_id").as("ob"), col("band_hash").as("oh"), col("doc_id").as("old_id")),
        col("nb") === col("ob") && col("nh") === col("oh"))
      .select(col("new_id"), col("old_id")).distinct()
    cand
      .join(sigs.select(col("doc_id").as("new_id"), col("sigs").as("sa"))
        .hint("SHUFFLE_HASH"), "new_id")
      .join(sigs.select(col("doc_id").as("old_id"), col("sigs").as("sb"))
        .hint("SHUFFLE_HASH"), "old_id")
      .select(col("new_id"), col("old_id"),
        expr("""aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),
                | cast(0 as bigint), (acc, v) -> acc + v) * 1000000 div 12""".stripMargin)
          .as("est_jaccard_micros"))
      .filter(col("est_jaccard_micros") >= 500000L)
  }

  /** Analytic MinHash-LSH parameter planner: for every (bands, rows)
    * factorization of the family's 12-hash signature, the S-curve
    * threshold (1/b)^(1/r) and the candidate-collision probability
    * 1−(1−s^r)^b at reference similarities s ∈ {0.5, 0.7, 0.9} — the
    * table a 100 TB dedup run consults BEFORE building the band index
    * (pick the split whose threshold brackets the target tau), with
    * [[lshStats]] as the empirical after-build complement. Six
    * driver-constant rows, micros-rounded doubles; corpus-independent
    * by design (`dir` unused).
    */
  def lshCurve(s: SparkSession, dir: String): DataFrame = {
    val splits = Seq((1L, 12L), (2L, 6L), (3L, 4L), (4L, 3L), (6L, 2L), (12L, 1L))
    val base = s.createDataFrame(splits).toDF("b", "r")
    def p(sim: String, name: String) =
      expr(s"cast(round((1 - pow(1 - pow($sim, r), b)) * 1000000) as bigint)").as(name)
    base.select(col("b"), col("r"),
      expr("cast(round(pow(1.0 / b, 1.0 / r) * 1000000) as bigint)").as("threshold_micros"),
      p("0.5", "p50_micros"), p("0.7", "p70_micros"), p("0.9", "p90_micros"))
  }

  /** LSH index health: per-band bucket statistics over the MinHash band
    * frame — bucket count, max occupancy, and the candidate-pair mass
    * Σ s·(s−1)/2 each band contributes to the self-join. THE tuning
    * signal for band/row counts: a hot bucket means a band is too
    * coarse (pair mass explodes quadratically in its size), too many
    * singleton buckets means wasted recall. Two grouped counts, both
    * partial-agg friendly; cost is the band frame, never the pairs.
    */
  def lshStats(s: SparkSession, dir: String): DataFrame =
    minhashBands(s, dir)
      .groupBy(col("band_id"), col("band_hash")).agg(count(lit(1)).as("sz"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_bucket"),
        sum(expr("sz * (sz - 1) div 2")).as("cand_pairs"))
      .select(col("band_id").cast("long").as("band_id"),
        col("n_buckets"), col("max_bucket"), col("cand_pairs"))

  /** 128-bit SimHash from md5-derived token bits, pure integer
    * arithmetic (bit b of token t = bit (b mod 4) of hex digit
    * (b div 4) of md5(t) — all 32 digests digits since r13). Emitted as
    * a 128-char bitstring.
    */
  def simhash(s: SparkSession, dir: String): DataFrame =
    // native kernel: the SQL-HOF formulation gets its md5-token array
    // inlined into the 64-position lambda by CollapseProject and
    // recomputes every digest 64x per row
    Graft.documents(s, dir)
      .select(col("doc_id"), call_function("simhash128", col("text")).as("simhash"))

  /** MinHash Jaccard ESTIMATION for LSH candidates: estimated similarity
    * = fraction of agreeing signature components (scaled to micros).
    * The cheap middle step of the classic pipeline — banded candidates →
    * signature-agreement estimate → (optionally) exact verify on the
    * survivors — signatures are 12 longs per doc, so the estimate never
    * touches the original text.
    */
  def minhashJaccardEst(s: SparkSession, dir: String): DataFrame = {
    val sigs = withShingles(s, dir)
      .select(col("doc_id"), call_function("minhash_sigs", col("shingles")).as("sigs"))
    val cand = minhashLsh(s, dir)
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sigs").as("sa"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sigs").as("sb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("""aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),
                | cast(0 as bigint), (acc, v) -> acc + v) * 1000000 div 12""".stripMargin)
          .as("est_jaccard_micros"))
  }

  /** Prefix-filtered Jaccard join (AllPairs-style): same result set as
    * [[ngramJaccard]], but only each doc's canonical-order prefix of
    * length n - ceil(tau*n) + 1 is indexed — if J(A,B) >= tau, the
    * prefixes must share a shingle (pigeonhole on |A∩B| >= ceil(tau*n)).
    * Verification is an exact two-pointer intersection over the sorted
    * shingle arrays (native kernel), so the expensive full inverted
    * index never materializes. THE scale path for set-similarity.
    *
    * Measured tradeoff (sf0.1, local[32]): with this corpus's low
    * shingle doc-frequencies (max 25) the plain inverted-index join is
    * faster (3.3s vs 4.8s) — prefix filtering pays off when hot
    * shingles explode the candidate count, which is exactly the 100 TB
    * web-corpus regime. Both are kept; pick by shingle-frequency skew.
    */
  def jaccardPrefix(s: SparkSession, dir: String, tauMicros: Long = 500000L): DataFrame = {
    // the kernel emits the hashes already sorted — canonical order for
    // the prefix filter AND two-pointer-mergeable for the verify step
    val sorted = withHashedShingles(s, dir)
      .select(col("doc_id"), col("shingles").as("sh_sorted"),
        size(col("shingles")).cast("long").as("n"))
    // tau = 0.5: prefix length = n - ceil(n/2) + 1 (pure integers)
    val pre = sorted.select(col("doc_id"), col("n"),
      explode(expr("slice(sh_sorted, 1, cast(n - ((n + 1) div 2) + 1 as int))")).as("sh"))
      .hint("SHUFFLE_HASH")
    // SHUFFLE_HASH everywhere: the candidate self-join reuses one
    // exchange of the exploded prefix, and the two verify join-backs
    // reuse one exchange of `sorted` hashed by doc_id.
    val cands = pre.as("a").join(pre.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(1000000L) >= col("b.n") * lit(tauMicros) &&
          col("b.n") * lit(1000000L) >= col("a.n") * lit(tauMicros))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cands
      .join(sorted.select(col("doc_id").as("id_a"), col("sh_sorted").as("sa"), col("n").as("na"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sorted.select(col("doc_id").as("id_b"), col("sh_sorted").as("sb"), col("n").as("nb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        call_function("sorted_intersect_count", col("sa"), col("sb")).as("inter"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_micros"))
      .filter(col("jaccard_micros") >= tauMicros)
  }

  /** SimHash near-dup pairs: pigeonhole-banded hamming join. Split the
    * 128-bit signature into 4 bands of 32 — hamming <= 3 guarantees at
    * least one equal band, so candidates come from a band-bucket
    * self-join (never all-pairs), then exact hamming verifies. Widened
    * from 4x16 in r13: 16-bit bands cap at 65k buckets, so past ~10^9
    * docs EVERY bucket is hot and the candidate join goes quadratic
    * (the documented saturation); 32-bit bands give 4.3e9 buckets per
    * band — expected occupancy stays ~1 to ~10^10 docs, and the r<=3
    * pigeonhole over 4 bands is unchanged.
    *
    * INTENTIONAL radius tightening with the width: maxHamming stays 3
    * while the signature doubled, so the normalized near-dup threshold
    * moved 3/64 → 3/128 — a 128-bit signature resolves twice the
    * feature hyperplanes, and holding the ABSOLUTE radius keeps the
    * emitted pairs at the same per-hyperplane disagreement budget
    * (scaling to r=6 would need 7+ bands, and 7×18-bit bands re-enter
    * the 16-bit saturation regime this widening exists to escape).
    * Callers wanting the looser 64-bit-era normalized threshold pass
    * maxHamming explicitly and accept band recall < 1 past r=3.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // bands as INTEGERS from one kernel call, so the hamming verify is
    // xor+bit_count (codegen'd primitive ops), not a 64-step interpreted
    // fold per candidate pair
    val bands = Graft.documents(s, dir)
      .select(col("doc_id"), call_function("simhash_bands", col("text")).as("bl"))
      .select(col("doc_id"), col("bl"),
        posexplode(col("bl")).as(Seq("band_id", "band_long")))
      // shuffle self-join → ReusedExchange → simhash kernel runs once
      .hint("SHUFFLE_HASH")
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_long") === col("b.band_long") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("""cast(bit_count(element_at(a.bl, 1) ^ element_at(b.bl, 1))
                |   + bit_count(element_at(a.bl, 2) ^ element_at(b.bl, 2))
                |   + bit_count(element_at(a.bl, 3) ^ element_at(b.bl, 3))
                |   + bit_count(element_at(a.bl, 4) ^ element_at(b.bl, 4)) as bigint)""".stripMargin)
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup pairs: cosine >= tau. Adaptive routing, the
    * same decision class as a broadcast-vs-shuffle choice: on a small
    * corpus the exact label-block all-pairs join is the cheapest and
    * recall-perfect plan; label blocks grow with the corpus, so above
    * `routeThreshold` vectors the quadratic block join is a measured
    * scale-killer (32-44s alone at 30x sf0.1 vs 4-5s for the LSH twin)
    * and the operator routes to [[embeddingNearDupLsh]] — banded SRP
    * blocking with the SAME exact-cosine >= tau verify, so precision is
    * identical and only band-recall is traded for linear candidate
    * growth. Band recall depends on the pair's cosine: ~0.95 at
    * dup-grade cosines (>= 0.9, where real near-dups live), but only
    * ~0.2-0.45 at this loose default tau = 0.35 (ContractSpec measures
    * 3/14 on the spec corpus) — the routed answer is a strict SUBSET,
    * which is exactly why [[embeddingRouteThreshold]] is a loud pinned
    * contract rather than a silent heuristic. The count that drives the
    * decision is a column-pruned metadata-cheap scan, like the size
    * estimate behind every AQE join pick.
    */
  /** Route threshold for [[embeddingNearDup]]'s auto mode. CONTRACT:
    * the registered `dedup_embedding` query carries an exact all-pairs
    * DuckDB oracle, which is only valid while the verify corpus stays
    * BELOW this bound (above it, auto routes to LSH, whose output is a
    * recall<1 subset of exact). ContractSpec pins the sf0.01 verify
    * corpus under the threshold so a future scale bump fails loudly in
    * the suite instead of silently hash-mismatching.
    */
  val embeddingRouteThreshold: Long = 10000L

  def embeddingNearDup(s: SparkSession, dir: String, tau: Double = 0.35,
                       routeThreshold: Long = embeddingRouteThreshold): DataFrame = {
    // memoized metadata count: parquet footer scan, one job per (dir),
    // not one per DataFrame construction (bench builds each query twice)
    if (Graft.tableRows(s, dir, "embeddings") > routeThreshold)
      return embeddingNearDupLsh(s, dir, tau)
    // norms are per-vector: compute once before the pair join, not per pair
    val e = Graft.embeddings(s, dir).select(
      col("vec_id"), col("label"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** The complete three-stage MinHash dedup pipeline as one query:
    * banded-LSH candidates (cheap, signature-only) → signature-agreement
    * estimate drops clearly-dissimilar pairs (>= estTauMicros) → exact
    * Jaccard verify (primitive two-pointer intersect over hashed
    * shingles) only on the survivors. Each stage's input shrinks by an
    * order of magnitude — the standard shape for dedup at 100 TB, where
    * exact verification of all LSH candidates would dominate.
    */
  def minhashVerified(s: SparkSession, dir: String,
                      estTauMicros: Long = 333333L, tauMicros: Long = 500000L): DataFrame = {
    val survivors = minhashJaccardEst(s, dir)
      .filter(col("est_jaccard_micros") >= estTauMicros)
      .select(col("id_a"), col("id_b"))
    val sorted = withHashedShingles(s, dir)
      .select(col("doc_id"), col("shingles").as("sh_sorted"),
        size(col("shingles")).cast("long").as("n"))
    survivors
      .join(sorted.select(col("doc_id").as("id_a"), col("sh_sorted").as("sa"), col("n").as("na"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sorted.select(col("doc_id").as("id_b"), col("sh_sorted").as("sb"), col("n").as("nb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        call_function("sorted_intersect_count", col("sa"), col("sb")).as("inter"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_micros"))
      .filter(col("jaccard_micros") >= tauMicros)
  }

  /** PPJoin-style frequency-ordered prefix join: identical result set to
    * [[ngramJaccard]]/[[jaccardPrefix]], but each document's prefix is
    * taken in GLOBAL document-frequency order (rarest shingles first),
    * so prefix collisions approach the true result count instead of
    * random-hash collisions. Costs one extra pass to compute shingle
    * document frequencies (map-side-combined) and a re-rank join; pays
    * off when prefix candidates dominate — the hot-shingle / huge-corpus
    * regime. Verification is the same primitive two-pointer intersect
    * over the hash-sorted arrays.
    */
  def jaccardPpjoin(s: SparkSession, dir: String, tauMicros: Long = 500000L): DataFrame = {
    val sorted = withHashedShingles(s, dir)
      .select(col("doc_id"), col("shingles").as("sh_sorted"),
        size(col("shingles")).cast("long").as("n"))
    val occ = sorted.select(col("doc_id"), col("n"), explode(col("sh_sorted")).as("sh"))
      .hint("SHUFFLE_HASH")
    val dfreq = occ.groupBy(col("sh")).agg(count(lit(1)).as("df")).hint("SHUFFLE_HASH")
    // per-doc shingles re-ranked by (df asc, hash asc); prefix length
    // n - ceil(tau*n) + 1 over THIS order (any consistent total order
    // preserves the pigeonhole guarantee). Rank via a window, not
    // collect_list + sort_array: the window sorts streams within the
    // doc_id shuffle instead of materializing a per-doc struct array in
    // aggregation memory (and skew-spills gracefully on huge docs).
    val preW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val pre = occ.join(dfreq, "sh")
      .withColumn("rk", row_number().over(preW))
      .filter(col("rk") <= expr("n - ((n + 1) div 2) + 1"))
      .select(col("doc_id"), col("n"), col("sh"))
      .hint("SHUFFLE_HASH")
    val cands = pre.as("a").join(pre.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(1000000L) >= col("b.n") * lit(tauMicros) &&
          col("b.n") * lit(1000000L) >= col("a.n") * lit(tauMicros))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cands
      .join(sorted.select(col("doc_id").as("id_a"), col("sh_sorted").as("sa"), col("n").as("na"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sorted.select(col("doc_id").as("id_b"), col("sh_sorted").as("sb"), col("n").as("nb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        call_function("sorted_intersect_count", col("sa"), col("sb")).as("inter"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_micros"))
      .filter(col("jaccard_micros") >= tauMicros)
  }

  /** Near-dup clustering: connected components over the n-gram Jaccard
    * pair graph via iterative min-label propagation (Pregel-lite:
    * driver-coordinated rounds, data fully distributed; converges in
    * O(component diameter) rounds — dup clusters are shallow). Each
    * round is one join + partial-agg min; labels localCheckpoint so
    * lineage stays flat. The fixpoint (every doc labeled with its
    * component's min doc_id) is unique, hence deterministic. This is
    * the step that turns pairwise dedup output into keep/drop decisions.
    */
  def clusters(s: SparkSession, dir: String, maxIters: Int = 20): DataFrame =
    clustersOf(s, dir, dupPairs(s, dir), maxIters)

  /** Per-cluster SOURCE purity over the near-dup components — the dedup
    * QUALITY audit: a multi-member cluster whose members span sources is
    * either genuine cross-source duplication (syndication, mirroring —
    * exactly what corpus-level dedup exists to catch) or a blocking
    * false-positive chain; either way purity is the triage signal,
    * read next to `dedup_cluster_sizes`. One row per multi-member
    * cluster: size, majority source (min-struct argmax: count desc,
    * source asc — total order), and its share in exact integer micros.
    * Cost: the [[clusters]] labels (memo-backed pair graph) + one
    * doc_id join against a two-column documents projection + two
    * map-side-combinable aggregates.
    */
  def clusterPurity(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir)
      .join(Graft.documents(s, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("cluster_rep"), col("source"))
      .agg(count(lit(1)).as("ns"))
      .groupBy(col("cluster_rep"))
      .agg(sum(col("ns")).as("n_members"),
        min(struct((-col("ns")).as("neg"), col("source"))).as("top"))
      .filter(col("n_members") >= 2)
      .select(col("cluster_rep"), col("n_members"),
        col("top.source").as("top_source"),
        (-col("top.neg")).as("n_top"),
        expr("(-top.neg) * 1000000 div n_members").as("purity_micros"))

  /** Leakage-safe train/val/test split assignment: the split is drawn
    * from a 48-bit md5 of the near-dup CLUSTER REPRESENTATIVE, not the
    * document — every member of a near-dup cluster lands in the same
    * split, closing the classic evaluation-leakage hole where a test
    * document's near-duplicate sits in train (the failure mode
    * Lee et al.'s dedup work measures). 98/1/1 by mod-100 buckets;
    * stateless and deterministic given the cluster labels, so re-runs
    * and late-arriving shards agree. One projection over the
    * 1-row-per-doc [[clusters]] frame.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir)
      .withColumn("bucket",
        expr(s"${TextAnalysis.hex12ToLong("md5(cast(cluster_rep as string))", "instr")} % 100"))
      .select(col("doc_id"), col("cluster_rep"),
        when(col("bucket") < 98, "train").when(col("bucket") < 99, "val")
          .otherwise("test").as("split"))

  /** Cluster-size histogram: how many near-dup clusters have exactly N
    * members (singletons included — every unclustered doc is its own
    * cluster of 1). The curation QA view of [[clusters]]: a sudden mass
    * at large N means a boilerplate template is eating the corpus. Two
    * map-side-combinable aggregates over the 1-row-per-doc labels.
    */
  def clusterSizes(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir)
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Canonical document per near-dup cluster: keep the longest member
    * (ties → smallest doc_id) — the keep/drop decision a dedup pipeline
    * emits downstream. The argmax is ONE partial-aggregatable max over
    * a (n_chars, -doc_id) struct: no window sort, no self-join; the
    * labels⋈documents join hashes the same doc_id key both sides.
    */
  def canonical(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir)
      .join(Graft.documents(s, dir).select(col("doc_id").as("d_id"), col("n_chars")),
        col("doc_id") === col("d_id"))
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("mx"))
      .select(col("cluster_rep"), (-col("mx.neg_id")).as("canonical_id"),
        col("mx.n_chars").as("canonical_chars"), col("n_docs"))

  /** Duplication rate by source: per source, how many documents are
    * non-canonical exact duplicates — the provenance view a curation
    * report leads with (one feed re-crawling another shows up here
    * before any fuzzy signal). The canonical decision is a semi-join
    * against the hash-group minimum (same rule as [[exact]]); both
    * aggregates map-side combinable.
    */
  def dupRateBySource(s: SparkSession, dir: String): DataFrame = {
    val canon = exact(s, dir).select(col("canonical_id"))
    Graft.documents(s, dir)
      .join(canon.withColumn("is_canon", lit(1L)),
        col("doc_id") === col("canonical_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_canon").isNull, 1L).otherwise(0L)).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        expr("n_dups * 1000000 div n_docs").as("dup_micros"))
  }

  /** Shingle document-frequency histogram (power-of-two buckets): the
    * skew profile that decides WHICH set-similarity variant to run —
    * the engine ships three oracle-identical Jaccard joins
    * (inverted-index / prefix / PPJoin) whose relative cost §5
    * documents as corpus-dependent: broad-shallow df distributions
    * favor the plain inverted index, a heavy df tail is exactly when
    * frequency-ordered prefixes win. This measures that tail. One
    * grouped count over the memoized hashed-shingle frame + the integer
    * log2 bucketing.
    */
  def shingleDfHist(s: SparkSession, dir: String): DataFrame =
    withShingles(s, dir)
      .select(explode(col("shingles")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .groupBy((length(bin(col("df"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_shingles"), max(col("df")).as("max_df"))

  /** b-bit MinHash estimate (b=1, Li & König): keep only the LOWEST BIT
    * of each of the 12 signature components — 32× less signature state
    * than the 48-bit values — and unbias the agreement fraction with
    * Ĵ = 2·A − 1 (unrelated sets agree on a random bit half the time).
    * Exact integer micros; same LSH candidate pairs as
    * [[minhashJaccardEst]], whose full-width estimate the spec compares
    * against. At 100 TB the stored index shrinks from 12×8 B to 12 bits
    * per document — the difference between an in-memory and an on-disk
    * signature table.
    */
  def minhashBbit(s: SparkSession, dir: String): DataFrame = {
    val sigs = withShingles(s, dir)
      .select(col("doc_id"), call_function("minhash_sigs", col("shingles")).as("sigs"))
    minhashLsh(s, dir)
      .join(sigs.select(col("doc_id").as("id_a"), col("sigs").as("sa"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sigs").as("sb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("""aggregate(zip_with(sa, sb, (x, y) -> IF(x % 2 = y % 2, 1, 0)),
                | cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin).as("n_agree"))
      .select(col("id_a"), col("id_b"), col("n_agree"),
        expr("2 * (n_agree * 1000000 div 12) - 1000000").as("est_bbit_micros"))
  }

  /** Corpus novelty: per document, the fraction of its distinct 3-gram
    * shingles FIRST seen in this document (no document with a smaller
    * id contains them) — the marginal-value curve of adding a document
    * to the corpus (near-zero novelty = redundant with what's already
    * there; the acquisition-ordering signal for data buying). First
    * occurrence = min(doc_id) per shingle — one grouped min over the
    * memoized shingle frame, joined back on the shingle key; fraction
    * in exact integer micros.
    */
  def novelty(s: SparkSession, dir: String): DataFrame = {
    // Occurrence counts per (doc, shingle) FIRST: the groupBy is map-side
    // combinable, so this — the only full-width shuffle of the exploded
    // stream — ships one row per distinct (doc, shingle) pair, and a
    // boilerplate shingle repeated within a document collapses before the
    // exchange. The old shape (explode → groupBy(sh) → join the RAW
    // exploded stream back on sh) shuffled the full stream twice and
    // funneled every occurrence of a hot shingle through one join task.
    val occ = withShingles(s, dir)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("cnt"))
    // fs_sh rename breaks the shared expression lineage with occ — without
    // it the self-join condition resolves to a trivially-true sh == sh
    val firstSeen = occ.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
      .select(col("sh").as("fs_sh"), col("first_doc"))
    // Novel occurrences via the COMPOSITE key (sh, doc_id == first_doc):
    // both sides are unique on the pair, so the join is one-to-one and a
    // high-df shingle no longer concentrates on a single key — its lone
    // firstSeen row meets exactly one occ row.
    val novelOcc = occ.join(firstSeen,
      col("sh") === col("fs_sh") && col("doc_id") === col("first_doc"))
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("n_novel"))
    occ.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n_shingles"))
      .join(novelOcc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("coalesce(n_novel, 0) * 1000000 div n_shingles").as("novelty_micros"))
  }

  /** Degree distribution of the near-dup graph: how many documents have
    * exactly N near-duplicates — the graph-health histogram read next
    * to [[clusterSizes]] (a heavy high-degree tail = boilerplate hubs
    * before clustering even runs). Rides the memoized pair frame; two
    * grouped counts, both map-side combinable.
    */
  def degreeDist(s: SparkSession, dir: String): DataFrame = {
    val pairs = dupPairs(s, dir)
    pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
  }

  /** The near-dup pair graph shared by every graph-shaped consumer
    * (clustering, pagerank, triangles): one memoized cached frame per
    * session+directory, so running several of them computes and
    * persists the expensive pair join ONCE (round-5 advice: triangles
    * and pagerank each cached their own copy).
    */
  private def dupPairs(s: SparkSession, dir: String): DataFrame =
    Graft.memoCache("graph_pairs", dir)(
      ngramJaccard(s, dir).select(col("id_a"), col("id_b")))

  /** Adaptive connected components over an (id_a, id_b) pair frame.
    * Small edge sets (bounded by `driverEdgeLimit`, the same kind of
    * size-bounded adaptivity as a broadcast-join decision) run
    * union-find on the driver in one pass; larger graphs fall back to
    * distributed min-label propagation. Both produce the identical
    * unique fixpoint (component min id).
    */
  def clustersOf(s: SparkSession, dir: String, pairs: DataFrame, maxIters: Int = 20,
                 driverEdgeLimit: Long = 1000000L): DataFrame = {
    // a caller may hand us an already-cached shared frame (dupPairs);
    // persist/unpersist only frames this operator owns
    val owned = pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cached =
      if (owned) pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else pairs
    val nEdges = cached.count()
    val out =
      if (nEdges <= driverEdgeLimit) clustersUnionFind(s, dir, cached)
      else clustersPropagate(s, dir, cached, maxIters)
    if (owned) cached.unpersist()
    out
  }

  /** Driver union-find for bounded edge sets: O(E α(E)) in one pass. */
  private def clustersUnionFind(s: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val reps = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => (id, find(id))).toSeq
    import s.implicits._
    val labelDf = reps.toDF("l_id", "label")
    Graft.documents(s, dir).select(col("doc_id"))
      .join(broadcast(labelDf), col("doc_id") === col("l_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_rep"))
  }

  /** Distributed min-label propagation (the unbounded-graph path). */
  private def clustersPropagate(s: SparkSession, dir: String, pairs: DataFrame,
                                maxIters: Int): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // propagate ONLY over vertices touched by an edge: the dup graph is
    // orders of magnitude smaller than the corpus, so iteration cost
    // tracks the pair graph; untouched docs stay identity-labeled via
    // the final left join.
    // one ACTION per round: persist + the convergence aggregate both
    // materializes the iteration and reads its label sum (monotonically
    // decreasing; stable sum == fixpoint). Each parent stays cached, so
    // the growing logical lineage never re-executes.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var labels = edges.select(col("id_a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .persist(lvl)
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("label"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (i < maxIters && !converged) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("nb"), col("label").as("nb_label")),
          col("id_b") === col("nb"))
        .groupBy(col("id_a")).agg(min(col("nb_label")).as("nmin"))
      val next = labels.join(nbrMin, labels("doc_id") === nbrMin("id_a"), "left")
        .select(labels("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist(lvl)
      val sumNow = labelSum(next)
      labels.unpersist()
      converged = sumNow == prevSum
      prevSum = sumNow
      labels = next
      i += 1
    }
    edges.unpersist()
    // truncate the converged frame's iterative lineage before handing it
    // out: each round's frame references the previous generation twice
    // (labels + nbrMin), so recomputing a released-but-held result from
    // raw lineage would cost O(2^rounds) joins. localCheckpoint rewrites
    // it as a flat scan of materialized partitions — after this, losing
    // the cache means rerunning the operator, never a lineage blowup.
    // (On a real cluster with executor churn, point spark.checkpoint.dir
    // at durable storage and use checkpoint() — same shape, reliable.)
    val flatLabels = labels.localCheckpoint(true)
    labels.unpersist(false)
    // the checkpointed frame stays materialized (the returned lazy frame
    // references it); the registry releases it on the next invocation
    Graft.trackCaches("dedup_clusters_labels", flatLabels)
    Graft.documents(s, dir).select(col("doc_id"))
      .join(flatLabels.select(col("doc_id").as("l_id"), col("label")),
        col("doc_id") === col("l_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_rep"))
  }

  /** Passage-level copy detection (MOSS-style): document pairs sharing
    * at least `minShared` winnowing fingerprints — catches copied
    * PASSAGES between otherwise-different documents, where whole-doc
    * Jaccard/minhash only catches globally similar pairs. Fingerprints
    * present in more than `maxDf` documents are dropped first
    * (boilerplate: a corpus-wide header would otherwise pair everything
    * with everything — the df cap keeps the self-join's per-key fan-out
    * bounded, the same reason ppjoin prunes frequent prefixes). The df
    * filter rides a window over the same fp hash partitioning the
    * self-join shuffles on, and both join sides reuse that one exchange.
    */
  def winnowPairs(s: SparkSession, dir: String, minShared: Int = 10, maxDf: Int = 5): DataFrame = {
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val fps = TextAnalysis.winnow(s, dir)
      .withColumn("df", count(lit(1)).over(byFp))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("fp"))
    fps.select(col("doc_id").as("id_a"), col("fp"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")),
        col("fp") === col("fp_b") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Embedding near-dup at scale: banded SRP-LSH blocking. Each vector
    * gets a 4-band sign signature from deterministic hyperplanes
    * (vectors id 8..8+4·nb); candidate pairs must share a label AND one
    * band value, then exact cosine >= tau verifies. Bits per band GROW
    * with the corpus — nb = max(4, ceil(log2(ceil(N/1000)))), derived
    * in pure INTEGER arithmetic (bit-length of ceil(N/1000)−1, no
    * engine-varying float log) so Spark and the oracle can never
    * disagree at a log boundary — which pins expected bucket occupancy
    * near 1000 and keeps the pair count linear in N: the r12 100×
    * measurement showed the old FIXED 4-bit signature going quadratic
    * (3.95 → 39.9s for 3.3× the rows) once buckets saturated, the same
    * failure mode this variant exists to avoid in the plain label block
    * (dedup_embedding, measured 7× at 10×). At the verify scales
    * (N ≤ 20k) nb stays 4–5, so recall sits where the banding math
    * says (~0.99 at cos 0.9); the knob trades recall for cost
    * explicitly as the corpus grows.
    */
  def embeddingNearDupLsh(s: SparkSession, dir: String, tau: Double = 0.35): DataFrame = {
    val e0 = Graft.embeddings(s, dir)
    val nb = e0.agg(greatest(lit(4L),
        length(bin(greatest(expr("(count(1) + 999) div 1000"), lit(1L)) - 1)).cast("long"))
      .as("nb"))
    val planes = e0.crossJoin(broadcast(nb))
      .filter(col("vec_id") >= 8 && col("vec_id") < lit(8) + lit(4) * col("nb"))
      .agg(sort_array(collect_list(struct(col("vec_id").as("pid"), col("embedding").as("pvec"))))
        .as("ps"))
      .select(expr("transform(ps, x -> x.pvec)").as("planes"))
    val bands = e0
      .crossJoin(broadcast(nb))
      .crossJoin(broadcast(planes))
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"),
        posexplode(expr(
          """transform(sequence(0, 3), b ->
            |  aggregate(sequence(1, cast(nb as int)), cast(0 as bigint), (acc, j) ->
            |    acc + IF(fvec_dot(embedding, element_at(planes, cast(nb as int) * b + j)) >= 0,
            |             shiftleft(cast(1 as bigint), cast(nb as int) - j),
            |             cast(0 as bigint))))""".stripMargin))
          .as(Seq("band_id", "band_val")))
      .hint("SHUFFLE_HASH")
    bands.as("a").join(bands.as("b"),
        col("a.label") === col("b.label") &&
          col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .distinct()
  }

  /** LSH-dedup recall evaluation — the ann_recall_eval of the dedup
    * family: band recall is the ONE quantity [[embeddingNearDupLsh]]
    * trades away (precision is exact — every emitted pair passed the
    * cosine verify), and before this report it was only a test log
    * line. Ground truth is the exact label-block route on a BOUNDED
    * id slice (default = [[embeddingRouteThreshold]], exactly the
    * corpus size where the quadratic exact join is still affordable —
    * the standard eval-on-a-slice pattern for production recall
    * monitoring); the evaluated pairs are the FULL production LSH run
    * (adaptive nb from the whole corpus) restricted to the same slice,
    * so the number reported is the recall the deployed banding actually
    * delivers there. One ≤slice² exact block + the linear LSH pass +
    * a pair-keyed left join; output is a single row, so the report
    * costs what its inputs cost at any corpus size.
    */
  def lshRecallEval(s: SparkSession, dir: String, tau: Double = 0.35,
                    sliceBound: Long = embeddingRouteThreshold): DataFrame = {
    val e = Graft.embeddings(s, dir).filter(col("vec_id") < sliceBound)
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
    val exact = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"))
    val lsh = embeddingNearDupLsh(s, dir, tau)
      .filter(col("id_a") < sliceBound && col("id_b") < sliceBound)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    exact.join(lsh, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("n_exact"), col("n_hit"),
        expr("n_hit * 1000000 div nullif(n_exact, 0)").as("recall_micros"))
  }

  /** Chunk-level exact dedup (RefinedWeb-style): the fixed sliding
    * windows from [[Chunking.fixedWindows]] grouped by content hash;
    * groups with >= 2 copies report their copy count and canonical
    * (first) occurrence. Position travels as one encoded long
    * (doc_id << 32 | chunk_id) so the canonical argmin is a plain
    * map-side-combinable min — no struct min, no join-back. chunk_id
    * gets 32 bits (a doc would need ~10^11 chars to overflow); the
    * encoding raises rather than silently colliding into doc_id+1.
    */
  def chunkDedup(s: SparkSession, dir: String): DataFrame =
    Chunking.fixedWindows(s, dir)
      .select(md5(col("chunk")).as("chunk_hash"),
        when(col("chunk_id") >= lit(4294967296L), raise_error(concat(
            lit("chunk_id exceeds 32-bit encoding bound: "), col("chunk_id").cast("string"))))
          .otherwise(shiftleft(col("doc_id"), 32) + col("chunk_id")).as("pos_key"))
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("pos_key")).as("min_key"))
      .filter(col("n_copies") >= 2)
      .select(col("chunk_hash"), col("n_copies"),
        expr("min_key div 4294967296").as("canonical_doc"),
        expr("min_key % 4294967296").as("canonical_chunk"))

  /** Per-document duplication profile: what fraction of a document's
    * chunks also occur in at least one OTHER document — the
    * keep/trim/drop signal of chunk-level dedup pipelines. Formulated as
    * aggregate-then-window so the chunking projection runs ONCE: dedupe
    * to (hash, doc) with per-doc occurrence counts, count docs per hash
    * as an unordered window over the hash partition, roll up per doc. A
    * join-back formulation computes the chunk subtree twice
    * (countDistinct's partial agg blocks ReusedExchange) and shuffles
    * the full instance stream one extra time.
    */
  def docDupFraction(s: SparkSession, dir: String): DataFrame = {
    val dist = Chunking.fixedWindows(s, dir)
      .select(col("doc_id"), md5(col("chunk")).as("h"))
      .groupBy(col("h"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    dist.withColumn("nd", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_chunks"),
        sum(when(col("nd") >= 2, col("n_occ")).otherwise(0L)).as("n_shared_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
        expr("n_shared_chunks * 1000000 div n_chunks").as("dup_frac_micros"))
  }

  /** Overlap-coefficient near-dup pairs: |A ∩ B| / min(|A|, |B|) >= tau
    * over hashed word-3-gram shingle sets — the asymmetric-containment
    * complement of Jaccard (catches a short document embedded inside a
    * long one, which Jaccard's union denominator dilutes away). Same
    * inverted-index candidate pass as [[ngramJaccard]]; size-compat
    * pruning does NOT apply (any size ratio can pass), which is exactly
    * why containment needs the index join rather than size buckets.
    */
  def containment(s: SparkSession, dir: String, tauMicros: Long = 400000L): DataFrame = {
    val sh = withHashedShingles(s, dir)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n"),
        explode(col("shingles")).as("sh"))
      .hint("SHUFFLE_HASH")
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 1000000 div least(na, nb)").as("overlap_micros"))
      .filter(col("overlap_micros") >= tauMicros)
  }

  /** PageRank (2 unrolled iterations, damping 0.85) over the undirected
    * near-dup pair graph — ranks which documents sit at the center of
    * duplication clusters (dedup triage prioritizes high-rank docs).
    * All rank arithmetic is integer micros (contrib = rank div deg,
    * damped sum div 1e6), so iteration results are bit-identical across
    * engines and partitionings. Each iteration is one edges⋈ranks join
    * + one grouped sum, both co-partitioned on the vertex key; the graph
    * is the pair output — orders of magnitude smaller than the corpus.
    */
  def pagerank(s: SparkSession, dir: String, iters: Int = 2): DataFrame = {
    // the pair graph is the memoized shared cache (see [[dupPairs]]);
    // both edge directions come from ONE pass over it (a union of pairs
    // with its own swap would read it twice — cheap now that it's
    // cached, but the single explode also keeps the plan narrow). The
    // iteration-invariant frames (deg, edges⋈deg) are memoized too:
    // every iteration re-references them, and repeated invocations
    // (Bench runs each query twice plus warmup) reuse one generation
    // instead of accumulating cached graphs. The result stays lazy —
    // lint and explain see the real plan via the cached subplans, and
    // callers pay materialization only when they consume it.
    val edges = dupPairs(s, dir).select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val deg = Graft.memoCache("graph_pagerank_deg", dir)(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    // pre-join degrees onto edges once: each iteration then joins ranks
    // against this base and aggregates — one join per iteration, not two
    val srcDeg = Graft.memoCache("graph_pagerank_base", dir)(edges.join(deg, "src"))
    var ranks = deg.select(col("src").as("v"), lit(1000000L).as("rank_micros"))
    for (_ <- 1 to iters) {
      val contribs = srcDeg
        .join(ranks, col("src") === col("v"))
        .select(col("dst"), expr("rank_micros div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = deg.select(col("src").as("v"))
        .join(contribs, col("v") === col("dst"), "left")
        .select(col("v"),
          expr("150000 + (850000 * coalesce(sc, 0)) div 1000000").as("rank_micros"))
    }
    ranks.join(deg, col("v") === col("src"))
      .select(col("v").as("doc_id"), col("deg"), col("rank_micros"))
  }

  /** Triangle count over the undirected near-dup pair graph — the
    * cluster-density signal that separates chained false positives (path
    * components, no triangles) from genuine duplicate groups (cliques,
    * triangle-rich). The id_a < id_b invariant orients every edge, so
    * each triangle {x<y<z} matches exactly once as (x,y)(y,z)(x,z): two
    * equi-joins on the (tiny, pair-bounded) edge frame, no direction
    * explosion, no global sort. The pair frame is the memoized shared
    * cache ([[dupPairs]]) — its three references here, and any sibling
    * graph operator in the same session, read one persisted copy.
    */
  def triangles(s: SparkSession, dir: String): DataFrame =
    trianglesOf(dupPairs(s, dir))

  /** Triangle count over an oriented (id_a < id_b) pair frame. */
  def trianglesOf(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .join(pairs.select(col("id_a").as("b2"), col("id_b").as("c")),
        col("b") === col("b2"))
      .join(pairs.select(col("id_a").as("a3"), col("id_b").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Fuzzy name dedup (entity-resolution canonicalization): near-match
    * pairs in the part-NAME dictionary by edit distance <= 3, blocked on
    * the last token. The aggregation to distinct names runs FIRST — the
    * quadratic fuzzy compare happens on the dictionary (vocabulary-
    * sized, sublinear in corpus rows), never on the raw table; per-name
    * occurrence counts ride along so a canonicalization decision can
    * weigh support. Blocking bounds candidates per block; levenshtein is
    * Spark-native codegen (and portable: DuckDB's levenshtein agrees).
    */
  def fuzzyNames(s: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val names = Graft.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      .hint("SHUFFLE_HASH")
    names.select(col("p_name").as("name_a"), col("n_parts").as("n_a"), col("blk"))
      .join(names.select(col("p_name").as("name_b"), col("n_parts").as("n_b"),
          col("blk").as("blk_b")),
        col("blk") === col("blk_b") && col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_a"), col("n_b"))
  }

  /** Exact duplicated-substring detection at k-gram granularity (the
    * Lee et al. "Deduplicating Training Data Makes Language Models
    * Better" ExactSubstr pass, re-expressed for Spark): every position
    * whose k-token window also occurs in ANOTHER document is a
    * duplicated position; per document this reports total positions,
    * duplicated positions, and the duplicated fraction. Unlike
    * [[Dedup.winnow]]/`dedup_winnow_pairs` (which SAMPLE fingerprints
    * for candidate pairs) this is exhaustive over positions — the pass
    * a training pipeline runs to CUT duplicated spans, not just to
    * flag document pairs.
    *
    * Plan: one codegen'd projection explodes the k-gram stream, then
    * three map-side-combinable exchanges — (doc_id, gram) count, a
    * count-over-gram window for the cross-doc document frequency
    * (window, not a self-join: no recompute of the gram subtree), and
    * the final per-doc rollup. Everything is linear in corpus positions;
    * there is no pair join, so boilerplate mega-df grams cost one
    * window partition, never a quadratic candidate set.
    *
    * Shuffle-key choice — MEASURED, r18 (substr ScaleProbe,
    * docs/bench_r18_substr_hashkey.md): replacing the ~50-byte gram
    * string with the 16-byte 128-bit [[gramId]] hash cuts the
    * compressed exchange volume 1.44×/1.56×/1.68× at 10×/30×/100× (LZ4
    * shuffle compression already squeezes repetitive gram text, so the
    * raw 3–4× key-width cut lands much smaller on the wire) — but LOCAL
    * wall time is 10% (30×) to 44% (100×) SLOWER: two xxhash64 passes
    * over every gram plus struct-key hash-aggregation cost more than
    * the bytes save when shuffle is memory/local-disk-bound. The STRING
    * key is therefore the default; [[substringDupHashKeyed]] is the
    * deployment variant for network-bound fleets where exchange bytes,
    * not CPU, are the binding constraint — equality of the two routes
    * is spec-pinned (2⁻¹²⁸ collision bound).
    */
  def substringDup(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    substringDupBy(s, dir, k, identity)

  /** The alternative gram shuffle key: a 128-bit composite hash of the
    * gram string (two independently seeded xxhash64 lanes), computed
    * INSIDE the explode projection so the string itself never enters an
    * exchange. See [[substringDup]] for the measured trade.
    */
  private[graft] def gramId(gram: Column): Column =
    struct(xxhash64(gram).as("h1"), xxhash64(gram, lit(1L)).as("h2"))

  /** Hash-keyed route of [[substringDup]] — the network-bound-fleet
    * variant (1.7× fewer exchange bytes at 100×, slower locally).
    */
  private[graft] def substringDupHashKeyed(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    substringDupBy(s, dir, k, gramId)

  private def substringDupBy(s: SparkSession, dir: String, k: Int,
                             key: Column => Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    Graft.documents(s, dir)
      .select(col("doc_id"), expr("split(lower(text), '\\\\s+')").as("toks"))
      .filter(expr(s"size(toks) >= $k"))
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${k - 1}), j -> " +
          s"array_join(slice(toks, j, $k), ' '))")).as("gram"))
      .select(col("doc_id"), key(col("gram")).as("gid"))
      .groupBy(col("doc_id"), col("gid"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_docs", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000000 div n_grams").as("dup_frac_micros"))
  }

  /** The CUT half of [[substringDup]]'s account: REWRITE each document
    * with its cross-doc duplicated spans removed, keeping the one
    * canonical first occurrence (min (doc_id, pos) over the gram's
    * occurrences — the Lee et al. ExactSubstr removal rule at k-gram
    * granularity). A token is cut when ANY duplicated non-keeper
    * k-window covers it; the retained text is the surviving tokens in
    * order, emitted with the removal count for audit. A fully
    * duplicated non-canonical document loses every token and drops out
    * of the output — exactly the dedup decision.
    *
    * Plan: the gram stream feeds one (gram) aggregate for the global
    * df + keeper pick, a gram-keyed join marks removed positions, an
    * 8-way position explode + distinct turns spans into cut token
    * indices, and one anti join + per-doc ordered fold rebuilds the
    * text. Every exchange keys on corpus-scaling (gram / (doc, idx) /
    * doc) columns and combines map-side; per-doc state is bounded by
    * document length. The gram exchanges default to the string key
    * (the measured local winner — see [[substringDup]]'s trade note;
    * [[substringCutHashKeyed]] is the network-bound variant on the
    * 16-byte [[gramId]]); the keeper is `min(struct(doc_id, pos))` — a
    * total order with no document-length bound (the r17 doc_id·10⁶ +
    * pos encoding silently mis-picked past 10⁶ token positions; the
    * struct-min is scale-independent and the DuckDB oracle mirrors it
    * with the same lexicographic struct min).
    */
  def substringCut(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    substringCutBy(s, dir, k, identity)

  /** Hash-keyed route of [[substringCut]] — the network-bound variant. */
  private[graft] def substringCutHashKeyed(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    substringCutBy(s, dir, k, gramId)

  private def substringCutBy(s: SparkSession, dir: String, k: Int,
                             key: Column => Column): DataFrame = {
    val toks = Graft.documents(s, dir)
      .select(col("doc_id"), expr("split(lower(text), '\\\\s+')").as("toks"))
    val grams = toks.filter(expr(s"size(toks) >= $k"))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, size(toks) - ${k - 1}), j -> " +
          s"array_join(slice(toks, j, $k), ' '))")).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        key(col("gram")).as("gid"))
    val gi = grams.groupBy(col("gid"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("pos"))).as("keeper"))
    val remtok = grams.join(gi, "gid")
      .filter(col("n_docs") >= 2 &&
        struct(col("doc_id"), col("pos")) =!= col("keeper"))
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("idx"))
      .distinct()
    toks
      .select(col("doc_id"), expr("cast(size(toks) as bigint)").as("n"),
        posexplode(col("toks")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("idx"), col("tok"), col("n"))
      .join(remtok, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_kept"),
        expr("array_join(transform(sort_array(collect_list(struct(idx, tok))), x -> x.tok), ' ')")
          .as("retained_text"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).as("n_removed"), col("retained_text"))
  }

  /** Benchmark decontamination at 13-gram granularity (the GPT-3
    * appendix-C / Lee et al. hygiene pass every training pipeline runs
    * before release): a training document is CONTAMINATED at a position
    * when its 13-token window also occurs in the held-out evaluation
    * set; per training doc this reports total positions, contaminated
    * positions, and the flag. This is the EXHAUSTIVE position-level
    * complement of the keyed `text_decontam`/`text_contam_frac`
    * (TextAnalysis.decontaminate), which test winnowing-SAMPLED
    * fingerprints — the same exhaustive-vs-sampled split the dedup
    * family draws between [[substringDup]] and `dedup_winnow_pairs`:
    * sampling can miss a short verbatim span between fingerprint
    * picks; the position account cannot, and it names the exact spans
    * to cut rather than a document-level score. The eval set here is the deterministic
    * `doc_id % evalMod == 0` slice — the stand-in for a benchmark
    * suite, which in production is just another documents table unioned
    * in with a marker column.
    *
    * Plan — [[substringDup]]'s single-scan shape with the eval census
    * in the window: one codegen'd 13-gram explode carrying the eval
    * flag, the per-gram eval-occurrence count as a sum-over-gram window
    * (ONE corpus-scaling exchange; the string key is the measured local
    * winner — see [[substringDup]]'s trade note, [[gramId]] is the
    * network-bound alternative), then the per-doc rollup over training
    * rows only. No pair join, no second corpus scan: eval-side and
    * train-side ride the same gram stream.
    */
  def decontaminate(s: SparkSession, dir: String, k: Int = 13,
                    evalMod: Long = 50L): DataFrame = {
    val d = Graft.documents(s, dir)
    decontaminateAgainst(
      d.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0L),
      d.filter(pmod(col("doc_id"), lit(evalMod)) === 0L), k)
  }

  /** The production entry point: training docs vs an EXPLICIT benchmark
    * table (both (doc_id, text, ...) frames) — what a deployment calls
    * with its real eval suites; the keyed query above is this core with
    * the deterministic id-slice standing in for the benchmark table.
    * Id collisions across the two frames are harmless: the eval side
    * contributes only its gram census, never output rows.
    */
  def decontaminateAgainst(train: DataFrame, evalDocs: DataFrame,
                           k: Int = 13): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    contaminationGrams(train, evalDocs, k)
      .withColumn("n_eval", sum(when(col("ev"), 1L).otherwise(0L)).over(w))
      .filter(!col("ev"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_eval") > 0, 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated") > 0).cast("long").as("contaminated"))
  }

  /** Shared single-scan gram stream of both decontamination ops:
    * (doc_id, pos, gid, ev) over the union of training and eval docs.
    */
  private def contaminationGrams(train: DataFrame, evalDocs: DataFrame,
                                 k: Int): DataFrame =
    train.select(col("doc_id"), col("text"), lit(false).as("ev"))
      .unionByName(evalDocs.select(col("doc_id"), col("text"), lit(true).as("ev")))
      .select(col("doc_id"), col("ev"), expr("split(lower(text), '\\\\s+')").as("toks"))
      .filter(expr(s"size(toks) >= $k"))
      .select(col("doc_id"), col("ev"),
        posexplode(expr(s"transform(sequence(1, size(toks) - ${k - 1}), j -> " +
          s"array_join(slice(toks, j, $k), ' '))")).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("gram").as("gid"), col("ev"))

  /** The CUT half of [[decontaminate]]'s account — REWRITE each
    * training document with its benchmark-contaminated spans removed
    * (the decontamination action Lee et al. actually apply: span
    * excision, not document dropping — a single leaked 13-gram should
    * not cost an otherwise-clean million-token document). A training
    * token is cut when ANY of its covering 13-windows also occurs in
    * the eval slice; eval documents themselves are never rewritten (or
    * reported). Output mirrors [[substringCut]]: per training doc the
    * token count, removed count and retained text, with fully
    * contaminated documents dropping out.
    *
    * Plan: [[decontaminate]]'s single-scan gram stream with the eval
    * census in the window, then [[substringCut]]'s span machinery —
    * contaminated positions explode to covered token indices, distinct,
    * one anti join + per-doc ordered fold rebuilds the text. Every
    * exchange keys on corpus-scaling (gram / (doc, idx) / doc) columns.
    */
  def decontaminateCut(s: SparkSession, dir: String, k: Int = 13,
                       evalMod: Long = 50L): DataFrame = {
    val d = Graft.documents(s, dir)
    decontaminateCutAgainst(
      d.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0L),
      d.filter(pmod(col("doc_id"), lit(evalMod)) === 0L), k)
  }

  /** Production entry point of the CUT — see [[decontaminateAgainst]]. */
  def decontaminateCutAgainst(train: DataFrame, evalDocs: DataFrame,
                              k: Int = 13): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    val remtok = contaminationGrams(train, evalDocs, k)
      .withColumn("n_eval", sum(when(col("ev"), 1L).otherwise(0L)).over(w))
      .filter(!col("ev") && col("n_eval") > 0)
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("idx"))
      .distinct()
    train
      .select(col("doc_id"), expr("split(lower(text), '\\\\s+')").as("toks"))
      .select(col("doc_id"), expr("cast(size(toks) as bigint)").as("n"),
        posexplode(col("toks")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("idx"), col("tok"), col("n"))
      .join(remtok, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_kept"),
        expr("array_join(transform(sort_array(collect_list(struct(idx, tok))), x -> x.tok), ' ')")
          .as("retained_text"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).as("n_removed"), col("retained_text"))
  }

  private val duckShingles =
    """t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
      |      WHERE len(string_split_regex(text, '\s+')) >= 3),
      |sar AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM t)""".stripMargin

  /** Shared minhash sig/bands CTE chain (assumes `sar` from
    * [[duckShingles]]); ends in `bands` = (doc_id, band_id, band_hash).
    */
  private lazy val duckMinhashBands =
    s"""sig AS (SELECT doc_id,
       |  list_reduce(
       |    list_transform(
       |      list_transform(list_transform(shingles, g -> md5(g)), h -> ${hexToLong("h", "strpos")}),
       |      v -> list_transform(range(0, 12),
       |             p -> ((16385 + 77 * p) * v + 52361 + 9199 * p) % 1000000007)),
       |    (a, b) -> list_transform(range(1, 13), i -> least(a[i], b[i]))) AS sigs
       |  FROM sar),
       |bands AS (SELECT doc_id, b AS band_id,
       |           concat_ws('|', sigs[3*b + 1], sigs[3*b + 2], sigs[3*b + 3]) AS band_hash
       |          FROM sig, range(0, 4) t(b))""".stripMargin

  /** Shared connected-components CTE chain (needs WITH RECURSIVE): 3-gram
    * Jaccard >= 0.5 pairs → transitive closure → `cl` = (doc_id,
    * cluster_rep) with singletons identity-labeled. Mirrors [[clusters]].
    */
  private lazy val duckClusterRep =
    s"""$duckShingles,
       |sh2 AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
       |pp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |       FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pr AS (SELECT id_a, id_b
       |       FROM pp JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       |       WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000),
       |und AS (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
       |reach(a, b) AS (SELECT a, b FROM und
       |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE u.b != r.a),
       |rep AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_rep FROM reach GROUP BY a),
       |cl AS (SELECT d.doc_id, coalesce(rep.cluster_rep, d.doc_id) AS cluster_rep
       |       FROM documents d LEFT JOIN rep ON d.doc_id = rep.doc_id)""".stripMargin

  private val duckFixedChunks =
    """fw0 AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |fw1 AS (SELECT doc_id, toks,
      |        greatest(CAST(ceil(CAST(len(toks) - 32 AS DOUBLE) / 24) AS INT), 0) AS extra
      |      FROM fw0),
      |fw AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |  array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk
      | FROM (SELECT doc_id, toks, unnest(range(0, extra + 1)) AS i FROM fw1))""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_substring" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, array_to_string(toks[j:j+7], ' ') AS gram
        |      FROM t, unnest(range(1, len(toks) - 6)) u(j) WHERE len(toks) >= 8),
        |dg AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
        |nd AS (SELECT gram, count(*) AS n_docs FROM dg GROUP BY 1),
        |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup
        |        FROM dg JOIN nd USING (gram) GROUP BY 1)
        |SELECT doc_id, n_grams, n_dup, n_dup * 1000000 // n_grams AS dup_frac_micros
        |FROM per""".stripMargin,
    "dedup_decontaminate_cut" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(j AS BIGINT) AS pos,
        |        array_to_string(toks[j:j+12], ' ') AS gram
        |      FROM t, unnest(range(1, len(toks) - 11)) u(j) WHERE len(toks) >= 13),
        |ge AS (SELECT doc_id, pos,
        |        CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
        |             OVER (PARTITION BY gram) AS BIGINT) AS n_eval
        |       FROM g),
        |rem AS (SELECT doc_id, pos FROM ge WHERE doc_id % 50 != 0 AND n_eval > 0),
        |remtok AS (SELECT DISTINCT doc_id, pos + o AS idx
        |           FROM rem, unnest(range(0, 13)) v(o)),
        |tok AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, toks[i] AS tok,
        |         CAST(len(toks) AS BIGINT) AS n
        |        FROM t, unnest(range(1, len(toks) + 1)) w(i)
        |        WHERE doc_id % 50 != 0),
        |kept AS (SELECT kk.doc_id, kk.idx, kk.tok, kk.n FROM tok kk
        |         ANTI JOIN remtok r ON kk.doc_id = r.doc_id AND kk.idx = r.idx),
        |agg AS (SELECT doc_id, max(n) AS n_tokens, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY idx) AS retained_text
        |        FROM kept GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_tokens - n_kept AS BIGINT) AS n_removed, retained_text
        |FROM agg""".stripMargin,
    "dedup_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, array_to_string(toks[j:j+12], ' ') AS gram
        |      FROM t, unnest(range(1, len(toks) - 11)) u(j) WHERE len(toks) >= 13),
        |ge AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
        |             OVER (PARTITION BY gram) AS BIGINT) AS n_eval
        |       FROM g),
        |tr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |        CAST(sum(CASE WHEN n_eval > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |       FROM ge WHERE doc_id % 50 != 0 GROUP BY 1)
        |SELECT doc_id, n_grams, n_contaminated,
        | CAST(n_contaminated > 0 AS BIGINT) AS contaminated FROM tr""".stripMargin,
    "dedup_substring_cut" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(j AS BIGINT) AS pos,
        |        array_to_string(toks[j:j+7], ' ') AS gram
        |      FROM t, unnest(range(1, len(toks) - 6)) u(j) WHERE len(toks) >= 8),
        |gi AS (SELECT gram, count(DISTINCT doc_id) AS n_docs,
        |        min({'d': doc_id, 'p': pos}) AS keeper FROM g GROUP BY 1),
        |rem AS (SELECT doc_id, pos FROM g JOIN gi USING (gram)
        |        WHERE n_docs >= 2 AND {'d': doc_id, 'p': pos} != keeper),
        |remtok AS (SELECT DISTINCT doc_id, pos + o AS idx
        |           FROM rem, unnest(range(0, 8)) v(o)),
        |tok AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, toks[i] AS tok,
        |         CAST(len(toks) AS BIGINT) AS n
        |        FROM t, unnest(range(1, len(toks) + 1)) w(i)),
        |kept AS (SELECT kk.doc_id, kk.idx, kk.tok, kk.n FROM tok kk
        |         ANTI JOIN remtok r ON kk.doc_id = r.doc_id AND kk.idx = r.idx),
        |agg AS (SELECT doc_id, max(n) AS n_tokens, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY idx) AS retained_text
        |        FROM kept GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_tokens - n_kept AS BIGINT) AS n_removed, retained_text
        |FROM agg""".stripMargin,
    "dedup_lsh_curve" ->
      """WITH br AS (SELECT * FROM (VALUES (1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1))
        |  AS t(b, r))
        |SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
        | CAST(round(power(1.0 / b, 1.0 / r) * 1000000) AS BIGINT) AS threshold_micros,
        | CAST(round((1 - power(1 - power(0.5, r), b)) * 1000000) AS BIGINT) AS p50_micros,
        | CAST(round((1 - power(1 - power(0.7, r), b)) * 1000000) AS BIGINT) AS p70_micros,
        | CAST(round((1 - power(1 - power(0.9, r), b)) * 1000000) AS BIGINT) AS p90_micros
        |FROM br""".stripMargin,
    "graph_triangles" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |  WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000)
         |SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |FROM pairs e1 JOIN pairs e2 ON e1.id_b = e2.id_a
         | JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b""".stripMargin,
    "dedup_fuzzy_names" ->
      """WITH n AS (SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1),
        |b AS (SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, b2.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b2.p_name) AS BIGINT) AS dist,
        | a.n_parts AS n_a, b2.n_parts AS n_b
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.p_name < b2.p_name
        |WHERE levenshtein(a.p_name, b2.p_name) <= 3""".stripMargin,
    "graph_pagerank" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |  WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000),
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS rank_micros FROM d),
         |c1 AS (SELECT dst, CAST(sum(rank_micros // deg) AS BIGINT) AS sc
         |       FROM e JOIN d USING (src) JOIN r0 ON src = v GROUP BY 1),
         |r1 AS (SELECT d.src AS v,
         |        150000 + (850000 * coalesce(sc, 0)) // 1000000 AS rank_micros
         |       FROM d LEFT JOIN c1 ON d.src = c1.dst),
         |c2 AS (SELECT dst, CAST(sum(rank_micros // deg) AS BIGINT) AS sc
         |       FROM e JOIN d USING (src) JOIN r1 ON src = v GROUP BY 1),
         |r2 AS (SELECT d.src AS v,
         |        150000 + (850000 * coalesce(sc, 0)) // 1000000 AS rank_micros
         |       FROM d LEFT JOIN c2 ON d.src = c2.dst)
         |SELECT v AS doc_id, deg, rank_micros FROM r2 JOIN d ON v = d.src""".stripMargin,
    "chunk_dedup" ->
      s"""WITH $duckFixedChunks,
         |g AS (SELECT md5(chunk) AS chunk_hash, count(*) AS n_copies,
         |        min(doc_id * 4294967296 + chunk_id) AS min_key
         |      FROM fw GROUP BY 1)
         |SELECT chunk_hash, n_copies, CAST(min_key // 4294967296 AS BIGINT) AS canonical_doc,
         | CAST(min_key % 4294967296 AS BIGINT) AS canonical_chunk
         |FROM g WHERE n_copies >= 2""".stripMargin,
    "doc_dup_fraction" ->
      s"""WITH $duckFixedChunks,
         |ch AS (SELECT doc_id, md5(chunk) AS h FROM fw),
         |g AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
         |SELECT doc_id, count(*) AS n_chunks,
         | CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
         | CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |   // count(*) AS dup_frac_micros
         |FROM ch JOIN g ON ch.h = g.h
         |GROUP BY doc_id""".stripMargin,
    "dedup_containment" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, inter * 1000000 // least(x.n, y.n) AS overlap_micros
         |FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |WHERE inter * 1000000 // least(x.n, y.n) >= 400000""".stripMargin,
    "dedup_exact" ->
      """SELECT sha256(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |  string_split_regex(lower(text), '\s+'))), ' ')) AS fp,
        | min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, inter * 1000000 // (x.n + y.n - inter) AS jaccard_micros
         |FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000""".stripMargin,
    "dedup_minhash_est" ->
      s"""WITH $duckShingles,
         |sig AS (SELECT doc_id,
         |  list_reduce(
         |    list_transform(
         |      list_transform(list_transform(shingles, g -> md5(g)), h -> ${hexToLong("h", "strpos")}),
         |      v -> list_transform(range(0, 12),
         |             p -> ((16385 + 77 * p) * v + 52361 + 9199 * p) % 1000000007)),
         |    (a, b) -> list_transform(range(1, 13), i -> least(a[i], b[i]))) AS sigs
         |  FROM sar),
         |bands AS (SELECT doc_id, b AS band_id,
         |           CAST(sigs[3*b + 1] AS VARCHAR) || '|' || CAST(sigs[3*b + 2] AS VARCHAR)
         |            || '|' || CAST(sigs[3*b + 3] AS VARCHAR) AS band_hash
         |          FROM sig, range(0, 4) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         | CAST(list_sum(list_transform(range(1, 13),
         |   i -> CASE WHEN x.sigs[i] = y.sigs[i] THEN 1 ELSE 0 END)) * 1000000 // 12
         |  AS BIGINT) AS est_jaccard_micros
         |FROM cand JOIN sig x ON x.doc_id = id_a JOIN sig y ON y.doc_id = id_b""".stripMargin,
    "dedup_minhash_verified" ->
      s"""WITH $duckShingles,
         |sig AS (SELECT doc_id,
         |  list_reduce(
         |    list_transform(
         |      list_transform(list_transform(shingles, g -> md5(g)), h -> ${hexToLong("h", "strpos")}),
         |      v -> list_transform(range(0, 12),
         |             p -> ((16385 + 77 * p) * v + 52361 + 9199 * p) % 1000000007)),
         |    (a, b) -> list_transform(range(1, 13), i -> least(a[i], b[i]))) AS sigs
         |  FROM sar),
         |bands AS (SELECT doc_id, b AS band_id,
         |           CAST(sigs[3*b + 1] AS VARCHAR) || '|' || CAST(sigs[3*b + 2] AS VARCHAR)
         |            || '|' || CAST(sigs[3*b + 3] AS VARCHAR) AS band_hash
         |          FROM sig, range(0, 4) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         |sv AS (SELECT id_a, id_b FROM cand JOIN sig x ON x.doc_id = id_a
         |       JOIN sig y ON y.doc_id = id_b
         |       WHERE CAST(list_sum(list_transform(range(1, 13),
         |         i -> CASE WHEN x.sigs[i] = y.sigs[i] THEN 1 ELSE 0 END)) * 1000000 // 12
         |        AS BIGINT) >= 333333),
         |sh2 AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT sv.id_a, sv.id_b,
         | inter * 1000000 // (x.n + y.n - inter) AS jaccard_micros
         |FROM sv JOIN p ON sv.id_a = p.id_a AND sv.id_b = p.id_b
         | JOIN sz x ON x.doc_id = sv.id_a JOIN sz y ON y.doc_id = sv.id_b
         |WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000""".stripMargin,
    // same result set as dedup_ngram_jaccard — the prefix filter is an
    // exactness-preserving candidate pruning, so the oracle is identical
    "dedup_jaccard_prefix" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, inter * 1000000 // (x.n + y.n - inter) AS jaccard_micros
         |FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000""".stripMargin,
    // same result set again: frequency-ordered prefixes are still an
    // exactness-preserving candidate pruning
    "dedup_jaccard_ppjoin" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, inter * 1000000 // (x.n + y.n - inter) AS jaccard_micros
         |FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $duckShingles,
         |$duckMinhashBands
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id""".stripMargin,
    "dedup_source_rate" ->
      """WITH c AS (SELECT min(doc_id) AS canonical_id FROM documents GROUP BY sha256(text))
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN doc_id IN (SELECT canonical_id FROM c)
        |   THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
        | CAST(sum(CASE WHEN doc_id IN (SELECT canonical_id FROM c)
        |   THEN 0 ELSE 1 END) AS BIGINT) * 1000000 // count(*) AS dup_micros
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_shingle_df" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |d AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM s GROUP BY 1)
         |SELECT CAST(length(printf('%b', df)) - 1 AS BIGINT) AS bucket,
         | count(*) AS n_shingles, CAST(max(df) AS BIGINT) AS max_df
         |FROM d GROUP BY 1""".stripMargin,
    "dedup_minhash_bbit" ->
      s"""WITH $duckShingles,
         |$duckMinhashBands,
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         |ag AS (SELECT id_a, id_b,
         |  CAST(list_sum(list_transform(range(1, 13),
         |    i -> CASE WHEN x.sigs[i] % 2 = y.sigs[i] % 2 THEN 1 ELSE 0 END)) AS BIGINT) AS n_agree
         | FROM cand JOIN sig x ON x.doc_id = id_a JOIN sig y ON y.doc_id = id_b)
         |SELECT id_a, id_b, n_agree,
         | 2 * (n_agree * 1000000 // 12) - 1000000 AS est_bbit_micros
         |FROM ag""".stripMargin,
    "text_novelty" ->
      s"""WITH $duckShingles,
         |sh AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |fs AS (SELECT sh, CAST(min(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_shingles,
         | CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         | CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |   * 1000000 // count(*) AS novelty_micros
         |FROM sh JOIN fs ON sh.sh = fs.sh
         |GROUP BY 1""".stripMargin,
    "graph_degree_dist" ->
      s"""WITH $duckShingles,
         |s AS (SELECT doc_id, unnest(shingles) AS sh FROM sar),
         |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |  WHERE inter * 1000000 // (x.n + y.n - inter) >= 500000),
         |e AS (SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs),
         |d AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY 1)
         |SELECT degree, count(*) AS n_docs FROM d GROUP BY 1""".stripMargin,
    "dedup_incremental" ->
      s"""WITH $duckShingles,
         |$duckMinhashBands,
         |cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         | FROM bands n JOIN bands o
         |  ON n.band_id = o.band_id AND n.band_hash = o.band_hash
         | WHERE n.doc_id >= 450 AND o.doc_id < 450),
         |est AS (SELECT new_id, old_id,
         |  CAST(list_sum(list_transform(range(1, 13),
         |    i -> CASE WHEN a.sigs[i] = b.sigs[i] THEN 1 ELSE 0 END)) AS BIGINT)
         |   * 1000000 // 12 AS est_jaccard_micros
         | FROM cand JOIN sig a ON new_id = a.doc_id JOIN sig b ON old_id = b.doc_id)
         |SELECT new_id, old_id, est_jaccard_micros FROM est
         |WHERE est_jaccard_micros >= 500000""".stripMargin,
    "dedup_lsh_stats" ->
      s"""WITH $duckShingles,
         |$duckMinhashBands,
         |bs AS (SELECT band_id, band_hash, CAST(count(*) AS BIGINT) AS sz
         |       FROM bands GROUP BY 1, 2)
         |SELECT CAST(band_id AS BIGINT) AS band_id, count(*) AS n_buckets,
         | CAST(max(sz) AS BIGINT) AS max_bucket,
         | CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
         |FROM bs GROUP BY 1""".stripMargin,
    "dedup_simhash" ->
      """WITH h AS (SELECT doc_id,
        |  list_transform(string_split_regex(text, '\s+'), t -> md5(t)) AS hs FROM documents)
        |SELECT doc_id, array_to_string(list_transform(range(0, 128), b ->
        |  CASE WHEN list_sum(list_transform(hs, h ->
        |    CASE WHEN ((strpos('0123456789abcdef', substring(h, (b // 4) + 1, 1)) - 1)
        |        // (CASE WHEN b % 4 = 0 THEN 1 WHEN b % 4 = 1 THEN 2
        |             WHEN b % 4 = 2 THEN 4 ELSE 8 END)) % 2 = 1
        |      THEN 1 ELSE -1 END)) >= 0
        |  THEN '1' ELSE '0' END), '') AS simhash
        |FROM h""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH h AS (SELECT doc_id,
        |  list_transform(string_split_regex(text, '\s+'), t -> md5(t)) AS hs FROM documents),
        |sh AS (SELECT doc_id, array_to_string(list_transform(range(0, 128), b ->
        |  CASE WHEN list_sum(list_transform(hs, h ->
        |    CASE WHEN ((strpos('0123456789abcdef', substring(h, (b // 4) + 1, 1)) - 1)
        |        // (CASE WHEN b % 4 = 0 THEN 1 WHEN b % 4 = 1 THEN 2
        |             WHEN b % 4 = 2 THEN 4 ELSE 8 END)) % 2 = 1
        |      THEN 1 ELSE -1 END)) >= 0
        |  THEN '1' ELSE '0' END), '') AS simhash
        |FROM h),
        |bl AS (SELECT doc_id, list_transform(range(0, 4),
        |         b -> CAST(list_sum(list_transform(range(1, 33), i ->
        |           CASE WHEN substring(simhash, 32 * b + i, 1) = '1'
        |           THEN (1::BIGINT << (32 - i)) ELSE 0 END)) AS BIGINT)) AS bands
        |       FROM sh),
        |bands AS (SELECT doc_id, bands AS bl, b AS band_id, bands[b + 1] AS band_long
        |          FROM bl, range(0, 4) t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |          CAST(bit_count(xor(a.bl[1], b.bl[1])) + bit_count(xor(a.bl[2], b.bl[2]))
        |             + bit_count(xor(a.bl[3], b.bl[3])) + bit_count(xor(a.bl[4], b.bl[4]))
        |           AS BIGINT) AS hamming
        |         FROM bands a JOIN bands b
        |           ON a.band_id = b.band_id AND a.band_long = b.band_long
        |          AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $duckClusterRep
         |SELECT doc_id, cluster_rep FROM cl""".stripMargin,
    "split_assign" ->
      s"""WITH RECURSIVE $duckClusterRep,
         |b AS (SELECT doc_id, cluster_rep,
         |  ${TextAnalysis.hex12ToLong("md5(CAST(cluster_rep AS VARCHAR))", "strpos")} % 100
         |    AS bucket FROM cl)
         |SELECT doc_id, cluster_rep,
         | CASE WHEN bucket < 98 THEN 'train' WHEN bucket < 99 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM b""".stripMargin,
    "dedup_cluster_purity" ->
      s"""WITH RECURSIVE $duckClusterRep,
         |cs AS (SELECT cl.cluster_rep, d.source, CAST(count(*) AS BIGINT) AS ns
         |       FROM cl JOIN documents d ON cl.doc_id = d.doc_id GROUP BY 1, 2),
         |r AS (SELECT cluster_rep, source, ns,
         |        row_number() OVER (PARTITION BY cluster_rep
         |          ORDER BY ns DESC, source) AS rn,
         |        CAST(sum(ns) OVER (PARTITION BY cluster_rep) AS BIGINT) AS n_members
         |      FROM cs)
         |SELECT cluster_rep, n_members, source AS top_source, ns AS n_top,
         |  ns * 1000000 // n_members AS purity_micros
         |FROM r WHERE rn = 1 AND n_members >= 2""".stripMargin,
    "dedup_winnow_pairs" ->
      s"""WITH ${TextAnalysis.duckWinnowFps},
         |f AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
         |dfc AS (SELECT fp, count(*) AS df FROM f GROUP BY 1),
         |fk AS (SELECT f.doc_id, f.fp FROM f JOIN dfc USING (fp) WHERE df <= 5)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared_fps
         |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 10""".stripMargin,
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $duckClusterRep,
         |csz AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
         |        FROM cl GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM csz GROUP BY 1""".stripMargin,
    "dedup_canonical" ->
      s"""WITH RECURSIVE $duckClusterRep,
         |m AS (SELECT cl.cluster_rep, d.doc_id, d.n_chars,
         |        CAST(count(*) OVER (PARTITION BY cl.cluster_rep) AS BIGINT) AS n_docs,
         |        row_number() OVER (PARTITION BY cl.cluster_rep
         |          ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |      FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
         |SELECT cluster_rep, doc_id AS canonical_id, n_chars AS canonical_chars, n_docs
         |FROM m WHERE rn = 1""".stripMargin,
    "dedup_embedding_lsh" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |nbits AS (SELECT greatest(4, length(bin(
        |    greatest((count(*) + 999) // 1000, 1) - 1))) AS nb FROM e),
        |pl AS (SELECT list(v ORDER BY vec_id) AS ps FROM e, nbits
        |       WHERE vec_id >= 8 AND vec_id < 8 + 4 * nb),
        |bands AS (SELECT e.vec_id, e.label, e.v, t.b AS band_id,
        |   CAST(list_sum(list_transform(range(1, nb + 1), j ->
        |     CASE WHEN list_sum(list_transform(range(1,65), i -> e.v[i] * ps[nb*t.b+j][i])) >= 0
        |          THEN (CAST(1 AS BIGINT) << CAST(nb - j AS INTEGER)) ELSE 0 END)) AS BIGINT)
        |   AS band_val
        |  FROM e, pl, nbits, range(0, 4) t(b)),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1,65), i -> a.v[i] * b.v[i]))
        |   / (sqrt(list_sum(list_transform(range(1,65), i -> a.v[i] * a.v[i])))
        |      * sqrt(list_sum(list_transform(range(1,65), i -> b.v[i] * b.v[i])))), 6) AS cos
        | FROM bands a JOIN bands b
        |   ON a.label = b.label AND a.band_id = b.band_id AND a.band_val = b.band_val
        |  AND a.vec_id < b.vec_id)
        |SELECT DISTINCT id_a, id_b, cos FROM p WHERE cos >= 0.35""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1,65), i -> a.v[i] * b.v[i]))
        |   / (sqrt(list_sum(list_transform(range(1,65), i -> a.v[i] * a.v[i])))
        |      * sqrt(list_sum(list_transform(range(1,65), i -> b.v[i] * b.v[i])))), 6) AS cos
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35""".stripMargin,
    "dedup_lsh_recall" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        | WHERE a.vec_id < 10000 AND b.vec_id < 10000
        |   AND round(list_sum(list_transform(range(1,65), i -> a.v[i] * b.v[i]))
        |    / (sqrt(list_sum(list_transform(range(1,65), i -> a.v[i] * a.v[i])))
        |       * sqrt(list_sum(list_transform(range(1,65), i -> b.v[i] * b.v[i])))), 6)
        |     >= 0.35),
        |nbits AS (SELECT greatest(4, length(bin(
        |    greatest((count(*) + 999) // 1000, 1) - 1))) AS nb FROM e),
        |pl AS (SELECT list(v ORDER BY vec_id) AS ps FROM e, nbits
        |       WHERE vec_id >= 8 AND vec_id < 8 + 4 * nb),
        |bands AS (SELECT e.vec_id, e.label, e.v, t.b AS band_id,
        |   CAST(list_sum(list_transform(range(1, nb + 1), j ->
        |     CASE WHEN list_sum(list_transform(range(1,65), i -> e.v[i] * ps[nb*t.b+j][i])) >= 0
        |          THEN (CAST(1 AS BIGINT) << CAST(nb - j AS INTEGER)) ELSE 0 END)) AS BIGINT)
        |   AS band_val
        |  FROM e, pl, nbits, range(0, 4) t(b)),
        |lsh AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM bands a JOIN bands b
        |   ON a.label = b.label AND a.band_id = b.band_id AND a.band_val = b.band_val
        |  AND a.vec_id < b.vec_id
        | WHERE a.vec_id < 10000 AND b.vec_id < 10000
        |   AND round(list_sum(list_transform(range(1,65), i -> a.v[i] * b.v[i]))
        |    / (sqrt(list_sum(list_transform(range(1,65), i -> a.v[i] * a.v[i])))
        |       * sqrt(list_sum(list_transform(range(1,65), i -> b.v[i] * b.v[i])))), 6)
        |     >= 0.35)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(coalesce(sum(CASE WHEN l.id_a IS NOT NULL THEN 1 END), 0) AS BIGINT)
        |    AS n_hit,
        |  CAST(coalesce(sum(CASE WHEN l.id_a IS NOT NULL THEN 1 END), 0) AS BIGINT)
        |    * 1000000 // nullif(CAST(count(*) AS BIGINT), 0) AS recall_micros
        |FROM ex LEFT JOIN lsh l ON ex.id_a = l.id_a AND ex.id_b = l.id_b""".stripMargin,
  )
}
