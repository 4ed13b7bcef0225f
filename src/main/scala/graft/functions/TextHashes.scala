package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native text-hash expressions. Each produces
  * values IDENTICAL to the portable SQL the oracles run (md5 hex,
  * 48-bit prefix, (A_p*v+B_p) mod P permutations) — only faster.
  */
object TextHashes {

  /** Distinct word n-gram shingles of a whitespace-tokenized text.
    * Matches `array_distinct(transform(...concat_ws(' ',...)))` over
    * `split(text,'\s+')` (split limit -1: Spark keeps trailing empties).
    */
  def wordNGrams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** OpenRefine-style fingerprint: md5 hex of the sorted distinct
    * whitespace tokens joined by ' '. Sort order is UTF8String binary —
    * identical to Spark's array_sort and DuckDB's list_sort on VARCHAR.
    */
  def fingerprintMd5(text: UTF8String): UTF8String = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < toks.length) { set.add(UTF8String.fromString(toks(i))); i += 1 }
    val sb = new java.lang.StringBuilder(text.numBytes())
    val it = set.iterator()
    while (it.hasNext) { if (sb.length > 0) sb.append(' '); sb.append(it.next().toString) }
    val d = MessageDigest.getInstance("MD5").digest(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = "0123456789abcdef".charAt((d(k) >> 4) & 0xf)
      hex(2 * k + 1) = "0123456789abcdef".charAt(d(k) & 0xf)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** SimHash sign accumulator: for bit b (= bit (b mod 4) of hex digit
    * (b div 4) of md5(token)), sum +1/-1 over tokens. Same bit layout as
    * the portable-SQL formulation.
    */
  private def simhashAcc(text: UTF8String): Array[Int] = {
    val md = MessageDigest.getInstance("MD5")
    val acc = new Array[Int](128)
    val toks = text.toString.split("\\s+", -1)
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var b = 0
      while (b < 128) {
        val k = b >> 2 // hex digit index (all 32 digits of the md5)
        val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
        acc(b) += (if (((nib >> (b & 3)) & 1) == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    acc
  }

  /** 128-char SimHash bitstring ('1' where the sign sum is >= 0).
    * Widened from 64 bits in r13: the md5 token digest always carried
    * 128 bits, and 16-bit bands (65k buckets) saturate the banded
    * hamming join past ~10^9 docs — 32-bit bands hold occupancy near 1
    * to ~10^10.
    */
  def simhash128(text: UTF8String): UTF8String = {
    val acc = simhashAcc(text)
    val cs = new Array[Char](128)
    var b = 0
    while (b < 128) { cs(b) = if (acc(b) >= 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(cs))
  }

  /** SimHash as 4 x 32-bit integer bands (band b = bits 32b..32b+31,
    * first bit most significant — matches conv(substring(bits),2,10)).
    */
  def simhashBands(text: UTF8String): ArrayData = {
    val acc = simhashAcc(text)
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var v = 0L
      var i = 0
      while (i < 32) { v = (v << 1) | (if (acc(32 * b + i) >= 0) 1L else 0L); i += 1 }
      bands(b) = v
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** Intersection size of two SORTED UTF8String arrays (two-pointer
    * merge). Callers must pass array_sort'ed inputs.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var j = 0; var c = 0L
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Winnowing fingerprints (MOSS-style): polynomial rolling hash of
    * every k-char window (base 31 mod 1e9+7, computed on code points),
    * then the min hash of each w-window of those, distinct. Exactly the
    * integer-SQL formulation the oracle runs; k=8, w=4.
    */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val p = 1000000007L
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31L + s.charAt(i + j).toLong; j += 1 }
      hs(i) = h % p
      i += 1
    }
    if (m < w) return new GenericArrayData(Array(hs.min))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var a = 0
    while (a + w <= m) {
      var mn = hs(a)
      var b = 1
      while (b < w) { if (hs(a + b) < mn) mn = hs(a + b); b += 1 }
      seen.add(mn)
      a += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles as SORTED 64-bit xxhash64 values —
    * the set-similarity join representation: join keys and two-pointer
    * intersections over primitive longs instead of shingle strings.
    * Jaccard over the hashed sets equals Jaccard over the string sets
    * unless xxhash64 collides (~1e-9 at 1e5 distinct shingles/doc).
    */
  def wordNGramHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val u = UTF8String.fromString(sb.toString)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0; var k = 0
    while (k < m) { if (k == 0 || hs(k) != hs(k - 1)) { hs(w) = hs(k); w += 1 }; k += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Intersection size of two SORTED long arrays (two-pointer merge). */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Long = {
    var i = 0; var j = 0; var c = 0L
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Per-document query-term frequencies in one pass:
    * [n_tokens, count(term_1), ..., count(term_k)] over the lowercased
    * whitespace tokens — document-at-a-time BM25 scoring without
    * exploding the token stream.
    */
  def termCounts(text: UTF8String, terms: ArrayData): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val k = terms.numElements()
    val ts = new Array[String](k)
    var j = 0
    while (j < k) { ts(j) = terms.getUTF8String(j).toString; j += 1 }
    val out = new Array[Long](k + 1)
    out(0) = toks.length.toLong
    var i = 0
    while (i < toks.length) {
      var p = 0
      while (p < k) { if (ts(p) == toks(i)) out(p + 1) += 1; p += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Reference-parity point id (qdrant.py:137): first 8 bytes of
    * SHA3-512 of the UTF-8 id string, read LITTLE-endian, as the JVM's
    * signed 64-bit long (same bit pattern as Python's unsigned
    * int.from_bytes — ids above 2^63 print negative here but compare,
    * join and round-trip identically).
    */
  def sha3PointId(id: UTF8String): Long = {
    val d = MessageDigest.getInstance("SHA3-512").digest(id.getBytes)
    ((d(7) & 0xffL) << 56) | ((d(6) & 0xffL) << 48) | ((d(5) & 0xffL) << 40) |
      ((d(4) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
  }

  val MinHashK = 12
  private val P = 1000000007L

  /** MinHash signature: per shingle md5 -> 48-bit prefix v (= first 12
    * hex digits big-endian) -> K universal-hash permutations -> min fold.
    */
  def minhashSigs(shingles: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(MinHashK)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      md.reset()
      // first 12 hex chars == first 6 digest bytes, big-endian
      val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
        ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      var p = 0
      while (p < MinHashK) {
        val h = ((16385L + 77L * p) * v + 52361L + 9199L * p) % P
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
