package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native shingling: distinct word n-grams of a text column in one JVM
  * kernel call per row — the interpreted HOF equivalent walks an
  * expression tree per token and was the top cost of the dedup family.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"word_ngrams expects (string, n>=1), got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.wordNGrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.wordNGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** Intersection size of two sorted arrays (two-pointer merge) — the
  * verify step of the prefix-filtered set-similarity join. Accepts
  * array<string> or array<bigint> (the hashed-shingle representation).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  private lazy val isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<string> or two array<bigint>, got $l / $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) TextHashes.sortedIntersectCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else TextHashes.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "sortedIntersectCountLong" else "sortedIntersectCount"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHashes.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Query-term frequencies [n_tokens, tf_1..tf_k] in one kernel call —
  * document-at-a-time scoring without exploding the token stream.
  */
case class TermCounts(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects (string, array<string>), got $l / $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.termCounts(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHashes.termCounts($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "term_counts"
}

/** Distinct word n-grams as SORTED xxhash64 longs in one kernel call —
  * primitive join keys + primitive two-pointer verify for the
  * set-similarity family (see TextHashes.wordNGramHashes).
  */
case class WordNGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"word_ngram_hashes expects (string, n>=1), got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.wordNGramHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.wordNGramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes"
}

/** Native document fingerprint: md5 of sorted distinct lowercase tokens
  * in one kernel call per row.
  */
case class FingerprintMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"fingerprint_md5 expects string, got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.fingerprintMd5(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.fingerprintMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fingerprint_md5"
}

/** Native winnowing fingerprints (rolling-hash + window-min, k=8 w=4)
  * in one kernel call per row.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects (string, k>=1, w>=1), got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.winnowFingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.winnowFingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

/** Reference-parity deterministic point id: sha3-512 of the id string,
  * first 8 bytes little-endian as a long (qdrant.py:137's
  * `int.from_bytes(sha3_512(id.encode()).digest()[:8], 'little')`).
  */
case class Sha3PointId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"sha3_point_id expects string, got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.sha3PointId(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.sha3PointId($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sha3_point_id"
}

/** Native 128-bit SimHash bitstring in one kernel call per row. */
case class Simhash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash128 expects string, got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.simhash128(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash128($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash128"
}

/** Native SimHash 4x32-bit integer bands in one kernel call per row. */
case class SimhashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash_bands expects string, got ${child.dataType}")

  override protected def nullSafeEval(t: Any): Any =
    TextHashes.simhashBands(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhashBands($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_bands"
}

/** Native MinHash signature (K=12) over a shingle array — one kernel
  * call per row; values identical to the portable-SQL formulation the
  * DuckDB oracle runs.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<string>, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextHashes.minhashSigs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.minhashSigs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}
