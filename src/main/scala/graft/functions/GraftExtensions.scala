package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions so any
  * session (including ones the driver builds) resolves them by name —
  * wired via `spark.sql.extensions` in Graft.configure.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRule)
    ext.injectFunction((
      new FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("fvec_cos"),
      new ExpressionInfo(classOf[FloatVecCos].getName, "fvec_cos"),
      (args: Seq[Expression]) => FloatVecCos(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNGrams(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("term_counts"),
      new ExpressionInfo(classOf[TermCounts].getName, "term_counts"),
      (args: Seq[Expression]) => TermCounts(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("fvec_quantize"),
      new ExpressionInfo(classOf[FVecQuantize].getName, "fvec_quantize"),
      (args: Seq[Expression]) => FVecQuantize(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("fvec_q8_stats"),
      new ExpressionInfo(classOf[FVecQ8Stats].getName, "fvec_q8_stats"),
      (args: Seq[Expression]) => FVecQ8Stats(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("fvec_signbits"),
      new ExpressionInfo(classOf[FVecSignBits].getName, "fvec_signbits"),
      (args: Seq[Expression]) => FVecSignBits(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("lvec_dot"),
      new ExpressionInfo(classOf[LongVecDot].getName, "lvec_dot"),
      (args: Seq[Expression]) => LongVecDot(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("fvec_avg"),
      new ExpressionInfo(classOf[FVecAvg].getName, "fvec_avg"),
      (args: Seq[Expression]) => FVecAvg(args.head,
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
      (args: Seq[Expression]) => IvfAssign(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngram_hashes"),
      new ExpressionInfo(classOf[WordNGramHashes].getName, "word_ngram_hashes"),
      (args: Seq[Expression]) => WordNGramHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("fingerprint_md5"),
      new ExpressionInfo(classOf[FingerprintMd5].getName, "fingerprint_md5"),
      (args: Seq[Expression]) => FingerprintMd5(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => WinnowFingerprints(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("simhash128"),
      new ExpressionInfo(classOf[Simhash128].getName, "simhash128"),
      (args: Seq[Expression]) => Simhash128(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimhashBands].getName, "simhash_bands"),
      (args: Seq[Expression]) => SimhashBands(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => MinHashSigs(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("sha3_point_id"),
      new ExpressionInfo(classOf[Sha3PointId].getName, "sha3_point_id"),
      (args: Seq[Expression]) => Sha3PointId(args.head)))
    // Spark ships a mergeable bloom sketch (used internally for runtime
    // join filters) but does not expose it in the public registry;
    // surface it for sketch-based membership tests (bloom decontam).
    // Arity is validated like Spark's own FunctionRegistry builders do:
    // every registered function is advertised as spark.sql-callable, so
    // a wrong call must fail analysis, not throw IndexOutOfBounds.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(v, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            v, items, bits).toAggregateExpression()
        case _ => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            // docroot interpolates into a documentation URL in this
            // template — it must be the real doc root; the usage hint
            // rides in expectedNum's free-text slot instead
            "functionName" -> "`bloom_agg`",
            "expectedNum" -> "3: bloom_agg(value, expectedItems, numBits)",
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => args match {
        case Seq(sketch, v) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(sketch, v)
        case _ => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`bloom_might_contain`",
            "expectedNum" -> "2: bloom_might_contain(sketch, value)",
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }))
  }
}
