package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Library-grade registration: add
  * `spark.sql.extensions=graft.functions.GraftExtensions` to the session
  * conf and every engine function is available in SQL and `call_function`
  * without imperative per-session setup — the idiomatic way a Spark library
  * ships Catalyst extensions. (GraftFunctions.register stays for sessions
  * built without the conf.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (children: Seq[Expression]) => SimHash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash12"),
      new ExpressionInfo(classOf[MinHash12].getName, "graft_minhash12"),
      (children: Seq[Expression]) => MinHash12(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFps].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowFps(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_phashsig"),
      new ExpressionInfo(classOf[PhashSig].getName, "graft_phashsig"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => PhashSig(c)
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(b: Int,
            org.apache.spark.sql.types.IntegerType)) => PhashSig(c, b)
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(b: Int,
            org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.catalyst.expressions.Literal(d: Int,
            org.apache.spark.sql.types.IntegerType)) => PhashSig(c, b, d)
        case other if other.size < 1 || other.size > 3 =>
          throw new IllegalArgumentException(
            s"graft_phashsig expects (words[, bins-literal[, depth-literal]]), got ${other.size} args")
        case other =>
          // Arity is fine — the bins/depth argument just isn't an INT
          // literal (r10 ADVICE: "got N args" misled SQL users passing
          // foldable expressions like 8*2, which Catalyst has not folded
          // at function-build time).
          throw new IllegalArgumentException(
            "graft_phashsig bins/depth arguments must be INT literals " +
              s"(constant expressions are not folded at registration); got: " +
              other.drop(1).map(_.sql).mkString(", "))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (children: Seq[Expression]) => Hash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_gramhashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gramhashes"),
      (children: Seq[Expression]) => GramHashes(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_gramstrings"),
      new ExpressionInfo(classOf[GramStrings].getName, "graft_gramstrings"),
      (children: Seq[Expression]) => GramStrings(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cmsbuckets"),
      new ExpressionInfo(classOf[CmsBuckets].getName, "graft_cmsbuckets"),
      (children: Seq[Expression]) =>
        CmsBuckets(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      (children: Seq[Expression]) => L2Normalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_repstats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_repstats"),
      (children: Seq[Expression]) => RepStats(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_srpkeys"),
      new ExpressionInfo(classOf[SrpKeys].getName, "graft_srpkeys"),
      (children: Seq[Expression]) => SrpKeys(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_hrw"),
      new ExpressionInfo(classOf[Hrw].getName, "graft_hrw"),
      (children: Seq[Expression]) => Hrw.build(children)))
    // Spark's own runtime-filter primitives, surfaced as callable functions
    // (q105 bloom decontamination): the agg builds the sketch over
    // xxhash64(value) exactly as the InjectRuntimeFilter rule does, and
    // might_contain hashes with the same seed, so the two always agree.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new BloomFilterAggregate(new XxHash64(Seq(children(0))), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), new XxHash64(Seq(children(1))))))
    // Declarative aggregate(zip_with(...)) dot folds → codegen'd DotProduct
    // (bit-identical; see DotFoldRewrite).
    ext.injectOptimizerRule(_ => DotFoldRewrite)
  }
}
