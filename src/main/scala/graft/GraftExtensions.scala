package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, LshBucket, RollingHash, SimHash32}

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`:
  * installs the engine's native expressions into every session built from
  * the config (and every `newSession()` derived from it), with no imperative
  * `register` call — the standard way a Spark library ships Catalyst
  * extensions (functions here; rules/strategies would inject the same way).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      // planes/dims are structural (they size the coefficient matrix), so
      // the SQL form requires foldable non-null int arguments — checked
      // here to fail with a clear analysis error, not an internal NPE
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"lsh_bucket(embedding, planes, dims) takes 3 arguments, got ${exprs.length}")
        def intArg(e: Expression, name: String): Int = {
          if (!e.foldable) throw new IllegalArgumentException(
            s"lsh_bucket: $name must be a literal integer, got ${e.sql}")
          e.eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"lsh_bucket: $name must be a non-null integer, got $other")
          }
        }
        LshBucket(exprs.head, intArg(exprs(1), "planes"), intArg(exprs(2), "dims"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head)))
  }
}
