package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

import graft.operators.Similarity

/** Native Catalyst expression: the random-hyperplane LSH bucket code of an
  * `array<double>` embedding — `planes` sign bits, each the sign of the
  * dot product against a deterministic hyperplane
  * ([[Similarity.planeCoefJvm]], the md5-derived matrix).
  *
  * Replaces `planes` zip_with/aggregate lambda pipelines per row with ONE
  * tight primitive double loop inside whole-stage codegen; the coefficient
  * matrix is a codegen reference object, computed once at plan
  * construction. Accumulation per plane is the same left-to-right fold, so
  * bucket codes are bit-identical to the higher-order-function form
  * (asserted in FunctionsSpec) and the q36 DuckDB oracle is unchanged.
  *
  * Null handling mirrors [[DotProduct]]: a null array yields null; null
  * elements contribute 0.
  */
case class LshBucket(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<double>, got ${t.simpleString}")
  }

  @transient private lazy val coefs: Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => Similarity.planeCoefJvm(p, d))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // a silent truncation to `dims` would diverge from the declared
    // coefficient matrix (and the oracle) — mismatched data fails fast
    if (x.numElements() != dims)
      throw new IllegalArgumentException(
        s"lsh_bucket: embedding has ${x.numElements()} dims, expected $dims")
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val row = coefs(p)
      var acc = 0.0
      var d = 0
      while (d < dims) {
        if (!x.isNullAt(d)) acc += x.getDouble(d) * row(d)
        d += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("lshCoefs", coefs, "double[][]")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "lsh_bucket: embedding has " + $a.numElements() + " dims, expected $dims");
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double[] $row = $m[$p];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dims; $d++) {
         |    if (!$a.isNullAt($d)) { $acc += $a.getDouble($d) * $row[$d]; }
         |  }
         |  if ($acc > 0) { $bucket |= (1L << $p); }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Column API. */
  def lsh_bucket(e: Column, planes: Int, dims: Int): Column =
    GraftShims.column(LshBucket(GraftShims.expression(e), planes, dims))
}
