package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string's UTF-8
  * bytes, `h = ((h * BASE + byte_i) mod PRIME)` — the document-fingerprint
  * primitive that built-in functions can't express without exploding the
  * string into rows (order matters, so the bag-of-words fingerprint in
  * [[graft.operators.TextOps.fingerprint]] is not a substitute).
  *
  * Implements `doGenCode`, so it stays inside whole-stage codegen (the
  * brief's preference order: compose built-ins > native Expression > UDF).
  * Deterministic and shift-friendly: equal prefixes share hash prefixes.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.eval(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${RollingHash.Base}L + (($bytes[$i]) & 0xffL)) % ${RollingHash.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** 2^31-ish prime and a classic base; h*Base + 255 < 2^63 so no overflow. */
  val Prime = 2147483647L
  val Base = 257L

  /** Reference implementation (used by the interpreted path and tests). */
  def eval(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xffL)) % Prime
      i += 1
    }
    h
  }

  /** Column API. */
  def rolling_hash(c: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(c)))

  /** Register for SQL: `SELECT rolling_hash(text) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
