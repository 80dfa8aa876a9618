package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernel of [[SimHash32]] — one object so the codegen path can
  * call the exact same implementation the interpreted path uses.
  * Serializable: the codegen path ships it to executors inside the
  * generated projection's reference array. */
object SimHashKernel extends Serializable {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** 60-bit portable token hash: first 15 hex chars of md5("3:" + token) —
    * identical to `TextOps.portableHash(token, 3)` (the seed the shingle
    * pipeline uses). */
  def hash60(md: java.security.MessageDigest, token: String): Long = {
    val d = md.digest(("3:" + token).getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    // first 15 hex chars = first 7 bytes + high nibble of byte 8
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** 32-bit SimHash of a document: lowercase, trim, whitespace-split,
    * DISTINCT tokens, per-token 60-bit hash, sign-vote per bit. Votes are
    * integer sums, so the result is identical regardless of token order —
    * which is exactly why this is computable per row with no explode and
    * no shuffle. Mirrors `Dedup.simHash(shingles(n=1))` bit for bit. */
  def compute(s: UTF8String): Long = {
    val str = s.toLowerCase.trim.toString
    val toks = Ws.split(str, -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = hash60(md, t)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Native Catalyst expression: 32-bit SimHash fingerprint of a STRING
  * document, computed per row. The composable formulation
  * ([[graft.operators.Dedup.simHash]] over exploded shingles) materializes
  * one row per (doc, token) and aggregates 32 vote sums through a shuffle;
  * because the votes are order-independent integer sums, the whole
  * pipeline folds into one per-row pass — a map-only stage at 100 TB,
  * with identical fingerprints (asserted in OperatorSpec). The grouped
  * form remains the executable spec and the general path for n-gram
  * shingle frames.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = ctx.addReferenceObj("simhashKernel", SimHashKernel,
        "graft.functions.SimHashKernel$")
      s"${ev.value} = $kernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Column API. */
  def simhash32(c: Column): Column =
    GraftShims.column(SimHash32(GraftShims.expression(c)))
}
