package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a document string — `[sim_hi, sim_lo]` as a
  * 2-element long array.
  *
  * Why a custom Expression: the composed form explodes every token
  * (corpus × avg-doc-length rows), carries 16 hex-digit columns through
  * a 64-column SUM aggregation, and SHUFFLES all of it on doc_id —
  * simhash is a narrow per-document function being computed as a wide
  * distributed aggregation. This expression fuses tokenize → md5 →
  * bit-vote → signature into one per-row call inside whole-stage
  * codegen: zero shuffle, zero explode, constant memory — at 100 TB the
  * signature stage of near-dup detection becomes a pure map.
  *
  * Semantics are kept BIT-IDENTICAL to the composed form (and its
  * DuckDB oracle twin): tokens = regex-split `\s+` of the space-trimmed
  * lowercased text (space-only trim — both engines' `trim` semantics;
  * empty text yields the single empty token, duplicate tokens vote with
  * multiplicity); per token the first 8 md5 bytes vote MSB-first on the
  * 64 bits (+1/−1); bit b of the signature is 1 iff its vote sum is
  * strictly positive; bits 32-63 form sim_hi, bits 0-31 sim_lo.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Space-only trim (matches Spark's UTF8String.trim and DuckDB's
    * trim — Java's String.trim would also strip control chars).
    */
  private def trimSpaces(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  def compute(text: UTF8String): ArrayData = {
    val s = trimSpaces(text.toString).toLowerCase(java.util.Locale.ROOT)
    val tokens = s.split("\\s+", -1)
    val votes = new Array[Int](64)
    val digest = md5.get()
    var t = 0
    while (t < tokens.length) {
      digest.reset()
      val d = digest.digest(tokens(t).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val bit = (d(b >> 3) >> (7 - (b & 7))) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      t += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= 1L << b
      if (votes(b + 32) > 0) hi |= 1L << b
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** Column-API entry point: `simhash64($"text")` → array(sim_hi, sim_lo). */
  def simhash64(c: Column): Column =
    GraftSqlShims.column(SimHash64Expr(GraftSqlShims.expression(c)))
}
