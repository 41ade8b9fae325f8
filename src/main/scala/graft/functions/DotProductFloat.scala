package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over two float-vector columns —
  * the hot inner loop of every similarity-search operator (graft.sim.Knn
  * evaluates it once per candidate pair).
  *
  * Why a custom Expression instead of built-ins: the composed form
  * (64 × `getItem(i).cast(double) * ...` summed, or
  * `aggregate(zip_with(...))`) is semantically fine but evaluates a
  * 64-node expression tree per row — 64 bounds/null checks and casts as
  * separate codegen statements, or a lambda-function interpreter for the
  * higher-order form. This fuses the whole product into one tight
  * primitive Java loop inside whole-stage codegen (`doGenCode`), reading
  * directly from the columnar `ArrayData` — the (b) tier of the custom-
  * operator preference order (expression with codegen), reached only
  * because the built-in composition is measurably interpreter-heavy in
  * the ANN hot path.
  *
  * Semantics (kept bit-compatible with the composed form so every KNN
  * oracle hash is unchanged): left-associated ascending-index sum of
  * exact float→double products; null array, length mismatch, or any null
  * element → null.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  /** Column-API entry point: `dotProduct($"a", $"b")`. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlShims.column(
      DotProductFloat(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
}
