package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared-L2 distance between two float vectors — the PQ/Lloyd
  * assignment kernel, sibling of [[DotF]].
  *
  * Numeric contract (bit-for-bit): identical to the interpreted
  * `aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0.0, _ + _)`
  * fold this replaces — per element the difference and the square are
  * FLOAT ops (float arrays make the lambda's arithmetic float-typed, so
  * the square is rounded to float before accumulating), the accumulator
  * is DOUBLE, strict index order. Ragged inputs return NULL, again
  * matching the fold (zip_with null-pads the shorter side; a null square
  * poisons the aggregate) — `l2_f` is a registered SQL function, so the
  * parity must hold for arbitrary user inputs, not just the equal-length
  * subvectors the PQ path feeds it. Keeping the rounding identical is
  * what lets the swap into pqCodebooks/ivfPqTopK change nothing
  * downstream: every Lloyd assignment, min_by tie, and recall gate sees
  * the same distances to the last bit.
  */
case class L2F(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"L2F requires two array<float> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  // null on ragged inputs (zip_with parity), not only on null children
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i) - b.getFloat(i)
      s += (d * d).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    float $d = $a.getFloat($i) - $b.getFloat($i);
         |    $s += (double) ($d * $d);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2F = copy(newLeft, newRight)
}
