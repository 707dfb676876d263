package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-vector dot product accumulating in DOUBLE, strict index
  * order.
  *
  * This is the one hot numeric kernel where Spark's built-ins fall short:
  * `aggregate(zip_with(...))` is a HigherOrderFunction — interpreted, one
  * closure dispatch per element — which measured ~20× slower on the
  * all-pairs similarity join. A native Expression with `doGenCode` keeps the
  * whole similarity pipeline inside whole-stage codegen (SURVEY guidance:
  * native Expression > UDF > anything else).
  *
  * Numeric contract: identical results to the interpreted
  * `aggregate(zip_with(a,b,(x,y)=>double(x)*double(y)), 0.0, +)` fold and to
  * DuckDB's sequential `list_sum(list_transform(...))` — same IEEE ops in
  * the same order — so oracle comparisons stay bit-exact. Ragged inputs
  * return NULL, matching the fold (zip_with null-pads, a null product
  * poisons the sum): `dot_f` is a registered SQL function, so the parity
  * holds for arbitrary user vectors, not just the equal-length embedding
  * columns the similarity paths feed it.
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotF requires two array<float> inputs, got ${left.dataType} and ${right.dataType}")
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
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF = copy(newLeft, newRight)
}
