package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float×double dot product accumulating in DOUBLE, strict index
  * order — the mixed-precision sibling of [[DotF]] for projecting a float
  * vector onto DOUBLE-literal hyperplanes (Similarity.lshBuckets: 16 plane
  * projections per row ran as interpreted `aggregate(zip_with(...))`
  * HigherOrderFunctions, one closure dispatch per element — the same ~20×
  * penalty DotF was built to remove).
  *
  * Numeric contract: identical to
  * `aggregate(zip_with(cast(a as array<double>), b, (x,y)=>x*y), 0.0, +)` —
  * float→double widening is exact, the products and the index-ordered sum
  * are the same IEEE ops in the same order — so every LSH bucket id (and
  * everything downstream that the DuckDB oracle replicates term by term)
  * is bit-identical to the HOF formulation it replaces. Ragged inputs
  * return NULL (zip_with parity).
  *
  * PRECONDITION (narrower than full zip_with parity, ADVICE r14): array
  * ELEMENTS must be non-null — element slots are read without isNullAt
  * checks (the [[DotF]] precedent), so a null element contributes a
  * garbage 0 where zip_with would return NULL. Holds for every caller
  * (embeddings/hyperplane/q8 arrays are built element-non-null); a new
  * caller with nullable elements must null-filter first.
  */
case class DotFD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"DotFD requires (array<float>, array<double>) inputs, got $l and $r")
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
      s += a.getFloat(i).toDouble * b.getDouble(i)
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
         |    $s += (double) $a.getFloat($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFD = copy(newLeft, newRight)
}
