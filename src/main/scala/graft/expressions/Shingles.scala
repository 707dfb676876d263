package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token shingles ("a b c") from a token array — the MinHash /
  * Jaccard unit, as a native expression.
  *
  * The built-in formulation `array_distinct(transform(sequence(...),
  * i => array_join(slice(toks, i+1, n), " ")))` is a HigherOrderFunction
  * chain: interpreted, ~13 µs per shingle from lambda dispatch + slice
  * allocation + join. This expression builds each shingle with one
  * `UTF8String.concat` and dedups through a LinkedHashSet — one coarse
  * eval call per row doing tight work, which is what matters on a
  * billion-document corpus.
  *
  * Output is the same string set as the built-in chain (first-occurrence
  * order), so DuckDB oracle comparisons are unaffected.
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"Shingles requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // distinct=false keeps every occurrence (positional order) — the
    // multiset unit of the vector-space model (Dedup.tokenCosinePairs),
    // where multiplicity is the semantics the set version would flatten
    val seen: java.util.LinkedHashSet[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2) else null
    val all: Array[Any] = if (distinct) null else new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](2 * n - 1)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      val sh = UTF8String.concat(parts: _*)
      if (distinct) seen.add(sh) else all(i) = sh
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
