package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{DotF, DotFD, DotL, L2F, Shingles}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT dot_f(a, b)")` works next to the
  * Column API (`Similarity.dot`). Install with:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotF].getName, "dot_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_f(arrayF, arrayF) takes 2 arguments")
        DotF(children.head, children(1))
      }),
    (new FunctionIdentifier("dot_fd"),
      new ExpressionInfo(classOf[DotFD].getName, "dot_fd"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fd(arrayF, arrayD) takes 2 arguments")
        DotFD(children.head, children(1))
      }),
    (new FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotL].getName, "dot_l"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_l(arrayL, arrayL) takes 2 arguments")
        DotL(children.head, children(1))
      }),
    (new FunctionIdentifier("l2_f"),
      new ExpressionInfo(classOf[L2F].getName, "l2_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "l2_f(arrayF, arrayF) takes 2 arguments")
        L2F(children.head, children(1))
      }),
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingles(tokens, n) takes 2 arguments")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingles() width must be an integer literal, got $other")
        }
        Shingles(children.head, n)
      }))

  /** Register into an ALREADY-RUNNING session (getOrCreate ignores
    * withExtensions once a session exists — notebooks, shared test JVMs).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
