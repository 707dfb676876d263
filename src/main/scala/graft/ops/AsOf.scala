package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (the reference's "rank-over-candidates" idiom,
  * `fact_player_sog_props_v2.sql:115-144`, re-expressed for scale).
  *
  * For each left row, attaches the payload of the latest right row with equal
  * keys and `rightTime <= leftTime` (inclusive). Implemented as union +
  * running `last(ignoreNulls)` window rather than a candidates join: the
  * naive equi-join + inequality + rank plan materializes |L_k|×|R_k| rows per
  * key before ranking — quadratic on hot keys, a guaranteed OOM at 100 TB.
  * This form is one shuffle on `keys`, linear in |L|+|R|, and skew degrades
  * it to a big sort per key instead of a cross product.
  *
  * Determinism: right rows should be unique per (keys, rightTime); ties are
  * broken arbitrarily (same as Snowflake's unordered QUALIFY tie).
  */
object AsOf {

  /** @param rightPayload right-side columns to carry onto left rows (nulled
    *                     when no right row precedes the left row).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {

    val payloadStruct = struct(rightPayload.map(col): _*)
    val rightTagged = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        payloadStruct.as("__r")): _*)
    val payloadType = rightTagged.schema("__r").dataType

    val leftCols = left.columns
    val leftTagged = left.select(
      leftCols.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__r")): _*)
    // align right to left's schema: null out left-only columns
    val rightAligned = rightTagged.select(
      leftCols.map { c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col("__t"), col("__side"), col("__r")): _*)

    // right rows sort before left rows at equal time → inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightAligned)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
