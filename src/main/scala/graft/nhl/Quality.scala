package graft.nhl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-schema-test-equivalent assertion helpers (SURVEY §5.2): `not_null`,
  * `unique` / `unique_combination_of_columns`, `accepted_values`,
  * `relationships` (FK integrity), `accepted_range`. Each returns the
  * VIOLATION COUNT (0 = pass) so callers can assert or report; the
  * `check*` variants throw like dbt's `--warn-error`.
  *
  * All checks are single aggregations/anti-joins — they run on 100 TB
  * tables as one pass each, no collect.
  */
object Quality {

  def countNulls(df: DataFrame, cols: Seq[String]): Long =
    df.filter(cols.map(col(_).isNull).reduce(_ || _)).count()

  def countDuplicateKeys(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()

  def countUnacceptedValues(df: DataFrame, c: String, accepted: Seq[Any]): Long =
    df.filter(col(c).isNotNull && !col(c).isin(accepted: _*)).count()

  /** FK rows in `child.fkCol` missing from `parent.pkCol` (dbt
    * `relationships`).
    */
  def countOrphans(child: DataFrame, fkCol: String,
                   parent: DataFrame, pkCol: String): Long =
    child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .count()

  /** dbt_utils.accepted_range (e.g. 0–100 pcts, silver/schema.yml:800-815). */
  def countOutOfRange(df: DataFrame, c: String, min: Double, max: Double): Long =
    df.filter(col(c).isNotNull && (col(c) < min || col(c) > max)).count()

  def checkNotNull(df: DataFrame, cols: Seq[String]): Unit = {
    val n = countNulls(df, cols)
    require(n == 0, s"not_null violated: $n rows null in ${cols.mkString(",")}")
  }

  def checkUnique(df: DataFrame, keys: Seq[String]): Unit = {
    val n = countDuplicateKeys(df, keys)
    require(n == 0, s"unique violated: $n duplicate keys ${keys.mkString(",")}")
  }

  def checkAcceptedValues(df: DataFrame, c: String, accepted: Seq[Any]): Unit = {
    val n = countUnacceptedValues(df, c, accepted)
    require(n == 0, s"accepted_values violated: $n rows of $c outside $accepted")
  }

  def checkReferentialIntegrity(child: DataFrame, fkCol: String,
                                parent: DataFrame, pkCol: String): Unit = {
    val n = countOrphans(child, fkCol, parent, pkCol)
    require(n == 0, s"relationships violated: $n orphan $fkCol values")
  }
}
