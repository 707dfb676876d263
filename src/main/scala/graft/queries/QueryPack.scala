package graft.queries

/** A named group of driver-checkable queries with their DuckDB oracle SQL.
  *
  * Cross-engine float determinism: every money-like column in the testdata
  * holds exact 2-decimal values, so sums/averages are computed via the
  * "cents trick" — `SUM(CAST(round(x*100,0) AS BIGINT)) / 100.0` — which is
  * bit-exact on both Spark and DuckDB (integer arithmetic + one IEEE divide),
  * immune to summation-order float drift. Helpers below keep the Spark and
  * SQL sides of that idiom in lockstep.
  */
trait QueryPack {
  def queries: Map[String, Q]

  /** DuckDB-runnable oracle SQL per query key. Keys absent here get the
    * driver's weaker rows-only check (non-SQL-expressible operators).
    */
  def oracles: Map[String, String]
}

object QueryPack {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact decimal(2) sum as a double: order-independent, engine-exact. */
  def centsSum(c: Column): Column = sum(round(c * 100, 0).cast("long")) / 100.0

  /** Exact decimal(2) average as a double (null-skipping like AVG). */
  def centsAvg(c: Column): Column =
    sum(round(c * 100, 0).cast("long")) / (lit(100.0) * count(c))

  /** Oracle-side twin of [[centsSum]]. */
  def centsSumSql(col: String): String =
    s"SUM(CAST(round(($col)*100,0) AS BIGINT))/100.0"

  /** Oracle-side twin of [[centsAvg]]. */
  def centsAvgSql(col: String): String =
    s"SUM(CAST(round(($col)*100,0) AS BIGINT))/(100.0*COUNT($col))"
}
