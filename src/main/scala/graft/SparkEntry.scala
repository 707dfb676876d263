package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 re-expressed over the
  * driver's TPC-H-ish testdata, one entry per operator row (keys carry the
  * §2 IDs: s4_*, p1_*, f1_*, j1_*, a1_*, w1_*, o/u_*, sc_*), plus the
  * LLM-pipeline operator family (dd_* dedup, ann_* similarity, ta_* text,
  * mm_* multimodal). `oracleSql` carries the DuckDB twin of every
  * SQL-expressible query; hash-only entries (hash-function-dependent ops
  * like MinHash) are asserted in ScalaTest instead.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    ScanQueries, FilterQueries, ExplodeQueries, JoinQueries,
    AggQueries, WindowQueries, SortSetQueries, ScalarQueries, LlmQueries,
    SketchQueries, TpchQueries, NhlQueries)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Pricing-summary
    * aggregate (A1-shaped) over lineitem — scan + filter + hash agg + sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_sum_groupby")(spark, "/root/testdata/sf0.001")
      .orderBy("l_returnflag", "l_linestatus")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
