package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType}
import org.apache.spark.sql.Column

/** Readers for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Each reader is a bare parquet scan: no transformation is applied here, so
  * Catalyst's column pruning and predicate pushdown always reach the file
  * scan (`PushedFilters` / `ReadSchema` in `.explain("formatted")`). At
  * cluster scale these would be catalog tables partitioned on their natural
  * keys; the API surface (DataFrame in, DataFrame out) is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (rejected by the vectorized
    * reader — the session sets `spark.sql.legacy.parquet.nanosAsLong=true`
    * and we truncate `ts DIV 1000` to microseconds, integral, no double
    * round-trip) and plain TIMESTAMP(µs) with isAdjustedToUTC=false, which
    * Spark reads as TIMESTAMP_NTZ. Both normalize to the session-TZ
    * TIMESTAMP the query surface was written for (sessions run UTC, so the
    * NTZ→LTZ cast is value-identical and matches DuckDB's TIMESTAMP).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.withColumn("ts", normalizeTs(col("ts"), raw.schema("ts").dataType))
  }

  /** The ts normalization above as a reusable column transform — streaming
    * readers (which must re-declare the file schema) apply the same rule.
    */
  def normalizeTs(c: Column, physical: DataType): Column = physical match {
    // `div` is SQL integral division — epoch-nanos (~1.7e18) exceed double's
    // 53-bit mantissa, so Column./ (double division) would silently lose up
    // to ~128 ns and shift the truncated µs by one.
    case LongType         => timestamp_micros(call_function("div", c.cast(LongType), lit(1000L)))
    case TimestampNTZType => c.cast("timestamp")
    case _                => c
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
