package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2.1 — scans / sources / sinks (S-ops).
  *
  * The oracle-checkable subset lives here; sinks (S3/S5/S6/S8) and the
  * drift/time-travel comparator (S10) are exercised in ScalaTest
  * (`SinkSpec`, `DriftSpec`) because their observable behavior is files on
  * disk, not a result set.
  */
object ScanQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // S4 — file-metadata extraction scan: the COPY INTO METADATA$FILENAME
    // regex idiom (nhl_daily_ingestion_dag.py:152-190) as
    // input_file_name() + regexp_extract. The oracle pins the expected
    // extraction for every row of the scan.
    "s4_file_metadata" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(regexp_extract(input_file_name(), "([a-z]+)\\.parquet", 1).as("table_name"))
        .groupBy("table_name")
        .agg(count(lit(1)).as("n"))
    },

    // S4b — regex metadata extraction from a semi-structured string column
    // (REGEXP_SUBSTR group-extract semantics, snowflake_odds_setup.sql:45-49).
    "s4_regex_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int").as("k_val"))
    },

    // S7 — incremental anti-join load: skip rows whose id is already in the
    // target (iceberg/bronze_odds_player_props.py:274-291). "Existing" =
    // event_id < 1000; "incoming" = purchases; result = genuinely new rows.
    "s7_incremental_anti_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val existing = ev.filter(col("event_id") < 1000).select("event_id")
      ev.filter(col("event_type") === "purchase")
        .join(existing, Seq("event_id"), "left_anti")
        .select("event_id", "user_id", "event_type")
    },

    // S11 — Z-order layout stats (beyond the reference): the pruning
    // contract of graft.ops.Layout.clusterByZ as exact integers. Events
    // bucket to a 256x256 (user, time-second) grid; the face groups by
    // z-prefix (top 6 of 16 interleaved bits = 64 file-sized cells) and
    // shows every cell's (x, y) bounding box — the min/max footer stats a
    // z-laid-out file would carry, tight in BOTH dimensions. The oracle
    // recomputes the interleave bit-for-bit.
    "s11_zorder_stats" -> { (s, dir) =>
      import graft.ops.Layout
      val ev = Tables.events(s, dir)
        .select((col("user_id") % 256).as("x"),
          expr("(unix_micros(ts) DIV 1000000) % 256").as("y"))
      ev.select(shiftright(Layout.zValue(col("x"), col("y"), 8), 10).as("z_bucket"),
          col("x"), col("y"))
        .groupBy("z_bucket")
        .agg(count(lit(1)).as("n_events"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
    }
  )

  /** The Morton interleave as portable integer SQL (8 OR-terms), shared
    * verbatim by the s11 oracle — parenthesized against `|`/`>>`
    * precedence differences.
    */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((${x} >> $i) & 1) << ${2 * i}) | (((${y} >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  val oracles: Map[String, String] = Map(
    "s4_file_metadata" ->
      "SELECT 'events' AS table_name, COUNT(*) AS n FROM events",
    "s4_regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_val
        |FROM events""".stripMargin,
    "s7_incremental_anti_join" ->
      """SELECT event_id, user_id, event_type FROM events e
        |WHERE event_type='purchase'
        |AND NOT EXISTS (SELECT 1 FROM events x WHERE x.event_id < 1000 AND x.event_id = e.event_id)""".stripMargin,
    "s11_zorder_stats" ->
      s"""WITH e AS (SELECT user_id % 256 AS x,
         |    (epoch_us(ts) // 1000000) % 256 AS y FROM events),
         |z AS (SELECT x, y, ${zSql("x", "y", 8)} AS z FROM e)
         |SELECT (z >> 10) AS z_bucket, CAST(count(*) AS BIGINT) AS n_events,
         |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin
  )
}
