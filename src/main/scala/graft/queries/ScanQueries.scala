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
    },

    // S12 — row-level snapshot diff (beyond the reference; the CDC /
    // time-travel row complement of S10's metrics drift): what changed
    // between two loads of the same table, as added/removed/changed keys.
    // The "new" snapshot derives deterministically from orders (drops at
    // key%97, status flips at key%101, inserts as negated key%89 clones),
    // so both engines diff identical inputs. Rows compare by an md5
    // fingerprint of the tracked columns — the 100 TB shape: the
    // full-outer join moves (key, hash), never the row width. Money
    // normalizes to exact cents BEFORE hashing (raw double stringification
    // is engine-specific; a BIGINT's string is not).
    "s12_snapshot_diff" -> { (s, dir) =>
      import graft.ops.Merge
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"),
        col("o_orderpriority"))
      val mutated = base
        .filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 101 === 0, lit("X")).otherwise(col("o_orderstatus")))
      val inserts = base.filter(col("o_orderkey") % 89 === 0 && col("o_orderkey") =!= 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
      Merge.snapshotDiff(base, mutated.unionByName(inserts),
        keyCols = Seq("o_orderkey"),
        trackCols = Seq("o_custkey", "o_orderstatus", "price_c", "o_orderpriority"))
    },

    // S13 — TRUE versioned-table time travel (S10, previously the one
    // un-ported scan): two REAL commits to a manifest-log table on disk,
    // read back as VERSION AS OF 0 / 1, diffed by the s12 comparator. The
    // oracle computes the expected diff straight from orders — it matches
    // only if both versioned reads round-tripped their snapshots exactly
    // (files, schema, values). Mutation constants differ from s12 so the
    // two faces cannot mask each other.
    "s13_version_travel" -> { (s, dir) =>
      import graft.ops.Merge
      import graft.sources.VersionedTable
      val tbl = java.nio.file.Files.createTempDirectory("graft_vt_s13").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"))
      VersionedTable.commit(base, tbl) // v0
      val mutated = base
        .filter(col("o_orderkey") % 93 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 103 === 0, lit("Z")).otherwise(col("o_orderstatus")))
      val inserts = base.filter(col("o_orderkey") % 91 === 0 && col("o_orderkey") =!= 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
      VersionedTable.commit(mutated.unionByName(inserts), tbl) // v1
      Merge.snapshotDiff(
        VersionedTable.read(s, tbl, versionAsOf = 0),
        VersionedTable.read(s, tbl, versionAsOf = 1),
        keyCols = Seq("o_orderkey"),
        trackCols = Seq("o_custkey", "o_orderstatus", "price_c"))
    },

    // S14 — the commit-log history face (DESCRIBE HISTORY): overwrite /
    // append / overwrite, with per-version FULL row counts from the
    // manifests. Append must report parent+new; the final overwrite must
    // reset. The oracle recomputes each version's count from orders.
    "s14_version_history" -> { (s, dir) =>
      import graft.sources.VersionedTable
      val tbl = java.nio.file.Files.createTempDirectory("graft_vt_s14").toString
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 0), tbl)
      VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 1), tbl, mode = "append")
      VersionedTable.commit(o.filter(col("o_orderkey") % 7 === 0), tbl)
      VersionedTable.history(s, tbl).select("version", "mode", "n_rows")
    },

    // S15 — manifest-stats data skipping: commit orders RANGE-CLUSTERED on
    // the key (8 range-disjoint files), then read back through the
    // stats-pruned path with a key-range predicate. The oracle is the
    // plain filtered aggregate over orders — a pass proves the pruning
    // dropped files but never rows (VersionedTableSpec pins that files
    // WERE dropped; here the grade is zero-loss correctness).
    "s15_version_skipping" -> { (s, dir) =>
      import graft.sources.VersionedTable
      val tbl = java.nio.file.Files.createTempDirectory("graft_vt_s15").toString
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_c"))
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      VersionedTable.commit(o, tbl)
      VersionedTable.readWhere(s, tbl, col("o_orderkey").between(1000L, 30000L))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_price_c"))
    },

    // S16 — Z-ORDER × data skipping: commit events clustered on the
    // Morton interleave of (x, y) (S11's curve), then stats-prune a 2-D
    // BOX predicate — the z-layout keeps every file's bounding box tight
    // in BOTH dimensions, so a predicate on either (or both) skips files
    // a single-column sort could not. The oracle is the bare filtered
    // aggregate over events; VersionedTableSpec pins that single-
    // dimension predicates on x AND on y each prune files.
    "s16_zorder_skipping" -> { (s, dir) =>
      import graft.ops.Layout
      import graft.sources.VersionedTable
      val tbl = java.nio.file.Files.createTempDirectory("graft_vt_s16").toString
      val ev = Tables.events(s, dir).select(
        (col("user_id") % 256).as("x"),
        expr("(unix_micros(ts) DIV 1000000) % 256").as("y"),
        col("event_type"))
      VersionedTable.commitClustered(ev, tbl,
        Seq(Layout.zValue(col("x"), col("y"), 8)), numFiles = 16)
      VersionedTable.readWhere(s, tbl,
          col("x").between(32L, 95L) && col("y").between(64L, 127L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"))
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

  /** The s12 fingerprint, mirroring Merge.rowFingerprint's injection-proof
    * md5-of-per-column-md5s (fixed-width field hashes; a 32-char non-hex
    * marker stands in for NULL so NULL can never collide with any string
    * value — see Merge.snapshotDiff's determinism contract).
    */
  private val s12FpSql = {
    val m = graft.ops.Merge.NullFieldMarker
    s"""md5(concat(coalesce(md5(CAST(o_custkey AS VARCHAR)), '$m'),
      |  coalesce(md5(o_orderstatus), '$m'),
      |  coalesce(md5(CAST(price_c AS VARCHAR)), '$m'),
      |  coalesce(md5(o_orderpriority), '$m')))""".stripMargin
  }

  /** s13's fingerprint (same Merge.rowFingerprint contract, 3 tracked
    * columns — s13 does not track o_orderpriority).
    */
  private val s13FpSql = {
    val m = graft.ops.Merge.NullFieldMarker
    s"""md5(concat(coalesce(md5(CAST(o_custkey AS VARCHAR)), '$m'),
      |  coalesce(md5(o_orderstatus), '$m'),
      |  coalesce(md5(CAST(price_c AS VARCHAR)), '$m')))""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "s13_version_travel" ->
      s"""WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c FROM orders),
         |mut AS (SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey % 103 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus,
         |    price_c FROM base WHERE o_orderkey % 93 <> 0),
         |ins AS (SELECT -o_orderkey AS o_orderkey, o_custkey, o_orderstatus,
         |    price_c FROM base WHERE o_orderkey % 91 = 0 AND o_orderkey <> 0),
         |newsnap AS (SELECT * FROM mut UNION ALL SELECT * FROM ins),
         |o AS (SELECT o_orderkey, $s13FpSql AS old_fp FROM base),
         |n AS (SELECT o_orderkey, $s13FpSql AS new_fp FROM newsnap)
         |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         |  CASE WHEN o.old_fp IS NULL THEN 'added'
         |       WHEN n.new_fp IS NULL THEN 'removed'
         |       WHEN o.old_fp <> n.new_fp THEN 'changed' END AS status
         |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
         |WHERE o.old_fp IS NULL OR n.new_fp IS NULL OR o.old_fp <> n.new_fp""".stripMargin,
    "s16_zorder_skipping" ->
      """WITH e AS (SELECT user_id % 256 AS x,
        |    (epoch_us(ts) // 1000000) % 256 AS y, event_type FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y
        |FROM e WHERE x BETWEEN 32 AND 95 AND y BETWEEN 64 AND 127
        |GROUP BY 1""".stripMargin,
    "s15_version_skipping" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 30000
        |GROUP BY 1""".stripMargin,
    "s14_version_history" ->
      """SELECT CAST(0 AS BIGINT) AS version, 'overwrite' AS mode,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0) AS n_rows
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), 'append',
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0)
        |  + (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 1)
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'overwrite',
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 7 = 0)""".stripMargin,
    "s12_snapshot_diff" ->
      s"""WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c, o_orderpriority
         |  FROM orders),
         |mut AS (SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         |    price_c, o_orderpriority FROM base WHERE o_orderkey % 97 <> 0),
         |ins AS (SELECT -o_orderkey AS o_orderkey, o_custkey, o_orderstatus,
         |    price_c, o_orderpriority FROM base WHERE o_orderkey % 89 = 0 AND o_orderkey <> 0),
         |newsnap AS (SELECT * FROM mut UNION ALL SELECT * FROM ins),
         |o AS (SELECT o_orderkey, $s12FpSql AS old_fp FROM base),
         |n AS (SELECT o_orderkey, $s12FpSql AS new_fp FROM newsnap)
         |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         |  CASE WHEN o.old_fp IS NULL THEN 'added'
         |       WHEN n.new_fp IS NULL THEN 'removed'
         |       WHEN o.old_fp <> n.new_fp THEN 'changed' END AS status
         |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
         |WHERE o.old_fp IS NULL OR n.new_fp IS NULL OR o.old_fp <> n.new_fp""".stripMargin,
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
