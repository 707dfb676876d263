package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The manifest-log versioned table (S10's real `VERSION AS OF`): commit /
  * time-travel / append / history / torn-manifest / vacuum contracts.
  */
class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  test("overwrite commits are versioned and VERSION AS OF reads each exactly") {
    val t = tmp("vt_basic")
    val v0 = VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v1 = VersionedTable.commit(Seq((1, "a2"), (3, "c")).toDF("k", "v"), t)
    assert(v0 === 0L && v1 === 1L)
    assert(VersionedTable.read(spark, t, 0).orderBy("k").as[(Int, String)].collect()
      .toSeq === Seq((1, "a"), (2, "b")))
    assert(VersionedTable.read(spark, t, 1).orderBy("k").as[(Int, String)].collect()
      .toSeq === Seq((1, "a2"), (3, "c")))
    // latest = the newest version
    assert(VersionedTable.read(spark, t).orderBy("k").as[(Int, String)].collect()
      .toSeq === Seq((1, "a2"), (3, "c")))
  }

  test("append accumulates on the parent; overwrite resets; history reports both") {
    val t = tmp("vt_append")
    VersionedTable.commit(Seq(1, 2, 3).toDF("k"), t)
    VersionedTable.commit(Seq(4, 5).toDF("k"), t, mode = "append")
    VersionedTable.commit(Seq(9).toDF("k"), t)
    assert(VersionedTable.read(spark, t, 1).as[Int].collect().sorted.toSeq
      === Seq(1, 2, 3, 4, 5))
    assert(VersionedTable.read(spark, t, 2).as[Int].collect().toSeq === Seq(9))
    val h = VersionedTable.history(spark, t)
      .select("version", "mode", "n_rows").as[(Long, String, Long)].collect().sorted
    assert(h.toSeq === Seq((0L, "overwrite", 3L), (1L, "append", 5L),
      (2L, "overwrite", 1L)))
  }

  test("empty commit round-trips schema (plain parquet dirs cannot)") {
    val t = tmp("vt_empty")
    val empty = Seq((1L, "x")).toDF("id", "s").filter(lit(false))
    VersionedTable.commit(empty, t)
    val back = VersionedTable.read(spark, t, 0)
    assert(back.count() === 0L)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString))
      === Seq(("id", "bigint"), ("s", "string")))
  }

  test("TIMESTAMP AS OF resolves the newest commit at or before the clock") {
    val t = tmp("vt_ts")
    VersionedTable.commit(Seq(1).toDF("k"), t)
    val between = System.currentTimeMillis()
    Thread.sleep(5)
    VersionedTable.commit(Seq(2).toDF("k"), t)
    assert(VersionedTable.readTimestampAsOf(spark, t, between)
      .as[Int].collect().toSeq === Seq(1))
    assert(VersionedTable.readTimestampAsOf(spark, t, System.currentTimeMillis())
      .as[Int].collect().toSeq === Seq(2))
    intercept[IllegalArgumentException] {
      VersionedTable.readTimestampAsOf(spark, t, 0L)
    }
  }

  test("a claimed version number cannot be double-committed (optimistic concurrency)") {
    val t = tmp("vt_race")
    VersionedTable.commit(Seq(1).toDF("k"), t)
    // simulate a racing writer holding version 1: the next commit must
    // land at 2, never overwrite the claim
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val claim = new org.apache.hadoop.fs.Path(t, "_graft_log/00000000000000000001.json")
    fs.create(claim, false).close() // torn claim (0 bytes)
    val v = VersionedTable.commit(Seq(2).toDF("k"), t)
    assert(v === 2L)
    assert(VersionedTable.versions(spark, t) === Seq(0L, 1L, 2L))
  }

  test("latest-read skips a torn newest manifest; explicit read of it throws") {
    val t = tmp("vt_torn")
    VersionedTable.commit(Seq(7).toDF("k"), t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val torn = new org.apache.hadoop.fs.Path(t, "_graft_log/00000000000000000001.json")
    val out = fs.create(torn, false); out.write("{not json".getBytes); out.close()
    // latest falls back to v0
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq === Seq(7))
    intercept[IllegalStateException] { VersionedTable.read(spark, t, 1) }
    // history lists the torn version rather than hiding it
    val torns = VersionedTable.history(spark, t)
      .filter(col("mode") === "torn").select("version").as[Long].collect()
    assert(torns.toSeq === Seq(1L))
  }

  test("vacuum drops unreferenced commit dirs and pre-floor manifests only") {
    val t = tmp("vt_vac")
    VersionedTable.commit(Seq(1).toDF("k"), t)            // v0
    VersionedTable.commit(Seq(2).toDF("k"), t, "append")  // v1 references v0's dir
    VersionedTable.commit(Seq(3).toDF("k"), t)            // v2 fresh dir
    val (m, d) = VersionedTable.vacuum(spark, t, retainLast = 2)
    // v0's manifest goes; its DATA dir stays (v1 still references it)
    assert((m, d) === (1, 0))
    assert(VersionedTable.versions(spark, t) === Seq(1L, 2L))
    assert(VersionedTable.read(spark, t, 1).as[Int].collect().sorted.toSeq === Seq(1, 2))
    val (m2, d2) = VersionedTable.vacuum(spark, t, retainLast = 1)
    assert(m2 === 1 && d2 === 2) // v1 manifest + both now-unreferenced dirs
    assert(VersionedTable.read(spark, t).as[Int].collect().toSeq === Seq(3))
    intercept[IllegalArgumentException] { VersionedTable.read(spark, t, 1) }
  }

  test("commitIfAbsent is exactly-once per (appId, batchId); other apps unaffected") {
    val t = tmp("vt_txn")
    val v0 = VersionedTable.commitIfAbsent(Seq(1, 2).toDF("k"), t, "appA", 0L)
    assert(v0 === Some(0L))
    // replay of the same batch: skipped, rows not doubled
    assert(VersionedTable.commitIfAbsent(Seq(1, 2).toDF("k"), t, "appA", 0L) === None)
    assert(VersionedTable.read(spark, t).count() === 2L)
    // next batch and a different app both commit
    assert(VersionedTable.commitIfAbsent(Seq(3).toDF("k"), t, "appA", 1L) === Some(1L))
    assert(VersionedTable.commitIfAbsent(Seq(4).toDF("k"), t, "appB", 0L) === Some(2L))
    assert(VersionedTable.read(spark, t).as[Int].collect().sorted.toSeq
      === Seq(1, 2, 3, 4))
  }

  test("streamingSink appends each micro-batch as one version, exactly-once on replay") {
    val in = tmp("vt_sink_in")
    val t = tmp("vt_sink_tbl")
    val cp = tmp("vt_sink_cp")
    Seq(10, 11).toDF("k").coalesce(1).write.mode("append").parquet(in)
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      .parquet(in)
    val q1 = VersionedTable.streamingSink(src, t, "sinkApp", cp)
    q1.processAllAvailable(); q1.stop()
    assert(VersionedTable.read(spark, t).as[Int].collect().sorted.toSeq === Seq(10, 11))
    // restart against the SAME checkpoint with more input: only the new
    // file lands; the replayed batch 0 (if re-delivered) cannot double
    Seq(12).toDF("k").coalesce(1).write.mode("append").parquet(in)
    val q2 = VersionedTable.streamingSink(
      spark.readStream.schema(org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .parquet(in), t, "sinkApp", cp)
    q2.processAllAvailable(); q2.stop()
    assert(VersionedTable.read(spark, t).as[Int].collect().sorted.toSeq
      === Seq(10, 11, 12))
    // belt-and-braces: manually replaying batch 0 through the txn API is a no-op
    assert(VersionedTable.commitIfAbsent(Seq(10, 11).toDF("k"), t, "sinkApp", 0L) === None)
  }

  test("manifest stats skip files — every supported predicate shape, files only, never rows") {
    val t = tmp("vt_skip")
    // four appends of one coalesced file each = four files with EXACT
    // known key ranges (repartitionByRange samples boundaries, so exact
    // per-file assertions need hand-built files)
    def slice(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"),
        (col("id") * 2).cast("double").as("d"))
      .coalesce(1)
    VersionedTable.commit(slice(0, 250), t)
    VersionedTable.commit(slice(250, 500), t, "append")
    VersionedTable.commit(slice(500, 750), t, "append")
    VersionedTable.commit(slice(750, 1000), t, "append")
    def kept(p: org.apache.spark.sql.Column) = VersionedTable.pruneCount(spark, t, p)._1
    assert(VersionedTable.pruneCount(spark, t, col("k") >= 250L && col("k") < 400L) === (1, 4))
    assert(kept(col("k") === 600L) === 1)           // equality
    assert(kept(lit(990L) <= col("k")) === 1)       // flipped literal side
    assert(kept(col("k") < 10L || col("k") >= 990L) === 2) // OR unions
    assert(kept(col("k").isin(5L, 255L)) === 2)     // IN probes each member
    assert(kept(col("d") > 1900.0) === 1)           // double stats
    assert(kept(col("k") > 5000L) === 0)            // empty: nothing overlaps
    assert(kept(col("s") === "s5") === 4)           // string: no stats, keep all
    assert(kept(!(col("k") === 600L)) === 4)        // NOT: unsupported, keep all
    // zero-loss: the pruned read equals the full read + filter, and an
    // all-pruned read still returns the committed schema
    val p = col("k") >= 250L && col("k") < 400L
    assert(VersionedTable.readWhere(spark, t, p).orderBy("k").collect().toSeq
      === VersionedTable.read(spark, t).filter(p).orderBy("k").collect().toSeq)
    val none = VersionedTable.readWhere(spark, t, col("k") > 5000L)
    assert(none.count() === 0L &&
      none.schema.fieldNames.toSeq === Seq("k", "s", "d"))
  }

  test("date stats prune on internal day units; appends carry parent stats") {
    val t = tmp("vt_skip_date")
    def day(s: String) = java.sql.Date.valueOf(s)
    VersionedTable.commit(Seq((1L, day("2020-01-05")), (2L, day("2020-01-20")))
      .toDF("k", "dt").coalesce(1), t)
    VersionedTable.commit(Seq((3L, day("2020-02-05")), (4L, day("2020-02-20")))
      .toDF("k", "dt").coalesce(1), t, "append")
    assert(VersionedTable.pruneCount(spark, t, col("dt") === lit(day("2020-02-05"))) === (1, 2))
    assert(VersionedTable.pruneCount(spark, t, col("dt") < lit(day("2020-01-01"))) === (0, 2))
    assert(VersionedTable.readWhere(spark, t, col("dt") >= lit(day("2020-02-01")))
      .select("k").as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    // v0 read through the pruned path still sees only its own files
    assert(VersionedTable.readWhere(spark, t, col("k") > 0L, versionAsOf = 0)
      .count() === 2L)
  }

  test("compact folds a many-file listing, preserves content, re-clusters stats") {
    val t = tmp("vt_compact")
    // ten single-file txn appends = the streamingSink shape: a 10-file listing
    for (i <- 0 until 10)
      VersionedTable.commitIfAbsent(
        spark.range(i * 10, i * 10 + 10).toDF("k").coalesce(1), t, "cmp", i.toLong)
    val before = VersionedTable.read(spark, t).as[Long].collect().sorted.toSeq
    assert(VersionedTable.history(spark, t).agg(max("n_files")).head.getLong(0) === 10L)
    val v = VersionedTable.compact(spark, t, targetFiles = 2, clusterBy = Seq(col("k")))
    assert(v === 10L)
    val h = VersionedTable.history(spark, t).filter(col("version") === v)
      .select("mode", "n_files").as[(String, Long)].collect().head
    assert(h._1 === "compact" && h._2 <= 2L)
    assert(VersionedTable.read(spark, t).as[Long].collect().sorted.toSeq === before)
    // the rewrite re-clustered: a narrow range now reads one of two files
    assert(VersionedTable.pruneCount(spark, t, col("k") < 10L)._1 === 1)
    // pre-compact versions still time-travel until vacuumed; then the ten
    // superseded append dirs reclaim
    assert(VersionedTable.read(spark, t, 4).count() === 50L)
    val (_, dirs) = VersionedTable.vacuum(spark, t, retainLast = 1)
    assert(dirs === 10)
    assert(VersionedTable.read(spark, t).as[Long].collect().sorted.toSeq === before)
  }

  test("z-clustered commits prune on BOTH dimensions of the interleave") {
    val t = tmp("vt_z")
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    VersionedTable.commitClustered(grid, t,
      Seq(graft.ops.Layout.zValue(col("x"), col("y"), 6)), numFiles = 16)
    val (kx, total) = VersionedTable.pruneCount(spark, t, col("x") < 8L)
    val (ky, _) = VersionedTable.pruneCount(spark, t, col("y") < 8L)
    // a single-column sort prunes one dimension; the z-layout prunes both
    assert(total === 16 && kx < 10 && ky < 10)
    val box = col("x").between(16L, 31L) && col("y").between(32L, 47L)
    assert(VersionedTable.readWhere(spark, t, box).count() === 256L)
    assert(VersionedTable.pruneCount(spark, t, box)._1 < 10)
  }

  test("append evolves schema by union-by-name: null backfill both ways, conflicts refuse") {
    val t = tmp("vt_evolve")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "s"), t)
    // new column: old rows read null for it
    VersionedTable.commit(Seq((2L, "b", 9.5)).toDF("k", "s", "score"), t, "append")
    val l1 = VersionedTable.read(spark, t)
    assert(l1.schema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(l1.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
      === Seq((1L, "a", None), (2L, "b", Some(9.5))))
    // append MISSING a column: allowed, its rows read null for it
    VersionedTable.commit(Seq((3L, 1.5)).toDF("k", "score"), t, "append")
    val l2 = VersionedTable.read(spark, t)
    assert(l2.count() === 3L)
    assert(l2.filter(col("k") === 3L).select("s").collect().head.isNullAt(0))
    // type conflict refuses loudly and leaves no new version behind
    val before = VersionedTable.versions(spark, t)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(Seq((4L, "x", "oops")).toDF("k", "s", "score"), t, "append")
    }
    assert(VersionedTable.versions(spark, t) === before)
    // time travel still reads each version under ITS schema
    assert(VersionedTable.read(spark, t, 0).schema.fieldNames.toSeq === Seq("k", "s"))
    // stats survive evolution: pruning on k still works across all files
    assert(VersionedTable.pruneCount(spark, t, col("k") === 3L)._1 === 1)
  }

  test("versioned reads feed the drift comparator: real VERSION AS OF CDC") {
    val t = tmp("vt_drift")
    val base = Seq((1L, "O", 100L), (2L, "F", 200L), (3L, "O", 300L))
      .toDF("k", "status", "cents")
    VersionedTable.commit(base, t)
    val next = Seq((1L, "X", 100L), (3L, "O", 300L), (4L, "O", 50L))
      .toDF("k", "status", "cents")
    VersionedTable.commit(next, t)
    val diff = graft.ops.Merge.snapshotDiff(
      VersionedTable.read(spark, t, 0), VersionedTable.read(spark, t, 1),
      keyCols = Seq("k"), trackCols = Seq("status", "cents"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(diff.toSeq === Seq((1L, "changed"), (2L, "removed"), (4L, "added")))
  }
}
