package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A minimal versioned table over plain parquet — manifest-log time travel
  * with no external table-format jars (SURVEY §2.1/S10; the reference reads
  * versioned snapshots via Snowflake `AT(OFFSET => -N)`
  * (`utils/time_travel_validator.py:71-76`) and Iceberg snapshot ids
  * (`iceberg/bronze_odds_player_props.py:110-156`) — this supplies the same
  * `VERSION AS OF` capability Spark-first).
  *
  * Layout:
  * {{{
  *   table/
  *     _graft_log/00000000000000000000.json   // one manifest per version
  *     data/c-<uuid>/part-*.parquet            // one immutable dir per commit
  * }}}
  * Each manifest is the FULL file listing of its version (append manifests
  * repeat the parent's files plus the new commit's), so any version reads
  * with exactly one metadata file — no log replay. The trade: manifest size
  * is O(files-per-version). At 100 TB (~10⁵–10⁶ files) that is a 10–100 MB
  * driver-side read per query — acceptable but worth compacting; the
  * production path is periodic [[vacuum]] plus re-[[commit]] of compacted
  * data, which resets the listing (the same role Delta checkpoints play).
  *
  * Commit protocol (single-claim optimistic concurrency): data files land
  * first in a fresh UUID directory (invisible — no manifest references
  * them), then the writer claims version N by `create(manifest, overwrite =
  * false)`. On HDFS that create is an atomic namenode operation, so of two
  * racing writers exactly one wins and the loser retries against the new
  * parent — appends never lose rows. On the local FS the check-and-create
  * window is microseconds (fine for tests); on S3-like object stores
  * create-no-overwrite is NOT atomic and a single-writer or external
  * lock/CAS layer is required — the same caveat public table formats
  * document for S3.
  *
  * Crash safety: a writer dying between claim and content leaves a torn
  * manifest. Readers resolving `latest` skip unparseable newest manifests
  * (warn + fall back — an in-flight commit is not yet readable state);
  * an EXPLICIT `versionAsOf` of a torn manifest throws, because silently
  * answering with a neighbouring version would be a wrong result.
  *
  * Read path and scale: a versioned read hands Spark a plain parquet file
  * list with the schema pinned from the manifest DDL — predicate pushdown,
  * column pruning, AQE and vectorized readers all apply untouched, and an
  * empty version round-trips as an empty DataFrame with the committed
  * schema (plain parquet directories cannot represent that at all).
  */
object VersionedTable {
  private val mapper = new ObjectMapper()
  private val LogDir = "_graft_log"
  private val ManifestRe = "([0-9]{20})\\.json".r

  private def logPath(table: Path, v: Long) =
    new Path(new Path(table, LogDir), f"$v%020d.json")

  private def fsFor(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Version numbers present in the log, ascending (torn files included —
    * parseability is the READER's concern, presence claims the number).
    */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val (fs, t) = fsFor(spark, table)
    val dir = new Path(t, LogDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(st => st.getPath.getName match {
      case ManifestRe(d) => Some(d.toLong)
      case _ => None
    }).sorted
  }

  private def readManifest(fs: FileSystem, table: Path, v: Long): JsonNode = {
    val in = fs.open(logPath(table, v))
    try mapper.readTree(in) finally in.close()
  }

  /** Record count + per-column min/max from the parquet footer — a
    * driver-side metadata read (KBs per file), not a data scan. O(new
    * files) per commit, the inherent metadata-collection cost every table
    * format pays; the stats feed [[readWhere]]'s file skipping.
    *
    * Stats are recorded only for top-level columns whose physical+logical
    * type makes min/max comparison unambiguous: plain INT32/INT64 (incl.
    * signed int annotations and DATE — internally days, matching Spark's
    * internal date literals), FLOAT and DOUBLE (skipped when a stat is
    * NaN — pre-spec writers let NaN poison min/max). Strings, decimals,
    * timestamps and nested paths are deliberately NOT recorded: binary
    * stats may be writer-truncated and decimal/timestamp compare needs
    * scale/unit bookkeeping — an absent stat just means "never skip",
    * which is always safe.
    */
  private def footerMeta(fs: FileSystem, p: Path): (Long, Map[String, (BigDecimal, BigDecimal)]) = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, fs.getConf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val perCol = scala.collection.mutable.Map[String, (BigDecimal, BigDecimal)]()
      val poisoned = scala.collection.mutable.Set[String]()
      for (b <- blocks; c <- b.getColumns.asScala) {
        val path = c.getPath.toArray
        if (path.length == 1) {
          val name = path(0)
          val pt = c.getPrimitiveType
          val ann = pt.getLogicalTypeAnnotation
          val eligible = pt.getPrimitiveTypeName match {
            case INT32 => ann == null ||
              ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] ||
              ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
            case INT64 => ann == null ||
              (ann match {
                case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
                case _ => false
              })
            case FLOAT | DOUBLE => ann == null
            case _ => false
          }
          val st = c.getStatistics
          if (eligible && st != null && !st.isEmpty && st.hasNonNullValue) {
            val (lo, hi) = (st.genericGetMin, st.genericGetMax)
            val nan = Seq(lo, hi).exists {
              case d: java.lang.Double => d.isNaN
              case f: java.lang.Float => f.isNaN
              case _ => false
            }
            if (nan) { poisoned += name; perCol.remove(name) }
            else if (!poisoned.contains(name)) {
              val (l, h) = (BigDecimal(lo.toString), BigDecimal(hi.toString))
              perCol.get(name) match {
                case Some((pl, ph)) => perCol(name) = (pl.min(l), ph.max(h))
                case None => perCol(name) = (l, h)
              }
            }
          } else poisoned += name // a block without usable stats voids the column
        }
      }
      // a column is skippable only if EVERY block contributed stats
      (r.getRecordCount, perCol.toMap -- poisoned)
    } finally r.close()
  }

  /** Commit `df` as the next version. `mode` "overwrite" replaces the
    * table's visible content; "append" adds to it. Returns the committed
    * version number. The data write is one Spark job; the commit itself is
    * metadata-only (parent listing + one manifest create).
    */
  def commit(df: DataFrame, table: String, mode: String = "overwrite"): Long =
    commitInternal(df, table, mode, None).get

  /** Commit range-clustered on `clusterBy`: rows land in `numFiles`
    * range-disjoint, internally-sorted files, which is what makes the
    * manifest min/max stats TIGHT on those expressions and [[readWhere]]
    * pruning effective — stats over randomly-distributed commits span the
    * whole domain and prune nothing. Pass a z-value interleave (e.g.
    * `graft.ops.Layout.zValue(x, y, bits)`) to cluster on a single curve
    * that keeps BOTH dimensions' per-file boxes tight — multi-column
    * skipping from one sort, the table-format Z-ORDER story. The sort
    * pays one extra shuffle (sample + range exchange) at write time; at
    * 100 TB that is the classic write-once/skip-forever trade.
    */
  def commitClustered(df: DataFrame, table: String, clusterBy: Seq[org.apache.spark.sql.Column],
                      numFiles: Int, mode: String = "overwrite"): Long = {
    require(clusterBy.nonEmpty, "commitClustered needs at least one cluster expression")
    commit(df.repartitionByRange(numFiles, clusterBy: _*)
      .sortWithinPartitions(clusterBy: _*), table, mode)
  }

  /** Rewrite the CURRENT visible content into `targetFiles` files as a new
    * version (mode "compact" — content-preserving, self-documenting in
    * [[history]]). This is the small-file countermeasure for
    * [[streamingSink]] tables (every micro-batch appends a file; a
    * thousand batches = a thousand-file listing) and the manifest-size
    * reset the scaladoc's vacuum+recommit compaction path describes: the
    * new manifest lists `targetFiles` entries instead of the accumulated
    * thousands, and [[vacuum]] then reclaims the superseded dirs.
    * `clusterBy` optionally re-clusters during the rewrite (restoring
    * tight skipping stats that interleaved appends erode); otherwise the
    * rewrite is a plain coalesce. Returns the committed version.
    */
  def compact(spark: SparkSession, table: String, targetFiles: Int,
              clusterBy: Seq[org.apache.spark.sql.Column] = Seq.empty): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val current = read(spark, table)
    if (clusterBy.nonEmpty)
      commitClustered(current, table, clusterBy, targetFiles, mode = "compact")
    else
      commit(current.coalesce(targetFiles), table, mode = "compact")
  }

  /** Idempotent append keyed by a transaction identity — the exactly-once
    * contract a Structured Streaming `foreachBatch` sink needs: replaying
    * micro-batch `batchId` after a restart must not double-append. The
    * manifest records (txnApp, txnBatch); a commit whose identity already
    * appears anywhere in the log is SKIPPED (returns None). The check
    * re-runs inside the version-claim retry loop, so even two concurrent
    * replays of one batch commit it exactly once (the claim loser re-reads
    * the log, sees the winner's txn, and aborts; its orphaned data dir is
    * unreferenced and reclaimed by [[vacuum]]).
    */
  def commitIfAbsent(df: DataFrame, table: String, appId: String,
                     batchId: Long): Option[Long] =
    commitInternal(df, table, "append", Some((appId, batchId)))

  /** A Structured Streaming sink into a versioned table: every micro-batch
    * appends as one table version under the (appId, batchId) exactly-once
    * contract of [[commitIfAbsent]]. Readers time-travel over micro-batch
    * history for free, and a crashed/replayed batch never duplicates rows.
    */
  def streamingSink(stream: DataFrame, table: String, appId: String,
                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitIfAbsent(batch, table, appId, batchId); ()
      }
      .start()

  private def commitInternal(df: DataFrame, table: String, mode: String,
                             txn: Option[(String, Long)]): Option[Long] = {
    require(mode == "overwrite" || mode == "append" || mode == "compact",
      s"bad mode '$mode'") // compact = content-preserving overwrite, named for history
    val spark = df.sparkSession
    val (fs, t) = fsFor(spark, table)
    // fast-path txn skip BEFORE paying the data write (a replayed batch on
    // restart is the common case)
    if (txn.exists(tx => txnCommitted(fs, t, versions(spark, table), tx)))
      return None
    val commitDir = new Path(new Path(t, "data"), s"c-${java.util.UUID.randomUUID()}")
    df.write.mode("error").parquet(commitDir.toString)
    val newPaths = fs.listStatus(commitDir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val newFiles = newPaths.map(p => s"data/${commitDir.getName}/${p.getName}")
    // row count + min/max stats from the parquet FOOTERS (metadata-only,
    // no data scan) — the same place public table formats take per-file
    // stats from; a version's count is then parent + new, never a rescan
    val newMeta = newPaths.map(footerMeta(fs, _))
    val newRows = newMeta.map(_._1).sum
    val newStats: Map[String, Map[String, (BigDecimal, BigDecimal)]] =
      newFiles.zip(newMeta.map(_._2)).toMap
    val ddl = df.schema.toDDL
    var committed = -1L
    while (committed < 0) {
      val prior = versions(spark, table)
      // claim-loop txn re-check: a concurrent replay of the same batch may
      // have won a claim since the fast-path check — abort, drop the orphan
      if (txn.exists(tx => txnCommitted(fs, t, prior, tx))) {
        fs.delete(commitDir, true)
        return None
      }
      val next = if (prior.isEmpty) 0L else prior.max + 1
      val parentManifest: Option[JsonNode] =
        if (mode == "append" && prior.nonEmpty) Some(readManifest(fs, t, prior.max))
        else None
      val parentFiles: Seq[String] = parentManifest
        .map(_.get("files").elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Seq.empty)
      val parentRows: Long = parentManifest.map(_.get("nRows").asLong()).getOrElse(0L)
      val parentStats: Option[JsonNode] =
        parentManifest.flatMap(pm => Option(pm.get("stats")))
      // append schema evolution: the version's schema is the UNION BY NAME
      // of parent and incoming (old files read null for added columns, new
      // files read null for columns they lack); a type conflict refuses
      // loudly here, before any manifest claims — reclaim the orphaned
      // data dir on the way out
      val versionDdl = parentManifest match {
        case Some(pm) =>
          try mergeSchemas(
            StructType.fromDDL(pm.get("schemaDdl").asText()), df.schema).toDDL
          catch { case e: IllegalArgumentException =>
            fs.delete(commitDir, true); throw e
          }
        case None => ddl
      }
      val files = parentFiles ++ newFiles
      val nRows = parentRows + newRows
      val m = mapper.createObjectNode()
      m.put("version", next)
      m.put("mode", mode)
      m.put("ts", System.currentTimeMillis())
      m.put("nRows", nRows)
      m.put("schemaDdl", versionDdl)
      txn.foreach { case (app, batch) =>
        m.put("txnApp", app); m.put("txnBatch", batch)
      }
      val arr = m.putArray("files")
      files.foreach(arr.add)
      // per-file column stats: parent entries carried verbatim (appends
      // prune parent files too), new files from their footers
      val statsNode = m.putObject("stats")
      // set[JsonNode]: Jackson's generic return type would infer Nothing
      // in statement position and make scalac insert a failing cast
      parentStats.filter(_.isObject).foreach(
        _.fields().asScala.foreach(e => statsNode.set[JsonNode](e.getKey, e.getValue)))
      newFiles.foreach { f =>
        val fileNode = statsNode.putObject(f)
        newStats.getOrElse(f, Map.empty).foreach { case (colName, (lo, hi)) =>
          val cn = fileNode.putObject(colName)
          cn.put("lo", lo.bigDecimal)
          cn.put("hi", hi.bigDecimal)
        }
      }
      try {
        val out = fs.create(logPath(t, next), false) // atomic claim on HDFS
        try out.write(mapper.writerWithDefaultPrettyPrinter()
          .writeValueAsBytes(m))
        finally out.close()
        committed = next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => () // lost the race; re-read parent and retry
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") => ()
      }
    }
    Some(committed)
  }

  /** Union-by-name schema evolution for appends (the mergeSchema contract
    * public table formats document): shared columns (matched
    * case-insensitively — Spark resolution is case-insensitive, so two
    * spellings would collide on read) must carry IDENTICAL types — type
    * evolution is refused, not silently coerced, because old files would
    * read garbage or fail mid-scan; columns present on only one side join
    * the merged schema as NULLABLE (files lacking a column read null for
    * it — exactly how Spark's parquet reader treats a missing column).
    * Parent column order is preserved; additions go last.
    */
  private[sources] def mergeSchemas(parent: StructType, next: StructType): StructType = {
    val nextByName = next.fields.map(f => f.name.toLowerCase -> f).toMap
    val parentNames = parent.fields.map(_.name.toLowerCase).toSet
    val merged = parent.fields.map { pf =>
      nextByName.get(pf.name.toLowerCase) match {
        case Some(nf) =>
          require(nf.dataType == pf.dataType,
            s"append schema conflict on '${pf.name}': table has " +
              s"${pf.dataType.simpleString}, incoming has " +
              s"${nf.dataType.simpleString} — type evolution is refused, not coerced")
          pf.copy(nullable = pf.nullable || nf.nullable)
        case None => pf.copy(nullable = true) // new files lack it → null
      }
    }
    val added = next.fields.filterNot(f => parentNames.contains(f.name.toLowerCase))
      .map(_.copy(nullable = true)) // parent files lack it → null
    StructType(merged ++ added)
  }

  /** Is (appId, batchId) already committed anywhere in the log? Torn
    * manifests don't count — their claim carries no readable txn, and the
    * writer that tore died before its content (and so before reporting
    * success to the streaming engine, which will replay the batch).
    */
  private def txnCommitted(fs: FileSystem, t: Path, vs: Seq[Long],
                           tx: (String, Long)): Boolean =
    vs.exists { v =>
      try {
        val m = readManifest(fs, t, v)
        m.hasNonNull("txnApp") && m.get("txnApp").asText() == tx._1 &&
          m.get("txnBatch").asLong() == tx._2
      } catch { case _: Exception => false }
    }

  /** Read the table `VERSION AS OF v` (`versionAsOf < 0` = latest). Latest
    * resolution skips torn/in-flight manifests with a warning; an explicit
    * version must parse or this throws.
    */
  def read(spark: SparkSession, table: String, versionAsOf: Long = -1L): DataFrame = {
    val (t, manifest) = resolveManifest(spark, table, versionAsOf)
    fromManifest(spark, t, manifest)
  }

  private def resolveManifest(spark: SparkSession, table: String,
                              versionAsOf: Long): (Path, JsonNode) = {
    val (fs, t) = fsFor(spark, table)
    val all = versions(spark, table)
    require(all.nonEmpty, s"$table has no committed versions")
    val manifest: JsonNode =
      if (versionAsOf >= 0) {
        require(all.contains(versionAsOf),
          s"$table has no version $versionAsOf (log: ${all.mkString(",")})")
        try readManifest(fs, t, versionAsOf) catch {
          case e: Exception => throw new IllegalStateException(
            s"manifest for explicit version $versionAsOf of $table is " +
              s"unreadable (torn commit?): $e")
        }
      } else {
        all.sorted.reverse.iterator.flatMap { v =>
          try Some(readManifest(fs, t, v)) catch {
            case e: Exception =>
              System.err.println(s"[graft] skipping torn manifest v$v of $table: $e")
              None
          }
        }.nextOption().getOrElse(throw new IllegalStateException(
          s"$table: every manifest is unreadable"))
      }
    (t, manifest)
  }

  /** Read a version with manifest-stats file skipping: files whose
    * min/max range provably cannot satisfy `predicate` are never handed
    * to Spark at all — the versioned-table half of partition pruning, on
    * top of (not instead of) parquet row-group pushdown, which still
    * applies inside every kept file. The predicate is ALSO applied to the
    * result, so correctness never depends on the pruning: a column with
    * no recorded stats, a predicate shape the evaluator doesn't know, or
    * a stats-less old manifest all degrade to "read everything, filter".
    *
    * At 100 TB this is the difference between listing 10⁶ files and
    * scanning the ~10² whose ranges overlap the predicate — PROVIDED the
    * data was committed range-clustered on the predicate columns
    * (`repartitionByRange` + `sortWithinPartitions` before [[commit]]);
    * stats on randomly-distributed commits prune nothing, exactly as in
    * public table formats.
    */
  def readWhere(spark: SparkSession, table: String,
                predicate: org.apache.spark.sql.Column,
                versionAsOf: Long = -1L): DataFrame = {
    val (t, manifest) = resolveManifest(spark, table, versionAsOf)
    val schema = StructType.fromDDL(manifest.get("schemaDdl").asText())
    val kept = prunedFiles(spark, manifest, predicate)
    val df =
      if (kept.isEmpty) spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else spark.read.schema(schema).parquet(kept.map(f => new Path(t, f).toString): _*)
    df.filter(predicate)
  }

  /** (files kept, files total) for `predicate` against a version's stats —
    * the audit face of [[readWhere]]'s skipping, for tests and sizing.
    */
  def pruneCount(spark: SparkSession, table: String,
                 predicate: org.apache.spark.sql.Column,
                 versionAsOf: Long = -1L): (Int, Int) = {
    val (_, manifest) = resolveManifest(spark, table, versionAsOf)
    (prunedFiles(spark, manifest, predicate).size,
      manifest.get("files").size())
  }

  /** Resolve `predicate` through the ANALYZER against the manifest schema
    * (a Spark-4 Column is a tree of unresolved function nodes — `k >= 5`
    * only becomes a typed `GreaterThanOrEqual(attr, lit)` with coercion
    * casts once analyzed), then stats-evaluate the resolved condition per
    * file. Resolution happens once, not per file; an analysis error (bad
    * column, bad type) surfaces here exactly as it would on the real read.
    */
  private def prunedFiles(spark: SparkSession, manifest: JsonNode,
                          predicate: org.apache.spark.sql.Column): Seq[String] = {
    val files = manifest.get("files").elements().asScala.map(_.asText()).toSeq
    val statsNode = manifest.get("stats")
    if (statsNode == null || !statsNode.isObject) files // pre-stats manifest
    else {
      val schema = StructType.fromDDL(manifest.get("schemaDdl").asText())
      val cond = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
        .filter(predicate)
        .queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
      files.filter { f =>
        val fn = statsNode.get(f)
        if (fn == null || !fn.isObject || cond.isEmpty) true
        else {
          val colStats: Map[String, (BigDecimal, BigDecimal)] =
            fn.fields().asScala.map { e =>
              e.getKey -> (BigDecimal(e.getValue.get("lo").asText()),
                BigDecimal(e.getValue.get("hi").asText()))
            }.toMap
          StatsPrune.mightMatch(cond.get, colStats)
        }
      }
    }
  }

  /** Read the newest version whose commit timestamp is <= `tsMillis`
    * (`TIMESTAMP AS OF`). Commit timestamps come from the writer's clock —
    * the usual table-format contract.
    */
  def readTimestampAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val (fs, t) = fsFor(spark, table)
    val hit = versions(spark, table).flatMap { v =>
      try { val m = readManifest(fs, t, v); Some(v -> m.get("ts").asLong()) }
      catch { case _: Exception => None }
    }.filter(_._2 <= tsMillis)
    require(hit.nonEmpty, s"$table has no version at or before ts $tsMillis")
    read(spark, table, hit.maxBy(_._2)._1)
  }

  private def fromManifest(spark: SparkSession, t: Path, m: JsonNode): DataFrame = {
    val schema = StructType.fromDDL(m.get("schemaDdl").asText())
    val files = m.get("files").elements().asScala.map(_.asText()).toSeq
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else
      spark.read.schema(schema).parquet(files.map(f => new Path(t, f).toString): _*)
  }

  /** The commit log as a DataFrame: (version, mode, commit_ts, n_rows,
    * n_files) — the `DESCRIBE HISTORY` face. Torn manifests are listed
    * with mode "torn" and nulls, never silently dropped.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    val (fs, t) = fsFor(spark, table)
    val rows = versions(spark, table).map { v =>
      try {
        val m = readManifest(fs, t, v)
        (v, m.get("mode").asText(), m.get("ts").asLong(),
          m.get("nRows").asLong(), m.get("files").size().toLong)
      } catch {
        case _: Exception => (v, "torn", 0L, -1L, -1L)
      }
    }
    import spark.implicits._
    rows.toDF("version", "mode", "commit_ts", "n_rows", "n_files")
  }

  /** Drop all but the newest `retainLast` versions: manifests below the
    * retention floor are deleted, then every commit directory no retained
    * manifest references is deleted. Returns (manifests, commitDirs)
    * removed. Time travel below the floor stops working — by design; this
    * is the storage-reclaim half of the format (what `VACUUM` does for
    * public table formats).
    */
  def vacuum(spark: SparkSession, table: String, retainLast: Int): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the latest version")
    val (fs, t) = fsFor(spark, table)
    val all = versions(spark, table)
    val retained = all.takeRight(retainLast)
    val referenced: Set[String] = retained.flatMap { v =>
      try readManifest(fs, t, v).get("files").elements().asScala
        .map(f => new Path(t, f.asText()).getParent.getName).toSeq
      catch { case _: Exception => Seq.empty }
    }.toSet
    val droppedManifests = all.filterNot(retained.contains)
    droppedManifests.foreach(v => fs.delete(logPath(t, v), false))
    val dataDir = new Path(t, "data")
    val droppedDirs =
      if (!fs.exists(dataDir)) Seq.empty
      else fs.listStatus(dataDir).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("c-") && !referenced.contains(p.getName))
    droppedDirs.foreach(p => fs.delete(p, true))
    (droppedManifests.size, droppedDirs.size)
  }
}

/** Three-valued file-skipping evaluator over manifest min/max stats: can a
  * file possibly contain a row satisfying the predicate? `true` = must
  * read; `false` = provably not. Conservative by construction — any
  * expression shape, type, or column it doesn't understand answers `true`
  * (read the file), so an evaluator gap can cost speed, never rows.
  *
  * Null-safety: every comparison it prunes on (`= < <= > >= IN BETWEEN`)
  * is null-rejecting — a row with a NULL in the compared column can never
  * satisfy it — so skipping a file on non-null min/max bounds is safe even
  * when the file also holds NULLs, and null counts need not be tracked.
  * NOT is deliberately unsupported (min/max can refute a range, not an
  * exclusion) and answers `true` via the catch-all.
  */
private[sources] object StatsPrune {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  def mightMatch(e: Expression,
                 stats: Map[String, (BigDecimal, BigDecimal)]): Boolean = e match {
    case And(a, b) => mightMatch(a, stats) && mightMatch(b, stats)
    case Or(a, b) => mightMatch(a, stats) || mightMatch(b, stats)
    // the literal-on-left cases must precede the generic ones, and the
    // generic ones pin the literal on the right — otherwise `5 < x`
    // would bind the column side to the literal and never prune
    case GreaterThan(l: Literal, a) => cmp(a, l, stats)((lo, hi, v) => lo < v)
    case GreaterThan(a, l: Literal) => cmp(a, l, stats)((lo, hi, v) => hi > v)
    case GreaterThanOrEqual(l: Literal, a) => cmp(a, l, stats)((lo, hi, v) => lo <= v)
    case GreaterThanOrEqual(a, l: Literal) => cmp(a, l, stats)((lo, hi, v) => hi >= v)
    case LessThan(l: Literal, a) => cmp(a, l, stats)((lo, hi, v) => hi > v)
    case LessThan(a, l: Literal) => cmp(a, l, stats)((lo, hi, v) => lo < v)
    case LessThanOrEqual(l: Literal, a) => cmp(a, l, stats)((lo, hi, v) => hi >= v)
    case LessThanOrEqual(a, l: Literal) => cmp(a, l, stats)((lo, hi, v) => lo <= v)
    case EqualTo(l: Literal, a) => cmp(a, l, stats)((lo, hi, v) => lo <= v && v <= hi)
    case EqualTo(a, l: Literal) => cmp(a, l, stats)((lo, hi, v) => lo <= v && v <= hi)
    case In(a, vs) =>
      (attrName(a), stats) match {
        case (Some(n), s) => s.get(n) match {
          case Some((lo, hi)) =>
            vs.exists(v => litNum(v) match {
              case Some(x) => lo <= x && x <= hi
              case None => true // non-constant/non-numeric member: can't refute
            })
          case None => true
        }
        case _ => true
      }
    case _ => true // unknown shape: never skip on it
  }

  /** Apply `test(lo, hi, literal)` when the attr has stats AND the literal
    * side folds to an exact number; otherwise the file must be read. The
    * literal side of a flipped comparison is matched above — here `a` is
    * always the column side.
    */
  private def cmp(a: Expression, l: Expression,
                  stats: Map[String, (BigDecimal, BigDecimal)])(
                  test: (BigDecimal, BigDecimal, BigDecimal) => Boolean): Boolean =
    attrName(a) match {
      case Some(n) =>
        (stats.get(n), litNum(l)) match {
          case (Some((lo, hi)), Some(v)) => test(lo, hi, v)
          case _ => true
        }
      case _ => true
    }

  /** The column side, seen through coercion casts the analyzer inserted.
    * A cast is transparent only when it is an ORDER-EXACT numeric widening
    * (every source value maps to a distinct target value in the same
    * order) — then comparing the file's raw min/max against the widened
    * literal is sound. long→double (not injective above 2^53) and
    * anything involving decimals/strings are NOT unwrapped: those casts
    * simply disable pruning on that comparison.
    */
  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
    case a: AttributeReference => Some(a.name)
    case c: Cast if orderExactWidening(c.child.dataType, c.dataType) => attrName(c.child)
    case _ => None
  }

  private def orderExactWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType | ShortType, IntegerType) => true
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (ByteType | ShortType, FloatType) => true
      case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
      case _ => false
    }

  /** Exact-decimal view of the literal side. Anything FOLDABLE evaluates
    * (a bare literal, or the `Cast(lit)` the analyzer wraps around it);
    * DATE values are internally days-since-epoch Ints — the same unit
    * parquet DATE stats use, so they compare directly. NaN/±Inf (which no
    * stat we record contains) and non-numeric types answer None = can't
    * prune on this comparison.
    */
  private def litNum(e: Expression): Option[BigDecimal] =
    if (!e.foldable) None
    else try {
      val v = e.eval(EmptyRow)
      if (v == null) None
      else e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(BigDecimal(v.toString))
        case DateType => Some(BigDecimal(v.asInstanceOf[Int]))
        case FloatType =>
          val f = v.asInstanceOf[Float]
          if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toString))
        case DoubleType =>
          val d = v.asInstanceOf[Double]
          if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d.toString))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None } // e.g. ANSI cast overflow
}
