package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.streaming.Streaming

/** Drives the streaming transforms end-to-end over the real events table
  * through a file-source → memory-sink streaming query.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  // The physical encoding of `events.ts` varies across testdata generations
  // (ns-as-Long vs µs-NTZ — see Tables.events). A streaming reader must
  // declare its schema up front, so derive the ts field from what the batch
  // reader actually sees and normalize with the SAME dispatch the batch path
  // uses — hardcoding either encoding silently breaks when testdata is
  // regenerated with the other.
  private def physicalTsType(dir: String): DataType =
    spark.read.parquet(dir).schema("ts").dataType

  private def eventsSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventsStreamFrom(dir: String) = {
    val tsType = physicalTsType(dir)
    spark.readStream.schema(eventsSchema(tsType)).parquet(dir)
      .withColumn("ts", graft.sources.Tables.normalizeTs(col("ts"), tsType))
  }

  private def eventsStream = eventsStreamFrom(streamDir)

  private def eventsBatch = graft.sources.Tables.events(spark, sf("sf0.001"))

  test("windowed activity over a stream matches the same aggregation in batch") {
    // Complete mode: emit ALL windows (Append would hold back windows newer
    // than the watermark at end-of-input — correct streaming behavior, but
    // here we want the full batch-parity comparison)
    Streaming.drainToMemory(
      Streaming.windowedActivity(eventsStream, "ts"), "win_out", OutputMode.Complete())
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n", "sum_value").collect().toSet
    val batch = eventsBatch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("session_window aggregation over a stream matches the same expression in batch") {
    // Complete mode for the same reason as the windowed-activity pin:
    // Append would withhold sessions still inside the watermark horizon
    // at end-of-input — we want the full batch-parity comparison.
    Streaming.drainToMemory(
      Streaming.sessionWindowActivity(eventsStream, "ts"),
      "sess_win_out", OutputMode.Complete())
    val streamed = spark.table("sess_win_out")
      .select("session_start", "session_end", "user_id", "n_events", "sum_value")
      .collect().toSet
    val batch = Streaming.sessionWindowActivity(eventsBatch, "ts")
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the sessions are real sessions, not one-window-per-event: some user
    // must have a session with more than one event
    assert(spark.table("sess_win_out").filter(col("n_events") > 1).count() > 0)
  }

  test("dropDuplicatesWithinWatermark ingest dedups retried events with bounded state") {
    val d = Files.createTempDirectory("graft_stream_dup_wm")
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"), d.resolve("a.parquet"))
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"), d.resolve("b.parquet"))
    val dupStream = eventsStreamFrom(d.toString)
    Streaming.drainToMemory(
      Streaming.dedupIngestWithinWatermark(dupStream, "event_id", "ts"),
      "dedup_wm_out", OutputMode.Append())
    // transit duplicates carry the SAME event time, so they always land
    // inside the horizon and the output equals the batch-distinct count
    assert(spark.table("dedup_wm_out").count() === eventsBatch.count())
  }

  test("streaming ingest dedup drops duplicate event_ids") {
    // duplicate the source file → every event arrives twice
    val d = Files.createTempDirectory("graft_stream_dup")
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"), d.resolve("a.parquet"))
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"), d.resolve("b.parquet"))
    val dupStream = eventsStreamFrom(d.toString)
    Streaming.drainToMemory(
      Streaming.dedupIngest(dupStream, "event_id", "ts"), "dedup_out", OutputMode.Append())
    assert(spark.table("dedup_out").count() === eventsBatch.count())
  }

  test("dual ts encodings (ns-Long and µs-NTZ) normalize identically through the stream path") {
    // Regenerate the same events in BOTH physical encodings testdata has
    // shipped with, stream each through eventsStreamFrom, and pin that the
    // normalized timestamps agree with each other and with the batch reader.
    // This is the fixture that breaks loudly if a future testdata generation
    // flips encodings and someone hardcodes one of them again.
    val base = eventsBatch.select("event_id", "ts").limit(2000)
    val nsDir = Files.createTempDirectory("graft_enc_ns")
    val ntzDir = Files.createTempDirectory("graft_enc_ntz")
    base.select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(nsDir.toString)
    base.select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(ntzDir.toString)
    def streamed(dir: String, sink: String): Set[(Long, Long)] = {
      val tsType = physicalTsType(dir)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", tsType)))
      val s = spark.readStream.schema(schema).parquet(dir)
        .withColumn("ts", graft.sources.Tables.normalizeTs(col("ts"), tsType))
      Streaming.drainToMemory(s, sink, OutputMode.Append())
      spark.table(sink).select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toSet
    }
    val fromNs = streamed(nsDir.toString, "enc_ns_out")
    val fromNtz = streamed(ntzDir.toString, "enc_ntz_out")
    val batch = base.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSet
    assert(fromNs === batch, "ns-Long stream encoding diverged from batch")
    assert(fromNtz === batch, "µs-NTZ stream encoding diverged from batch")
    assert(fromNs.nonEmpty)
  }

  test("stream-stream join matches the equivalent batch interval join") {
    Streaming.drainToMemory(
      Streaming.purchasesWithRecentSignup(eventsStream), "ss_join_out", OutputMode.Append())
    val streamed = spark.table("ss_join_out")
      .select("purchase_id", "signup_id").as[(Long, Long)].collect().toSet
    val ev = eventsBatch
    val batch = Streaming.purchasesWithRecentSignup(ev)
      .select("purchase_id", "signup_id").as[(Long, Long)].collect().toSet
    // streaming append emits only pairs the watermark has sealed; every
    // emitted pair must be a true batch pair, and most batch pairs seal
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size / 2, s"${streamed.size} of ${batch.size} sealed")
  }

  test("sessionize: gap-based sessions partition each user's events exactly") {
    val gapUs = 30L * 60 * 1000000 // 30 min
    val sessions = Streaming.sessionize(spark, eventsBatch, gapUs).collect()
    val perUser = sessions.groupBy(_.user_id)
    val counts = eventsBatch.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    counts.foreach { case (uid, n) =>
      val ss = perUser(uid).sortBy(_.start_us)
      assert(ss.map(_.n_events).sum === n, s"user $uid events partitioned")
      // sessions are disjoint and separated by more than the gap
      ss.sliding(2).foreach {
        case Array(a, b) => assert(b.start_us - a.end_us > gapUs)
        case _ =>
      }
      ss.foreach(s => assert(s.end_us >= s.start_us))
    }
  }

  test("sessionize ≡ batch w11_sessionize: same sessions from both engines' idioms") {
    // same 24 h gap as the w11 driver query; the stateful-iterator and the
    // window+groupBy forms must produce identical session partitions
    val gapUs = 86400L * 1000000L
    val batch = SparkEntry.queries("w11_sessionize")(spark, sf("sf0.001"))
      .select(col("user_id"),
        unix_micros(col("sess_start").cast("timestamp")).as("s"),
        unix_micros(col("sess_end").cast("timestamp")).as("e"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = Streaming.sessionize(spark, eventsBatch, gapUs)
      .collect().map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
    assert(streamed === batch)
  }

  test("streaming corpus ingest: quality gate + fingerprint dedup match batch") {
    import graft.ops.TextOps
    // every document arrives twice → fingerprint dedup must halve them
    val d = Files.createTempDirectory("graft_stream_docs")
    Files.copy(Paths.get(sf("sf0.001") + "/documents.parquet"), d.resolve("a.parquet"))
    Files.copy(Paths.get(sf("sf0.001") + "/documents.parquet"), d.resolve("b.parquet"))
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docsSchema).parquet(d.toString)
      .withColumn("ts", timestamp_micros(col("doc_id")))
    Streaming.drainToMemory(
      Streaming.corpusIngest(stream, "ts"), "ingest_out", OutputMode.Append())
    val got = spark.table("ingest_out")
    val batchDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val expected = batchDocs
      .filter(TextOps.qualityScore(col("text")) >= 0.2)
      .select(TextOps.fingerprint(col("text"))).distinct().count()
    assert(got.count() === expected)
    assert(got.count() > 0)
    // the gate and dedup both fired: fewer survivors than arriving rows
    assert(got.count() < batchDocs.count() * 2)
  }

  test("novelAgainstCorpus: stream-static anti-join keeps only fingerprints absent from the index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val known = "the quick brown fox and the lazy dog is in the house to stay"
    val fresh = "completely novel text never seen by the corpus index before now"
    // static index = the batch-side fingerprint of the known doc
    val index = Seq(known).toDF("text")
      .select(graft.ops.TextOps.fingerprint(col("text")).as("fingerprint"))
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.novelAgainstCorpus(ms.toDF.toDF("doc_id", "text"), index)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("novel_out").start()
    // token-set permutation of the known doc shares its structural
    // fingerprint -> also dropped; only the fresh doc survives
    ms.addData((1L, known), (2L, fresh), (3L, known.split(" ").reverse.mkString(" ")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("novel_out").select("doc_id").as[Long].collect().toSet
    assert(got === Set(2L))
    // batch parity: the same function on a batch frame is the plain anti-join
    val batch = Streaming.novelAgainstCorpus(
      Seq((1L, known), (2L, fresh)).toDF("doc_id", "text"), index)
      .select("doc_id").as[Long].collect().toSet
    assert(batch === Set(2L))
  }

  test("nearDupNovelAgainstCorpus: stateless stream-static near-dup decontamination") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpusDoc = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six")
    val nearDup = corpusDoc.replace("six", "seven")      // J ≈ 0.9
    val novel = "entirely different content that shares no shingles with the corpus at all yes"
    val index = Streaming.corpusBandIndex(
      Seq((100L, corpusDoc)).toDF("doc_id", "text"), "text", "doc_id")
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.nearDupNovelAgainstCorpus(ms.toDF.toDF("doc_id", "text"), index)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("neardup_novel").start()
    ms.addData((1L, corpusDoc), (2L, nearDup), (3L, novel))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_novel").select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L), "exact copy and near-dup must drop; novel doc must survive")
    // batch parity: identical rows through the same function as a batch frame
    val batch = Streaming.nearDupNovelAgainstCorpus(
      Seq((1L, corpusDoc), (2L, nearDup), (3L, novel)).toDF("doc_id", "text"), index)
      .select("doc_id").as[Long].collect().toSet
    assert(batch === Set(3L))
  }

  test("stripKnownChunks ≡ batch stripDupChunks: stateless streaming boilerplate strip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 4-token chunks: docs 1 and 2 share their first chunk (boilerplate),
    // doc 3 is all-unique, doc 4 is ENTIRELY boilerplate (clean_text='')
    val boiler = "this site uses cookies"
    val corpus = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi"),
      (4L, boiler))
    val corpusDf = corpus.toDF("doc_id", "text")
    val index = Streaming.boilerplateChunkIndex(corpusDf, "text", "doc_id", chunkSize = 4)
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.stripKnownChunks(ms.toDF.toDF("doc_id", "text"), index, chunkSize = 4)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("strip_chunks").start()
    ms.addData(corpus: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("strip_chunks")
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().map { case (id, t, n) => id -> ((t, n)) }.toMap
    val batch = graft.ops.Dedup.stripDupChunks(corpusDf, "text", "doc_id", chunkSize = 4)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(streamed === batch, "stream strip must equal the batch operator row-for-row")
    assert(streamed(1L) === (("alpha beta gamma delta", 1L)))
    assert(streamed(4L) === (("", 0L)), "all-boilerplate doc survives with empty text")
  }

  test("cdcAgainstBase ≡ batch snapshotDiff on added/changed; unchanged arrivals drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)
    ).toDF("k", "v", "n")
    val arrivals = Seq(
      (1L, "a", 10L),   // unchanged re-delivery — must drop
      (2L, "b2", 20L),  // changed
      (4L, "d", 40L)    // added
    )
    val ms = MemoryStream[(Long, String, Long)]
    val q = Streaming.cdcAgainstBase(ms.toDF.toDF("k", "v", "n"), base,
        Seq("k"), Seq("v", "n"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cdc_out").start()
    ms.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cdc_out")
      .as[(Long, String)].collect().toSet
    assert(streamed === Set((2L, "changed"), (4L, "added")))
    // batch parity: snapshotDiff over (base, base ∪ arrivals-as-new-state)
    // restricted to added/changed classifies identically (removed is the
    // batch diff's exclusive verdict — key 3 never arrives here)
    val newSnap = Seq((1L, "a", 10L), (2L, "b2", 20L), (4L, "d", 40L))
      .toDF("k", "v", "n")
    val batch = graft.ops.Merge.snapshotDiff(base, newSnap, Seq("k"), Seq("v", "n"))
      .filter(col("status") =!= "removed")
      .as[(Long, String)].collect().toSet
    assert(batch === streamed)
  }

  test("cmsCounters: streaming sketch equals the batch build, updates across batches, state stays depth×width-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val depth = 4; val width = 8 // tiny width: real collisions among few items
    val b1 = Seq("a", "b", "a", "c")
    val b2 = Seq("a", "dd", "b", "a")
    val ms = MemoryStream[String]
    val q = Streaming.cmsCounters(ms.toDF.toDF("it"), "it", depth, width)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("cms_out").start()
    ms.addData(b1: _*)
    q.processAllAvailable()
    val mid = spark.table("cms_out").as[(Long, Long, Long)].collect()
      .map { case (r, b, c) => (r, b) -> c }.toMap
    ms.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("cms_out").as[(Long, Long, Long)].collect()
      .map { case (r, b, c) => (r, b) -> c }.toMap
    // state bound: never more than depth×width counter rows
    assert(fin.size <= depth * width)
    // batch parity: the stream's final counters == one batch build over all items
    val batch = graft.functions.CmsSketch.build((b1 ++ b2).toDF("it"), "it", depth, width)
      .as[(Long, Long, Long)].collect().map { case (r, b, c) => (r, b) -> c }.toMap
    assert(fin === batch)
    // genuinely incremental: batch 2 advanced some counter beyond its mid value
    assert(fin.exists { case (k, c) => c > mid.getOrElse(k, 0L) })
  }

  test("corpusIngest dedup state is watermark-bounded: dups within drop, after eviction re-emit") {
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox and the lazy dog is in the house to stay"
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streaming.corpusIngest(
      ms.toDF.toDF("doc_id", "text", "ts"), "ts", watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_ingest").start()
    // batch 1: the doc arrives twice inside one batch -> deduped to one
    ms.addData((1L, text, ts(10)), (2L, text, ts(10)))
    q.processAllAvailable()
    // batch 2: a different doc far in the future advances the watermark
    // past 10:00 + 1h, evicting the fingerprint's state
    ms.addData((3L, text + " entirely different suffix words here", ts(14)))
    q.processAllAvailable()
    // batch 3: the SAME text reappears after eviction -> emitted again
    // (the documented dropDuplicatesWithinWatermark relaxation)
    ms.addData((4L, text, ts(14)))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("wm_ingest").select("doc_id").as[Long].collect().sorted
    assert(emitted.count(id => id == 1L || id == 2L) == 1, "in-watermark dup not dropped")
    assert(emitted.contains(4L), "state never evicted: post-watermark doc was dropped")
  }

  test("corpusIngest restart from checkpoint: no duplicates, no loss") {
    import graft.ops.TextOps
    val inDir = Files.createTempDirectory("graft_cp_in")
    val cpDir = Files.createTempDirectory("graft_cp_chk")
    val outDir = Files.createTempDirectory("graft_cp_out")
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def start() = {
      val stream = spark.readStream.schema(docsSchema).parquet(inDir.toString)
        .withColumn("ts", timestamp_micros(col("doc_id")))
      Streaming.corpusIngest(stream, "ts")
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .start()
    }
    // run 1: original corpus
    Files.copy(Paths.get(sf("sf0.001") + "/documents.parquet"), inDir.resolve("a.parquet"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(outDir.toString).count()
    // while down: the same corpus arrives again (all dups — restored dedup
    // state must drop them) plus genuinely new documents (must pass)
    Files.copy(Paths.get(sf("sf0.001") + "/documents.parquet"), inDir.resolve("b.parquet"))
    val fresh = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" fresh restart suffix tokens")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    fresh.coalesce(1).write.parquet(inDir.resolve("c_dir").toString)
    Files.list(inDir.resolve("c_dir")).filter(_.toString.endsWith(".parquet"))
      .forEach(p => Files.copy(p, inDir.resolve("c.parquet")))
    // run 2: restart from the checkpoint
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir.toString)
    // no duplicates: every survivor emitted exactly once across both runs
    assert(out.groupBy("fingerprint").count().filter(col("count") > 1).count() === 0,
      "restart re-emitted documents the restored state should have dropped")
    // original corpus contributed nothing new in run 2
    assert(out.filter(col("doc_id") < 1000000L).count() === afterRun1)
    // no loss: run 2's fresh documents came through the restarted query
    val expectedFresh = fresh
      .filter(TextOps.qualityScore(col("text")) >= 0.2)
      .select(TextOps.fingerprint(col("text"))).distinct().count()
    val gotFresh = out.filter(col("doc_id") >= 1000000L).count()
    assert(gotFresh === expectedFresh, "fresh documents lost across restart")
    assert(gotFresh > 0)
  }

  test("mapGroupsWithState running user state matches batch latest-event per user") {
    val state = Streaming.runningUserState(spark, eventsBatch).collect()
      .map(s => s.user_id -> s).toMap
    val expected = eventsBatch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect().toMap
    val counts = eventsBatch.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    expected.foreach { case (uid, latestType) =>
      assert(state(uid).last_type === latestType, s"user $uid latest type")
      assert(state(uid).n_events === counts(uid), s"user $uid count")
    }
  }

  test("TopKAgg ≡ collect_list-then-slice, NaN / duplicate / ±0.0 keys included") {
    // The aggregator's contract: row-for-row interchangeable with
    // slice(array_sort(collect_list(struct(key, id))), 1, k) — including
    // the total-order corner cases raw double `<` gets wrong (NaN must
    // sort greatest like Spark's array_sort; -0.0 before 0.0).
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val grp = i % 7
      val key = rnd.nextInt(6) match {
        case 0 => Double.NaN
        case 1 => 0.0
        case 2 => -0.0
        case 3 => rnd.nextInt(3).toDouble // force duplicate keys
        case _ => rnd.nextDouble() * 2 - 1
      }
      (grp, key, rnd.nextInt(20).toLong)
    }
    val df = rows.toDF("grp", "key", "id")
    for (k <- Seq(1, 3, 17, 1000)) {
      val agg = df.groupBy("grp")
        .agg(graft.functions.TopK.topK(k)(col("key"), col("id")).as("topk"))
        .select(col("grp"), posexplode(col("topk")))
        .select(col("grp"), col("pos"), col("col._1").as("key"), col("col._2").as("id"))
      val ref = df.groupBy("grp")
        .agg(slice(array_sort(collect_list(struct(col("key"), col("id")))), 1, k)
          .as("topk"))
        .select(col("grp"), posexplode(col("topk")))
        .select(col("grp"), col("pos"), col("col.key"), col("col.id"))
      // Normalize -0.0 → 0.0 before comparing: both orderings equate ±0.0,
      // so which sign lands at a tied position is unspecified on both sides.
      def norm(d: Double): Long =
        java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      val a = agg.collect().map(r => (r.getInt(0), r.getInt(1),
        norm(r.getDouble(2)), r.getLong(3))).toSeq.sorted
      val b = ref.collect().map(r => (r.getInt(0), r.getInt(1),
        norm(r.getDouble(2)), r.getLong(3))).toSeq.sorted
      assert(a === b, s"TopKAgg diverged from collect_list baseline at k=$k")
    }
  }

  test("annProbe ≡ batch ivfQueryIndex: streaming retrieval against a prebuilt IVF index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val (centroids, corpus) = graft.ops.Similarity.ivfBuildIndex(emb, nlist = 8)
    val batch = graft.ops.Similarity
      .ivfQueryIndex(centroids, corpus, emb, k = 5, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet

    val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .as[(Long, Array[Float])].collect()
    val ms = MemoryStream[(Long, Array[Float])]
    val out = Streaming.annProbe(centroids, corpus,
      ms.toDF.toDF("vec_id", "embedding"), k = 5, nprobe = 3)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ann_probe").start()
    // two micro-batches with DISJOINT query halves: each query's top-k
    // state finalizes in its own batch, so the update-mode sink holds
    // exactly one version per (query, rank)
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    ms.addData(h1.toIndexedSeq); q.processAllAvailable()
    ms.addData(h2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ann_probe")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(streamed === batch,
      "streaming IVF probe diverged from the batch prebuilt-index query")
  }
}
