package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.Skew
import graft.sources.Http

/** HTTP ingestion (against a local stub server — zero egress), salted skew
  * join, and bucketed co-located joins.
  */
class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- HTTP

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handler(ex)
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetchWithRetry retries through 429/500 then lands the payload in a DataFrame") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet() match {
        case 1 => respond(ex, 429, "slow down")
        case 2 => respond(ex, 500, "boom")
        case _ => respond(ex, 200, """{"id": 7, "gameState": "OFF"}""")
      }
    } { base =>
      val r = Http.fetchWithRetry(s"$base/x", retries = 5, backoffMs = 1)
      assert(r.status === 200 && r.attempts === 3)
      val df = Http.toDF(spark, Seq(r.body), StructType.fromDDL("id LONG, gameState STRING"))
      assert(df.select("payload.id").as[Long].collect()(0) === 7L)
    }
  }

  test("fetchWithRetry gives up after N attempts on persistent failure") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex => hits.incrementAndGet(); respond(ex, 503, "down") } { base =>
      val r = Http.fetchWithRetry(s"$base/x", retries = 3, backoffMs = 1)
      assert(r.status === 503 && hits.get() === 3)
    }
  }

  test("fetchPaged stops on the first short page and caps pages") {
    withServer { ex =>
      val q = ex.getRequestURI.getQuery // start=N&limit=M
      val start = q.split("&")(0).split("=")(1).toInt
      val n = if (start == 0) 3 else 1 // second page is short
      respond(ex, 200, s"""{"items": ${(0 until n).mkString("[", ",", "]")}}""")
    } { base =>
      val pages = Http.fetchPaged(s"$base/stats", pageSize = 3, maxPages = 50,
        countInPage = b => b.count(_ == ',') + (if (b.contains("[]")) 0 else 1))
      assert(pages.length === 2)
    }
  }

  // ------------------------------------------------------------ skew salt

  test("saltedJoin spreads a hot key and matches the plain join result") {
    // 10k rows all on one key + a long tail
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(100).select((col("id") + 2).as("k"), col("id").as("v")))
    val right = Seq((1L, "hot"), (5L, "cold")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy("k", "name").count()
      .as[(Long, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).groupBy("k", "name").count()
      .as[(Long, String, Long)].collect().toSet
    assert(salted === plain)
    assert(plain.exists(_._3 == 10000L))
  }

  test("saltedTopK matches the single-window top-k on a hot-group fixture") {
    import org.apache.spark.sql.expressions.Window
    // one hot group (10k rows), one group smaller than k, one tail group;
    // values collide heavily so the tiebreaker must carry the ordering
    val df = spark.range(10000)
      .select(lit("hot").as("g"), col("id").as("uid"), (col("id") % 7).cast("double").as("v"))
      .union(spark.range(2).select(lit("tiny").as("g"), (col("id") + 20000).as("uid"),
        col("id").cast("double").as("v")))
      .union(spark.range(100).select(lit("tail").as("g"), (col("id") + 30000).as("uid"),
        col("id").cast("double").as("v")))
    val order = Seq(col("v").desc, col("uid").asc)
    val single = df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(order: _*)))
      .filter(col("rank") <= 5)
      .select("g", "rank", "uid", "v").as[(String, Int, Long, Double)].collect().toSet
    Seq(1, 4, 16).foreach { salt =>
      val got = Skew.saltedTopK(df, Seq("g"), order, "uid", k = 5, salt = salt)
        .select("g", "rank", "uid", "v").as[(String, Int, Long, Double)].collect().toSet
      assert(got === single, s"salt=$salt")
    }
    // stable under a different physical partitioning (salt is content-hashed)
    val repart = Skew.saltedTopK(df.repartition(13), Seq("g"), order, "uid", k = 5, salt = 8)
      .select("g", "rank", "uid", "v").as[(String, Int, Long, Double)].collect().toSet
    assert(repart === single)
  }

  test("saltedTopK phase 2 sees at most salt*k rows per group") {
    // reconstruct phase 1 with the operator's own expressions: the survivor
    // count bounds the final per-group task's input regardless of skew
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(50000).select(lit("hot").as("g"), col("id").as("uid"),
      (col("id") % 3).cast("double").as("v"))
    val k = 5; val salt = 8
    val local = Window.partitionBy(col("g"), col("__salt"))
      .orderBy(col("v").desc, col("uid").asc)
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(col("uid")), lit(salt)).cast("int"))
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
    assert(phase1.count() <= salt.toLong * k, "phase-1 survivors exceed salt*k")
  }

  test("saltedTopK ties at k without a tiebreaker: VALUES exact, identity not promised") {
    // order by v only — the k-boundary falls inside a 250-row tie class.
    // The documented contract under a non-total order: the top-k VALUE
    // multiset is still exact (a locally-discarded tied row is dominated-
    // or-equaled by k survivors in its salt bucket), but WHICH tied rows
    // carry those values may differ run to run — so assert values, not uids
    val df = spark.range(1000).select(lit("g").as("g"), col("id").as("uid"),
      (col("id") % 4).cast("double").as("v"))
    val got = Skew.saltedTopK(df, Seq("g"), Seq(col("v").desc), "uid", k = 5, salt = 8)
      .select("rank", "v").as[(Int, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to 5), "ranks must be dense 1..k")
    assert(got.forall(_._2 == 3.0), s"top-5 values must all come from the tie class: ${got.mkString(",")}")
  }

  test("saltedTopK rejects inputs carrying reserved columns instead of clobbering them") {
    val df = spark.range(10).select(lit("g").as("g"), col("id").as("uid"),
      col("id").cast("double").as("v"), lit(0).as("rank"))
    val e = intercept[IllegalArgumentException] {
      Skew.saltedTopK(df, Seq("g"), Seq(col("v").desc, col("uid").asc), "uid", k = 3, salt = 4)
    }
    assert(e.getMessage.contains("rank"))
  }

  // ------------------------------------------------------------ bucketing

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // in-memory catalog forgets tables between JVMs but the files persist —
    // clear them so saveAsTable doesn't trip over a previous run
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(new java.net.URI(wh).getPath, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, plan was:\n$plan")
    assert(joined.count() === li.count())
    info(s"warehouse at $wh, bucketed join shuffle-free")
  }

  test("rebalancedParquet coalesces a many-tiny-partition write to few right-sized files") {
    val d = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") % 97)
      .repartition(64) // simulate the post-shuffle many-tiny-files state
    df.write.mode("overwrite").parquet(s"$d/naive")
    graft.sources.Sinks.rebalancedParquet(df, s"$d/balanced")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    val naive = parts(s"$d/naive")
    val balanced = parts(s"$d/balanced")
    info(s"naive=$naive files, rebalanced=$balanced files")
    assert(naive == 64)
    assert(balanced < 8, s"rebalance left $balanced files")
    // content identical
    assert(spark.read.parquet(s"$d/balanced").as[(Long, Long)].collect().toSet ===
      spark.read.parquet(s"$d/naive").as[(Long, Long)].collect().toSet)
  }

  test("rebalancedParquet with partitionBy writes hive layout, right-sized per dir") {
    val d = java.nio.file.Files.createTempDirectory("graft_sink_p").toString
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("part", (col("id") % 3).cast("string"))
      .repartition(32)
    graft.sources.Sinks.rebalancedParquet(df, s"$d/out", partitionBy = Seq("part"))
    val dirs = new java.io.File(s"$d/out").listFiles().filter(_.getName.startsWith("part="))
    assert(dirs.length == 3)
    dirs.foreach { dir =>
      val files = dir.listFiles().count(_.getName.startsWith("part-"))
      assert(files < 8, s"${dir.getName} has $files files")
    }
    assert(spark.read.parquet(s"$d/out").count() == 5000)
  }

  test("bucketedTable: same-key same-count join plans with zero exchanges") {
    // managed tables land in the gitignored ./spark-warehouse; DROP cleans up
    val facts = spark.range(0, 20000).toDF("k")
      .withColumn("v", col("k") % 1000)
    val dims = spark.range(0, 2000).toDF("k")
      .withColumn("name", concat(lit("n"), col("k")))
    graft.sources.Sinks.bucketedTable(facts, "b_facts", "k", 8, sortCols = Seq("k"))
    graft.sources.Sinks.bucketedTable(dims, "b_dims", "k", 8, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the whole point of bucketing: neither side shuffles at read time
      assert(!plan.contains("Exchange"), s"bucketed join still exchanges:\n$plan")
      // result parity vs the unbucketed join
      assert(joined.count() ===
        facts.join(dims, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bloomSemiJoin equals the exact semi join, even with an FP-heavy tiny sketch") {
    import graft.ops.RuntimeFilter
    val probe = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val build = (1L to 2000L).filter(_ % 13 == 0).map(i => (i, "b")).toDF("bk", "tag")
    val exact = probe.join(build.select(col("bk").as("k")).distinct(), Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    val roomy = RuntimeFilter.bloomSemiJoin(probe, "k", build, "bk")
      .as[(Long, String)].collect().toSet
    assert(roomy === exact)
    // 64 bits for 153 keys: most probes are false positives — output must
    // not change (the exact join removes them; the bloom never drops a match)
    val tiny = RuntimeFilter.bloomSemiJoin(probe, "k", build, "bk",
      expectedItems = 8L, numBits = 64L)
      .as[(Long, String)].collect().toSet
    assert(tiny === exact)
    // soundness of the prefilter alone: every true match passes the bloom
    val bloom = org.apache.spark.sql.GraftSqlBridge.scalarSubquery(
      build.agg(RuntimeFilter.bloomOf(col("bk"), 8L, 64L).as("bf")))
    val kept = probe.filter(RuntimeFilter.mightContain(bloom, col("k")))
      .select("k").as[Long].collect().toSet
    assert(exact.map(_._1).subsetOf(kept))
  }

  test("bloom sizing saturates (not collapses) on unknown / overflowing plan stats") {
    import graft.ops.RuntimeFilter
    // the r10 medium advisory: unknown stats default sizeInBytes to
    // Long.MaxValue (and joined plans multiply past it) — the old raw
    // .toLong wrapped negative at `items * 10L`, silently collapsing the
    // sketch to the 64 Ki minimum for exactly the large build sides the
    // stats sizing targets. The estimate must instead saturate at the
    // bits-cap-equivalent item count.
    val itemsCap = 64L * 1024 * 1024 / 10
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bk",
        org.apache.spark.sql.types.LongType)))
    // LogicalRDD: no computable stats → sizeInBytes = defaultSizeInBytes
    // (Long.MaxValue)
    val unknown = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))), schema)
    val estUnknown = RuntimeFilter.estimatedBuildItems(unknown)
    assert(estUnknown === itemsCap, s"unknown stats must saturate, got $estUnknown")
    // join of two unknown-stats plans: sizeInBytes is a BigInt PRODUCT far
    // beyond Long.MaxValue — the pre-fix wrap point
    val joined = unknown.join(
      unknown.withColumnRenamed("bk", "bk2"), col("bk") === col("bk2"))
    val estJoined = RuntimeFilter.estimatedBuildItems(joined)
    assert(estJoined === itemsCap, s"overflowing stats must saturate, got $estJoined")
    // and a known tiny build side still sizes small (floor 64)
    val known = (1L to 5L).map(i => (i, "b")).toDF("bk", "tag")
    val estKnown = RuntimeFilter.estimatedBuildItems(known)
    assert(estKnown >= 64L && estKnown < 100000L,
      s"known-small build should stay near the floor, got $estKnown")
  }
}
