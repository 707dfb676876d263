package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Driver-side HTTP JSON ingestion — the S1/S2 surface
  * (`api_utils.py:37-108`): GET with bounded retries and linear backoff,
  * 429-aware, plus offset pagination that stops on a short page. Fetching
  * happens on the driver (the reference does the same from an Airflow
  * worker); results land in a DataFrame via schema-on-read, after which
  * everything is distributed. For true at-scale pull-ingestion a
  * DataSourceV2 would partition the URL space — not needed for parity
  * (SURVEY S1).
  */
object Http {

  final case class FetchResult(body: String, status: Int, attempts: Int)

  /** GET with `retries` attempts; retries on 429 and 5xx and on connection
    * errors, sleeping `backoffMs * attempt` between tries
    * (`api_utils.py:83-87` semantics).
    */
  def fetchWithRetry(url: String, retries: Int = 3, timeoutS: Int = 30,
                     backoffMs: Long = 500,
                     client: HttpClient = defaultClient): FetchResult = {
    var attempt = 0
    var last: FetchResult = FetchResult("", -1, 0)
    while (attempt < retries) {
      attempt += 1
      val outcome =
        try {
          val req = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofSeconds(timeoutS)).GET().build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          Some(FetchResult(resp.body(), resp.statusCode(), attempt))
        } catch {
          case _: java.io.IOException => None
        }
      outcome match {
        case Some(r) if r.status == 200 => return r
        case Some(r) => last = r
        case None => last = FetchResult("", -1, attempt)
      }
      if (attempt < retries) Thread.sleep(backoffMs * attempt)
    }
    last
  }

  /** Offset pagination: fetch `base?start=N&limit=pageSize` until a page
    * returns fewer than `pageSize` items per `countInPage`, capped at
    * `maxPages` (`nhl_raw_stats_skater_daily.py:69-110`).
    */
  def fetchPaged(base: String, pageSize: Int = 1000, maxPages: Int = 50,
                 countInPage: String => Int,
                 client: HttpClient = defaultClient): Seq[String] = {
    val out = Seq.newBuilder[String]
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val sep = if (base.contains("?")) "&" else "?"
      val r = fetchWithRetry(s"$base${sep}start=${page * pageSize}&limit=$pageSize",
        client = client)
      if (r.status != 200) done = true
      else {
        out += r.body
        if (countInPage(r.body) < pageSize) done = true
      }
      page += 1
    }
    out.result()
  }

  /** Landed JSON documents → DataFrame with schema-on-read (the
    * fetch→parallelize→from_json bridge from SURVEY S1).
    */
  def toDF(spark: SparkSession, docs: Seq[String], schema: StructType): DataFrame = {
    import spark.implicits._
    docs.toDF("json").select(from_json(col("json"), schema).as("payload"))
  }

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
}
