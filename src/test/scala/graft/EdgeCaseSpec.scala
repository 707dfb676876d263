package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Dedup, Similarity, TextOps}

/** Hostile-input hardening: null text, empty strings, single tokens,
  * unicode, and empty tables through every corpus operator. The driver's
  * oracle data is clean; a user's 100 TB crawl is not.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private def hostile = Seq(
    (1L, "normal document with several plain tokens inside"),
    (2L, ""),                      // empty string
    (3L, "single"),                // shorter than any shingle
    (4L, "naïve café über Zürich"),// unicode
    (5L, "a a a a a a a a")        // degenerate repetition
  ).toDF("doc_id", "text")

  private def withNull = hostile.union(
    Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))

  test("dedup family survives empty/short/null docs") {
    // null text: hash-groupBy keeps the row (null hash group)
    assert(Dedup.exactGroups(withNull, "text", "doc_id").count() == 6L)
    // docs shorter than n tokens produce no pairs, not errors
    val pairs = Dedup.ngramJaccardPairs(hostile, "text", "doc_id", n = 3, threshold = 0.1)
    assert(pairs.count() == 0L)
    assert(Dedup.minhashLshPairs(hostile, "text", "doc_id").count() == 0L)
    assert(Dedup.simhashPairs(hostile, "text", "doc_id").count() == 0L)
    // empty pair set: every doc is its own component
    val comp = Dedup.nearDupComponents(hostile, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("text analysis is total over empty and degenerate docs") {
    val m = hostile.select(col("doc_id"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.dupTokenRatio(col("text")).as("dt"),
      TextOps.dupShingleRatio(col("text"), 3).as("dg"),
      TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.size == 5)
    assert(m(5L).getAs[Double]("dt") == 1.0 - 1.0 / 8)
    assert(m(3L).getAs[Double]("dg") == 0.0) // too short -> 0 by contract
    assert(m(4L).getAs[String]("fp").nonEmpty) // unicode fingerprints fine
  }

  test("packing, split, and sampling are total and exact on tiny shards") {
    val packed = CorpusOps.packSequences(hostile, "text", "doc_id",
      shardCol = lit("s"), maxTokens = 4)
    assert(packed.count() == 5)
    // empty doc: split("") yields one empty token in Spark — packing still
    // counts it as width >= 1, never negative
    assert(packed.filter(col("n_tokens") < 1).count() == 0)
    val split = CorpusOps.hashSplit(hostile, "doc_id")
    assert(split.filter(col("split").isNull).count() == 0)
    assert(CorpusOps.stratifiedSample(hostile, "doc_id", "text",
      rates = Map.empty, defaultRate = 16).count() == 5)
  }

  test("bm25 and bigrams on the empty corpus return empty, not errors") {
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(CorpusOps.bm25(empty, "text", "doc_id").count() == 0L)
    assert(CorpusOps.bigramCounts(empty, "text", "doc_id").count() == 0L)
    assert(Dedup.ngramJaccardPairs(empty, "text", "doc_id").count() == 0L)
    assert(Dedup.nearDupComponents(empty, "doc_id",
      Dedup.ngramJaccardPairs(empty, "text", "doc_id")).count() == 0L)
  }

  test("ANN paths handle a corpus smaller than k and nlist") {
    val tiny = Seq(
      (1L, Array.fill(64)(0.1f)),
      (2L, Array.fill(64)(0.2f)),
      (3L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(tiny, tiny, k = 5).count() > 0)
    val planes = Similarity.hyperplanes(4, 64, 42L)
    assert(Similarity.lshTopKMultiProbe(tiny, planes, k = 5).count() >=
      Similarity.lshTopK(tiny, planes, k = 5).count())
    // nlist > corpus size: every vector seeds its own centroid
    assert(Similarity.ivfTopK(tiny, k = 2, nlist = 16, nprobe = 6).count() > 0)
  }

  test("r7 second-wave ops are total over hostile and empty inputs") {
    // prefix-filtered pairs: same no-pair result as the unfiltered join
    assert(Dedup.ngramPrefixPairs(hostile, "text", "doc_id", n = 3, threshold = 0.1)
      .count() == 0L)
    val empty = hostile.filter(col("doc_id") < 0)
    assert(Dedup.ngramPrefixPairs(empty, "text", "doc_id").count() == 0L)
    // intra-doc repeat strip: total (empty text keeps its one empty block;
    // the degenerate repetition doc collapses to one block)
    val strip = Dedup.stripIntraDocRepeats(hostile, "text", "doc_id", blockSize = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strip.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(strip(5L) === "a a")
    assert(strip(2L) === "")
    // BPE on a vocabulary of single-char words: no pairs, no merges, no error
    val single = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(CorpusOps.bpeTrainMerges(single, "text", rounds = 2).count() == 0L)
    assert(CorpusOps.bpeTrainMerges(empty, "text", rounds = 1).count() == 0L)
    // single-class classifier: every vote ties (d1*0 vs d0*N1 both 0), total
    val oneClass = CorpusOps.tokenVoteClassifier(hostile, "text", "doc_id", lit(true))
      .collect()
    assert(oneClass.length == 5 && oneClass.forall(_.getAs[Long]("score") == 0L))
  }

  test("bpeEncode: null document propagates as null output, not raise_error") {
    // contains() on NULL is NULL — without the explicit isNull branch the
    // otherwise(raise_error) fires and one null document kills the job.
    val out = CorpusOps.bpeEncode(withNull, "text", "doc_id",
        Seq("a" -> "a"), mergesPerStage = 128)
      .collect().map(r => r.getLong(0) -> r).toMap
    val nullRow = out(6L)
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3),
      "null text must encode to null counts/pieces")
    assert(out(1L).getLong(1) === 7L, "non-null docs must still encode")
    // the separator guard itself still fires on genuinely hostile text
    val bad = Seq((9L, "has" + CorpusOps.BpeSep + "separator"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      CorpusOps.bpeEncode(bad, "text", "doc_id", Seq("a" -> "a")).collect()
    }
    assert(ex.toString.contains("separator"), s"unexpected failure: $ex")
  }

  test("bloomSemiJoin with an EMPTY build side returns empty, not an error") {
    import graft.ops.RuntimeFilter
    val probe = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val build = probe.filter(col("k") < 0).select(col("k").as("bk"))
    assert(RuntimeFilter.bloomSemiJoin(probe, "k", build, "bk").count() == 0L)
  }

  test("filter cascade: rule order pins first_reject; hostile docs survive") {
    // 20 five-char tokens, 40% punct chars: only too_symbolic (and later
    // rules) fire, so first_reject must be the cascade-ordered one
    val symbolic = (1 to 20).map(i => f"w$i%02d!!").mkString(" ")
    val docs = (hostile.collect().map(r => (r.getLong(0), r.getString(1))).toSeq :+
      (7L, symbolic)).toDF("doc_id", "text")
    val rules = TextOps.cascadeRules(col("text"))
    val out = docs.select(col("doc_id"),
        TextOps.firstReject(rules).as("first_reject"),
        rules.map(_._2).reduce(_ || _).unary_!.as("keep"))
      .as[(Long, Option[String], Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(2L)._2.contains("too_short") && out(2L)._3.contains(false))
    assert(out(5L)._2.contains("too_short"))
    assert(out(7L)._2.contains("too_symbolic"))
    // a clean doc: 25 distinct plain words incl. a stopword, avg len 4.92
    val clean = (1 to 24).map(i => f"wrd$i%02d").mkString("the ", " ", "")
    val cleanOut = Seq((8L, clean)).toDF("doc_id", "text")
      .select(TextOps.firstReject(rules).as("fr"),
        rules.map(_._2).reduce(_ || _).unary_!.as("keep"))
      .as[(Option[String], Option[Boolean])].head()
    assert(cleanOut._1.isEmpty && cleanOut._2.contains(true))
  }

  test("luhnValid: the canonical mod-10 cases") {
    def luhn(s: String): Boolean =
      Seq(Tuple1(s)).toDF("n")
        .select(TextOps.luhnValid(col("n")).as("v")).as[Boolean].head()
    // 79927398713 is the textbook Luhn-valid number; every other final
    // digit fails
    assert(luhn("79927398713"))
    (0 to 9).filter(_ != 3).foreach { d =>
      assert(!luhn(s"7992739871$d"), s"check digit $d must fail")
    }
    // a known-valid 16-digit test PAN and an off-by-one corruption
    assert(luhn("4532015112830366"))
    assert(!luhn("4532015112830367"))
    // single digit: only 0 is valid (sum = digit)
    assert(luhn("0") && !luhn("5"))
    // empty string is false (not NULL: sequence(1,0) would otherwise walk
    // [1,0] and the fold would yield NULL); NULL input stays NULL
    assert(!luhn(""))
    val nullOut = Seq(Tuple1(Option.empty[String])).toDF("n")
      .select(TextOps.luhnValid(col("n")).as("v"))
      .as[Option[Boolean]].head()
    assert(nullOut.isEmpty)
  }

  test("canonicalizeUrl: RFC normalizations, and what must NOT normalize") {
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(TextOps.canonicalizeUrl(col("u")).as("c")).as[String].head()
    // the full stack at once
    assert(canon("HTTP://WWW.Ex.COM:80/A/b?utm_source=x&b=2&a=1#frag")
      === "http://ex.com/A/b?a=1&b=2")
    // https default port strips; non-default port survives
    assert(canon("https://ex.com:443/p") === "https://ex.com/p")
    assert(canon("http://ex.com:8080/p") === "http://ex.com:8080/p")
    assert(canon("https://ex.com:80/p") === "https://ex.com:80/p") // not https's default
    // no query → no '?'; utm-only query also collapses to none
    assert(canon("http://ex.com/p") === "http://ex.com/p")
    assert(canon("http://ex.com/p?utm_campaign=z") === "http://ex.com/p")
    // only the literal 'utm_' prefix strips -- a LIKE 'utm_%' would treat
    // '_' as a wildcard and drop utmx=/utm1=-style params too
    assert(canon("http://ex.com/p?utmx=1&utm1=2") === "http://ex.com/p?utm1=2&utmx=1")
    // path CASE is significant per RFC 3986 — it must survive
    assert(canon("http://ex.com/CaseSensitive") === "http://ex.com/CaseSensitive")
    // www only strips as a leading label
    assert(canon("http://notwww.ex.com/p") === "http://notwww.ex.com/p")
    assert(canon("http://www.www.ex.com/p") === "http://www.ex.com/p")
  }
}
