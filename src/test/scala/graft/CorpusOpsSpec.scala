package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Dedup}

class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bm25: tf/df are exact and scores rank rare terms above common ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana durian")
    ).toDF("doc_id", "text")
    val scored = CorpusOps.bm25(docs, "text", "doc_id")
    val rows = scored.collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // tf: apple appears twice in doc 1; df: banana in all 3 docs
    assert(rows((1L, "apple"))._1 == 2L)
    assert(rows((1L, "banana"))._2 == 3L)
    assert(rows((2L, "cherry"))._2 == 1L)
    // idf monotonicity: in the same doc, the everywhere-term scores below
    // the unique term despite equal tf
    assert(rows((2L, "cherry"))._5 > rows((2L, "banana"))._5)
    // hand-computed check for (doc 2, cherry): tf=1, df=1, N=3, dl=2,
    // avgdl = 8/3; Spark's ln is StrictMath (see CorpusOps scaladoc)
    val idfArg = 1.0 + (3L - 1L + 0.5) / (1L + 0.5)
    val tfWeight = (1L * 2.2) / (1L + 1.2 * (0.25 + 0.75 * (2.0 / (8.0 / 3.0))))
    val (_, _, gotArg, gotW, gotScore) = rows((2L, "cherry"))
    assert(gotArg == idfArg)
    assert(gotW == tfWeight)
    assert(gotScore == StrictMath.log(idfArg) * tfWeight)
  }

  test("packSequences: per-shard exclusive offsets, cut every maxTokens") {
    val docs = Seq(
      (1L, "a", ("w " * 9).trim),  // 9 tokens
      (2L, "a", ("x " * 5).trim), // 5 tokens
      (3L, "a", ("y " * 4).trim), // 4 tokens
      (4L, "b", ("z " * 7).trim)  // separate shard restarts at 0
    ).toDF("doc_id", "shard_key", "text")
    val packed = CorpusOps.packSequences(docs, "text", "doc_id",
      shardCol = col("shard_key"), maxTokens = 8)
      .orderBy("shard", "doc_id")
      .select("doc_id", "shard", "n_tokens", "tok_offset", "seq_id", "pos_in_seq")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(packed(0) == ((1L, "a", 9L, 0L, 0L, 0L)))
    assert(packed(1) == ((2L, "a", 5L, 9L, 1L, 1L)))   // starts in seq 1 at pos 1
    assert(packed(2) == ((3L, "a", 4L, 14L, 1L, 6L)))
    assert(packed(3) == ((4L, "b", 7L, 0L, 0L, 0L)))   // shard b restarts
  }

  test("packSequences packByBpeEstimate: budgets by ceil(chars/4), carries both counts") {
    val docs = Seq(
      (1L, "a", "abcdefgh"),         // 8 chars -> est 2; 1 ws token
      (2L, "a", "ab cd"),            // 5 chars -> est 2; 2 ws tokens
      (3L, "a", "abcdefghi")         // 9 chars -> est 3
    ).toDF("doc_id", "shard_key", "text")
    val packed = CorpusOps.packSequences(docs, "text", "doc_id",
      shardCol = col("shard_key"), maxTokens = 3, packByBpeEstimate = true)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_tokens_est", "tok_offset", "seq_id", "pos_in_seq")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(packed(0) == ((1L, 1L, 2L, 0L, 0L, 0L)))
    assert(packed(1) == ((2L, 2L, 2L, 2L, 0L, 2L)))  // offset 2 = doc 1's ESTIMATE
    assert(packed(2) == ((3L, 1L, 3L, 4L, 1L, 1L)))  // crosses the 3-token cut
    // default path is schema-unchanged (no n_tokens_est column)
    val plain = CorpusOps.packSequences(docs, "text", "doc_id",
      shardCol = col("shard_key"), maxTokens = 3)
    assert(!plain.columns.contains("n_tokens_est"))
  }

  test("estBpeTokens calibration: within the documented [1.0, 2.0] band of whitespace counts") {
    // English-ish corpus text averages ~5.5 chars per whitespace token
    // (measured est/ws in [1.17, 1.6] at sf0.01), so the chars/4 estimate
    // must land above whitespace counts but below 2x — per doc, not just
    // on average. A tokenizer-calibration regression breaks this band.
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val offBand = docs.select(
        (CorpusOps.estBpeTokens(col("text")).cast("double") /
          size(split(col("text"), " "))).as("ratio"))
      .filter(col("ratio") < 1.0 || col("ratio") > 2.0)
    assert(offBand.count() === 0)
  }

  test("knTrigram: counts and the exact KN op tree on a hand-computed corpus") {
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // trigram tokens: (a,b,c)x2, (b,c,a), (c,a,b), (a,b,d); V = {a,b,c,d}
    val out = CorpusOps.knTrigram(docs, "text", minCount = 2).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("trigram") === "a b c")
    assert(r.getAs[Long]("c3") === 2L)      // two occurrences
    assert(r.getAs[Long]("c12") === 3L)     // (a,b,*) tokens: abc,abc,abd
    assert(r.getAs[Long]("t12") === 2L)     // continuations of (a,b): c,d
    assert(r.getAs[Long]("n_cont3") === 1L) // predecessors of (b,c): a
    assert(r.getAs[Long]("n_ctx2") === 2L)  // N1+(. b .): (a,c),(a,d)
    assert(r.getAs[Long]("t2") === 2L)      // types after b: c,d
    // the EXACT op sequence the query and oracle both execute
    val want = (2 - 0.75) / 3 + (0.75 * 2 / 3) *
      ((1 - 0.75) / 2 + (0.75 * 2 / 2) * (1.0 / 4))
    assert(r.getAs[Double]("p_kn") === want)
  }

  test("quantileNormalize: rank-interpolation onto the pooled distribution, hand-checked") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L), (5L, "b", 200L)
    ).toDF("doc_id", "src", "sc")
    val out = CorpusOps.quantileNormalize(docs, "sc", "src", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // pooled sorted: 10,20,30,100,200 (N=5); midpoint quantile per source rank
    assert(out(1L) === ((1L, 10L)))   // a p=1/6  -> idx 1
    assert(out(2L) === ((3L, 30L)))   // a p=3/6  -> idx 3
    assert(out(3L) === ((5L, 200L)))  // a p=5/6  -> idx 5
    assert(out(4L) === ((2L, 20L)))   // b p=1/4  -> idx 2
    assert(out(5L) === ((4L, 100L)))  // b p=3/4  -> idx 4
  }

  test("bigramCounts: all occurrences counted, not per-doc-distinct") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val counts = CorpusOps.bigramCounts(docs, "text", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("a b" -> 3L, "b a" -> 1L))
  }

  test("repetition ratios: duplicate tokens and 3-gram positions") {
    import graft.ops.TextOps
    val docs = Seq((1L, "x x x x"), (2L, "a b"), (3L, "one two three four"))
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
      TextOps.dupTokenRatio(col("text")).as("dt"),
      TextOps.dupShingleRatio(col("text"), 3).as("dg"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((0.75, 0.5)))   // 1 distinct of 4 tokens; 1 distinct of 2 trigrams
    assert(r(2L) == ((0.0, 0.0)))    // too short for trigrams -> 0 by contract
    assert(r(3L) == ((0.0, 0.0)))    // no repetition
  }

  test("hashSplit: total, deterministic, and near the 12/2/2 sixteenth fractions") {
    val ids = (0L until 2000L).toDF("doc_id")
    val s1 = CorpusOps.hashSplit(ids, "doc_id")
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") / 2000.0 - 12.0 / 16) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 2.0 / 16) < 0.05)
    assert(math.abs(counts("test") / 2000.0 - 2.0 / 16) < 0.05)
    // repartitioning can't move a row between splits
    val s2 = CorpusOps.hashSplit(ids.repartition(7), "doc_id")
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("charCollisionFaces: hand-computed integer faces, empty text, and split-artifact immunity") {
    import graft.ops.TextOps
    // "aab cc": a=2 b=1 ' '=1 c=2 → n=6, Σcnt²=4+1+1+4=10, top=2
    val out = Seq("aab cc", "", "zzzz").toDF("text")
      .select(TextOps.charCollisionFaces(col("text")).as("f"))
      .select("f.n_chars_m", "f.char_sq_sum", "f.top_char_cnt")
      .as[(Long, Long, Long)].collect()
    assert(out(0) == ((6L, 10L, 2L)))
    assert(out(1) == ((0L, 0L, 0L)))   // not (1,1,1) — no split("") empty artifact
    assert(out(2) == ((4L, 16L, 4L)))  // single-char doc: collision prob 1
  }

  test("leakageSafeSplit: no near-dup pair straddles a split boundary; singletons match hashSplit") {
    // 3 clusters of near-dups (chained pairs) + 4 singletons
    val docs = (0L until 10L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val out = CorpusOps.leakageSafeSplit(docs, "doc_id", pairs)
    assert(out.count() == 10L)
    // every pair lands on the same side
    val straddle = pairs
      .join(out.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(out.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0L)
    // whole cluster {0,1,2} shares one split even though 0-2 are not paired directly
    assert(out.filter(col("doc_id") <= 2).select("split").distinct().count() == 1L)
    // singletons (7,8,9) split exactly like plain hashSplit on their own id
    val solo = CorpusOps.hashSplit((7L to 9L).toDF("doc_id"), "doc_id")
    assert(out.filter(col("doc_id") >= 7).select("doc_id", "split")
      .exceptAll(solo.select("doc_id", "split")).count() == 0L)
  }

  test("stratifiedSample: per-stratum rates hold and sampling is deterministic") {
    val docs = (0L until 3000L).toDF("doc_id")
      .withColumn("lang", expr("CASE WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'es' ELSE 'de' END"))
    val kept = CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 4, "es" -> 8), defaultRate = 12)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 1000.0 - 4.0 / 16) < 0.06)
    assert(math.abs(byLang("es") / 1000.0 - 8.0 / 16) < 0.06)
    assert(math.abs(byLang("de") / 1000.0 - 12.0 / 16) < 0.06)
    // rate 16 keeps everything, rate 0 keeps nothing
    assert(CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      rates = Map.empty, defaultRate = 16).count() == 3000L)
    assert(CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      rates = Map.empty, defaultRate = 0).count() == 0L)
  }

  test("mixtureSample: saturates the scarcest-relative source, matches target shares, drops weight 0") {
    // 3 sources, 600/600/300 rows; weights 1:1:4 -> shares 1/6,1/6,4/6.
    // T = min(600/(1/6), 600/(1/6), 300/(4/6)) = 450: source c is the
    // binding source and must be kept IN FULL.
    val docs = (0L until 1500L).map(i =>
      (i, if (i < 600) "a" else if (i < 1200) "b" else "c")).toDF("doc_id", "src")
    val out = CorpusOps.mixtureSample(docs, "doc_id", "src", Map("c" -> 4L))
    val got = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(got("c") === 300L) // binding source saturated, rate exactly 1
    // a and b target 1/6 * 450 = 75 each; md5 uniform is ~binomial(600, 1/8)
    assert(math.abs(got("a") - 75L) < 30 && math.abs(got("b") - 75L) < 30)
    // deterministic: same rows both runs
    val again = CorpusOps.mixtureSample(docs, "doc_id", "src", Map("c" -> 4L))
    assert(out.select("doc_id").as[Long].collect().sorted
      === again.select("doc_id").as[Long].collect().sorted)
    // weight 0 drops the source entirely and re-normalizes over the rest
    val dropped = CorpusOps.mixtureSample(docs, "doc_id", "src",
      Map("c" -> 0L, "a" -> 1L, "b" -> 1L))
    assert(dropped.filter($"src" === "c").count() === 0L)
    assert(dropped.filter($"src" === "a").count() === 600L) // rate 1: both saturate
  }

  test("vocabTopK: exact tf/df, dense rank order, monotone coverage curve") {
    val docs = Seq(
      (1L, "a a a b c"),
      (2L, "a b b d"),
      (3L, "a c e")
    ).toDF("doc_id", "text")
    // tf: a=5 b=3 c=2 d=1 e=1 (total 12); df: a=3 b=2 c=2 d=1 e=1
    val v = CorpusOps.vocabTopK(docs, "text", "doc_id", k = 3)
      .orderBy("rank").collect()
    assert(v.map(_.getAs[String]("token")).toSeq === Seq("a", "b", "c"))
    assert(v.map(_.getAs[Long]("tf")).toSeq === Seq(5L, 3L, 2L))
    assert(v.map(_.getAs[Long]("df")).toSeq === Seq(3L, 2L, 2L))
    assert(v.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    val shares = v.map(_.getAs[Double]("cum_share")).toSeq
    assert(shares === Seq(5.0 / 12, 8.0 / 12, 10.0 / 12))
    // ties rank by token asc deterministically: d before e at the cut
    val v4 = CorpusOps.vocabTopK(docs, "text", "doc_id", k = 4)
      .orderBy("rank").collect()
    assert(v4.last.getAs[String]("token") === "d")
  }

  test("hashUniform: exact md5 32-bit prefix over 2^32, in [0,1)") {
    val vals = (0L until 200L).toDF("id")
      .select(CorpusOps.hashUniform($"id").as("u"), $"id").as[(Double, Long)].collect()
    vals.foreach { case (u, id) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      assert(u === java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0)
      assert(u >= 0.0 && u < 1.0)
    }
  }

  test("nearDupComponents: transitive chains collapse to min id, singletons self-label") {
    val docs = Seq(10L, 11L, 12L, 20L, 30L).toDF("doc_id")
    // chain 10-11, 11-12 (10 and 12 never directly paired) + pair-free 30
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = Dedup.nearDupComponents(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp(10L) == 10L)
    assert(comp(11L) == 10L)
    assert(comp(12L) == 10L)   // transitive: greedy collapse can't see this
    assert(comp(20L) == 20L)
    assert(comp(30L) == 30L)   // singleton
  }

  test("nearDupComponents: empty pair set is trivially converged even at maxIters=1") {
    // regression (ADVICE r14): the fused init counts as round 1, so with
    // maxIters=1 the loop body never runs — an EMPTY edge set must still
    // report convergence (all singletons), not throw
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val comp = Dedup.nearDupComponents(docs, "doc_id", none, maxIters = 1)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("nearDupComponents: non-convergence fails loudly by default, opt-out warns") {
    // 40-vertex chain: diameter 39, far beyond what maxIters=1 can label
    val docs = (0L until 40L).toDF("doc_id")
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.nearDupComponents(docs, "doc_id", pairs, maxIters = 1).count()
    }
    assert(ex.getMessage.contains("did NOT converge"))
    // opt-out: completes with partially-propagated labels (some vertex is
    // NOT yet labeled 0) instead of throwing
    val partial = Dedup.nearDupComponents(docs, "doc_id", pairs,
      maxIters = 1, failOnNonConvergence = false)
      .as[(Long, Long)].collect().toMap
    assert(partial.size == 40)
    assert(partial.values.exists(_ != 0L))
    // and the full budget converges the same chain to component 0
    val full = Dedup.nearDupComponents(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(full.values.forall(_ == 0L))
  }

  test("shuffleShard: exact partition into shards, contiguous positions, seed changes order") {
    val docs = (0L until 200L).toDF("doc_id")
    val out = CorpusOps.shuffleShard(docs, "doc_id", nShards = 4)
      .select("doc_id", "shuffle_key", "shard", "shard_pos")
      .as[(Long, String, Int, Int)].collect()
    // every doc exactly once, shards in range
    assert(out.length == 200 && out.map(_._1).distinct.length == 200)
    assert(out.forall(r => r._3 >= 0 && r._3 < 4))
    // positions are 1..|shard| with no gaps, and follow shuffle_key order
    out.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1 to rows.length))
      assert(byPos.map(_._2).toSeq == byPos.map(_._2).sorted.toSeq)
    }
    // the permutation is NOT the input order (md5 actually shuffles): the
    // first-positioned docs across shards aren't ids 0..3
    val firsts = out.filter(_._4 == 1).map(_._1).sorted.toSeq
    assert(firsts != (0L until 4L))
    // deterministic under recomputation, different under a new seed
    val again = CorpusOps.shuffleShard(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
    assert(again.sortBy(_._1).toSeq ==
      out.map(r => (r._1, r._3, r._4)).sortBy(_._1).toSeq)
    val epoch2 = CorpusOps.shuffleShard(docs, "doc_id", nShards = 4, seed = "1")
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
    assert(epoch2.sortBy(_._1).toSeq !=
      out.map(r => (r._1, r._3, r._4)).sortBy(_._1).toSeq)
    // reserved-name guard
    val ex = intercept[IllegalArgumentException] {
      CorpusOps.shuffleShard(docs.withColumn("shard", lit(1)), "doc_id", 4)
    }
    assert(ex.getMessage.contains("shard"))
  }

  test("dsirSample: integer votes, exact share, deterministic acceptance") {
    val docs = Seq(
      (1L, "t", "zebra yak zebra yak"),
      (2L, "o", "cat dog cat dog"),
      (3L, "o", "zebra yak cat dog")
    ).toDF("doc_id", "source", "text")
    val out = CorpusOps.dsirSample(docs, "text", "doc_id", "source", "t")
      .as[(Long, String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // C=12, T=4; zebra/yak: t_cnt=2 -> 2*12 > 3*4 votes; cat/dog: 0 votes
    assert(out(1L)._3 == 4L && out(1L)._4 == 4L && out(1L)._5 == 1.0)
    assert(out(2L)._3 == 0L && out(2L)._5 == 0.0)
    assert(out(3L)._3 == 2L && out(3L)._5 == 0.5)
    // keep: rate(1.0 share)=1 -> always kept; rate(0)=0 -> never;
    // doc 3 rate=(0.5-0.3)*2.5=0.5, compare vs the md5 32-bit uniform
    assert(out(1L)._6 && !out(2L)._6)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val uniform = java.lang.Long.parseLong(md.substring(0, 8), 16) / 4294967296.0
    assert(out(3L)._6 == (uniform < 0.5))
  }

  test("bpeTrainMerges: hand-computed merges, lexicographic ties, greedy left fold") {
    // words: low x3, lower x1, lowest x1.
    // r0 pairs: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    //   -> tie at 5 breaks lexicographically: (l,o)
    // r1: (lo,w)=5 (w,e)=2 ... -> (lo,w)
    // r2: low x3 is a single symbol; (low,e)=2 wins
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeTrainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toList
    assert(merges === List((0, "l", "o", 5L), (1, "lo", "w", 5L), (2, "low", "e", 2L)))
  }

  test("bpeTrainMerges: overlapping pair merges left-to-right (aaa -> [aa, a])") {
    // "aaa" x2: r0 pair (a,a)=4 (two adjacent pairs per word x2 words);
    // merged greedily left-to-right each word becomes [aa, a], so r1 sees
    // (aa,a)=2 — the reference BPE fold, not a regex-global replace.
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeTrainMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toList
    assert(merges === List((0, "a", "a", 4L), (1, "aa", "a", 2L)))
  }

  test("bpeEncode: shipped merges apply in order, greedy per word, counts exact") {
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    val out = CorpusOps.bpeEncode(docs, "text", "doc_id",
        Seq("l" -> "o", "lo" -> "w", "low" -> "e"))
      .as[(Long, Long, Long, Seq[String])].collect()(0)
    // low -> [low]; lower -> [lowe, r]; lowest -> [lowe, s, t]
    assert(out === ((1L, 3L, 6L, Seq("low", "lowe", "r", "lowe", "s", "t"))))
    // encode(train(corpus)) round-trip: training's own merges re-derive
    // the same segmentation the trainer's word table ends at
    val merges = CorpusOps.bpeTrainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => m._2 -> m._3).toSeq
    val rt = CorpusOps.bpeEncode(docs, "text", "doc_id", merges)
      .as[(Long, Long, Long, Seq[String])].collect()(0)
    assert(rt._3 < 3L * 6L, "trained merges failed to compress at all")
  }

  test("bpeEncode: 512+ merges run batched with identical greedy semantics") {
    // a production artifact ships tens of thousands of merges; the batched
    // path (mergesPerStage projections + localCheckpoint between) must
    // equal the single-projection plan symbol-for-symbol. Real merges are
    // INTERLEAVED among no-op padding so they straddle stage boundaries.
    val docs = Seq((1L, "low lower lowest aaa")).toDF("doc_id", "text")
    val real = Map(10 -> ("l" -> "o"), 100 -> ("a" -> "a"),
      200 -> ("lo" -> "w"), 400 -> ("low" -> "e"))
    val merges = (0 until 520).map(i => real.getOrElse(i, s"q$i" -> "z"))
    // pure-Scala reference of the greedy left fold
    def encWord(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList) { case (sym, (a, b)) =>
        sym.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    val expected = "low lower lowest aaa".split(' ').toSeq.flatMap(encWord)
    assert(expected === Seq("low", "lowe", "r", "lowe", "s", "t", "aa", "a"))
    val batched = CorpusOps.bpeEncode(docs, "text", "doc_id", merges)
      .as[(Long, Long, Long, Seq[String])].collect()(0)
    assert(batched === ((1L, 4L, expected.size.toLong, expected)))
    val other = CorpusOps.bpeEncode(docs, "text", "doc_id", merges,
        mergesPerStage = 7)
      .as[(Long, Long, Long, Seq[String])].collect()(0)
    assert(other === batched, "stage-boundary placement changed the encoding")
  }

  test("tokenVoteScore: external (token,weight) table, unknown tokens 0, all-miss doc kept") {
    val docs = Seq(
      (1L, "good nice meh"),
      (2L, "bad meh"),
      (3L, "unseen words only"),
      (4L, "good good")
    ).toDF("doc_id", "text")
    // the shipped-weights fixture: the exported-model (token, weight) shape
    val weights = Seq(("good", 2L), ("nice", 1L), ("bad", -3L), ("meh", 0L))
      .toDF("token", "weight")
    val out = CorpusOps.tokenVoteScore(docs, "text", "doc_id", weights)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 3L, true)))   // zero-weight hit still counts in n_hit
    assert(out(2L) === ((2L, 2L, -3L, false)))
    assert(out(3L) === ((3L, 0L, 0L, false)))  // vocabulary miss ≠ dropped row
    assert(out(4L) === ((4L, 1L, 2L, true)))   // repeats are one presence feature
  }

  test("tokenVoteScore: duplicate (token,weight) rows collapse by sum — no fan-out") {
    // The weights contract: duplicates sum (linear-model composition) and
    // never multiply the token stream, so n_hit counts matched TOKENS,
    // not matched weight rows, and score is stable.
    val docs = Seq((1L, "good bad meh")).toDF("doc_id", "text")
    val dup = Seq(("good", 2L), ("good", 3L), ("bad", -1L))
      .toDF("token", "weight")
    val out = CorpusOps.tokenVoteScore(docs, "text", "doc_id", dup)
      .as[(Long, Long, Long, Boolean)].collect()(0)
    // good = 2+3 summed once, bad = -1, meh = vocabulary miss
    assert(out === ((1L, 2L, 4L, true)),
      "duplicate weight rows fanned out the join or changed the sum")
    // and identical to the same model pre-summed by the exporter
    val summed = Seq(("good", 5L), ("bad", -1L)).toDF("token", "weight")
    val ref = CorpusOps.tokenVoteScore(docs, "text", "doc_id", summed)
      .as[(Long, Long, Long, Boolean)].collect()(0)
    assert(out === ref)
  }

  test("weightedSamplePerGroup: matches a plain-Scala A-ES reference, drops w<=0") {
    val rows = (1L to 300L).map { i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 9).toLong - 1) // weights -1..7
    }
    val docs = rows.toDF("doc_id", "grp", "w")
    // independent reference: same md5 32-bit uniform, same key, same ties
    def u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val k = 10
    val expected = rows.filter(_._3 > 0).groupBy(_._2).flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (id, math.pow(u(id), 1.0 / w.toDouble)) }
        .sortBy { case (id, key) => (-key, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), i) => (g, id, i + 1) }
    }.toSet
    val got = CorpusOps.weightedSamplePerGroup(docs, "doc_id", "grp", "w", k)
      .select(col("grp"), col("doc_id"), col("rank"))
      .as[(String, Long, Int)].collect().toSet
    assert(got === expected)
    // no sampled row may carry a non-positive weight
    assert(!got.exists { case (_, id, _) => rows(id.toInt - 1)._3 <= 0 })
    // deterministic under repartitioning (the saltedTopK contract)
    val again = CorpusOps.weightedSamplePerGroup(docs.repartition(13),
      "doc_id", "grp", "w", k)
      .select(col("grp"), col("doc_id"), col("rank"))
      .as[(String, Long, Int)].collect().toSet
    assert(again === got)
  }

  test("calibrationBuckets: integer bins, clamp at top, vote-less docs in -1") {
    val scored = Seq(
      // (id, n_pos, n_neg, label): conf = pos/(pos+neg), bin = (10*pos) div tot
      (1L, 10L, 0L, true),   // conf 1.0  -> bin 100 div 10 = 10 -> clamp 9
      (2L, 9L, 1L, true),    // 90 div 10 = 9
      (3L, 1L, 1L, false),   // 10 div 2 = 5
      (4L, 1L, 2L, true),    // 10 div 3 = 3
      (5L, 0L, 4L, false),   // 0
      (6L, 0L, 0L, true)     // no votes -> -1
    ).toDF("doc_id", "n_pos", "n_neg", "label")
    val got = CorpusOps.calibrationBuckets(scored, "n_pos", "n_neg", "label")
      .select(col("bucket"), col("n_docs"), col("n_true"), col("sum_pos"),
        col("sum_tot"), col("true_rate"))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(9L) === ((9L, 2L, 2L, 19L, 20L, 1.0)))
    assert(got(5L) === ((5L, 1L, 0L, 1L, 2L, 0.0)))
    assert(got(3L) === ((3L, 1L, 1L, 1L, 3L, 1.0)))
    assert(got(0L) === ((0L, 1L, 0L, 0L, 4L, 0.0)))
    assert(got(-1L) === ((-1L, 1L, 1L, 0L, 0L, 1.0)))
    assert(got.size === 5)
  }

  test("tokenVoteClassifier: hand-computed votes, ties are 0, repeats count once") {
    // N1=2, N0=2. "good"/"nice" only in class 1 -> +1; "bad" only in class
    // 0 -> -1; "meh" in one doc of each (1*2 == 1*2) -> tie, vote 0.
    // Doc 5's repeated "good good" is ONE presence feature, not two.
    val docs = Seq(
      (1L, true, "good nice meh"),
      (2L, true, "good good nice"),
      (3L, false, "bad meh"),
      (4L, false, "bad bad")
    ).toDF("doc_id", "y", "text")
    val out = CorpusOps.tokenVoteClassifier(docs, "text", "doc_id", col("y"))
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 0L, 2L, true, true)))   // good+nice, meh ties
    assert(out(2L) === ((2L, 2L, 0L, 2L, true, true)))   // repeat counted once
    assert(out(3L) === ((3L, 0L, 1L, -1L, false, false)))
    assert(out(4L) === ((4L, 0L, 1L, -1L, false, false)))
  }

  test("packGreedyBins: boundary rule, whole-doc placement, bounded overflow") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq((10L, words(7)), (20L, words(6)), (30L, words(4)),
      (40L, words(3)), (50L, words(2))).toDF("doc_id", "text")
    // desc order 7,6,4,3,2; cum_before 0,7,13,17,20; budget 10 -> bins 0,0,1,1,2
    val out = CorpusOps.packGreedyBins(d, "text", "doc_id", budget = 10L, shards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bin_id"), r.getAs[Int]("pos_in_bin"), r.getAs[Long]("bin_fill")))).toMap
    assert(out(10L) === ((0L, 1, 13L))) // bin 0 overflows to 13 < 10 + its last doc (6)
    assert(out(20L) === ((0L, 2, 13L)))
    assert(out(30L) === ((1L, 1, 7L)))
    assert(out(40L) === ((1L, 2, 7L)))
    assert(out(50L) === ((2L, 1, 2L)))  // tail bin may underfill
  }

  test("knSurprisal flags the all-OOV outlier, keeps corpus-typical docs, drops trigram-less docs") {
    // 3 copies of the base doc push every base trigram to count 3 >= minCount;
    // the gibberish doc's trigrams are singletons -> pruned from the LM -> OOV
    val base = "the cat sat on the mat and then the cat slept well today friends"
    val d = Seq(
      (1L, base), (2L, base), (3L, base),
      (4L, "qzx wvu tsr qpo nml kji hgf edc bax zzy yyx xxw wwv vvu"),
      (5L, "one two") // fewer than 3 tokens: no trigrams, absent from output
    ).toDF("doc_id", "text")
    val out = CorpusOps.knSurprisal(d, "text", "doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 3L, 4L))
    val bad = out.find(_.getAs[Long]("doc_id") == 4L).get
    assert(bad.getAs[Long]("n_oov") === bad.getAs[Long]("n_trigrams"))
    assert(bad.getAs[Long]("bad_decile") === 10L)
    assert(!bad.getAs[Boolean]("keep"))
    val good = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(good.getAs[Long]("n_oov") === 0L)
    assert(good.getAs[Long]("bad_decile") === 0L)
    assert(good.getAs[Boolean]("keep"))
  }

  test("topTrigram + phraseOccurrences: hand-computed positions, tie to lexicographic") {
    val d = Seq(
      (1L, "a b c a b c x"),  // "a b c" at pos 0 and 3
      (2L, "z a b c y"),      // "a b c" at pos 1
      (3L, "m n o p")         // one-off trigrams
    ).toDF("doc_id", "text")
    val top = CorpusOps.topTrigram(d, "text", "doc_id").collect()
    assert(top.length === 1)
    assert((top.head.getAs[String]("w1"), top.head.getAs[String]("w2"),
      top.head.getAs[String]("w3")) === (("a", "b", "c")))
    assert(top.head.getAs[Long]("n") === 3L)
    val occ = CorpusOps.phraseOccurrences(d, "text", "doc_id",
        CorpusOps.topTrigram(d, "text", "doc_id"))
      .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    assert(occ === Set((1L, 0), (1L, 3), (2L, 1)))
    // ties break to the smallest (w1, w2, w3): two trigrams at count 2
    val tie = Seq((1L, "b b b b"), (2L, "a a a a")).toDF("doc_id", "text")
    val t2 = CorpusOps.topTrigram(tie, "text", "doc_id").collect().head
    assert((t2.getAs[String]("w1"), t2.getAs[String]("w2"),
      t2.getAs[String]("w3")) === (("a", "a", "a")))
    // an explicit multi-phrase probe finds each phrase independently
    val probes = Seq(("m", "n", "o"), ("b", "c", "x")).toDF("w1", "w2", "w3")
    val multi = CorpusOps.phraseOccurrences(d, "text", "doc_id", probes)
      .select("doc_id", "pos", "phrase").as[(Long, Int, String)].collect().toSet
    assert(multi === Set((3L, 0, "m n o"), (1L, 4, "b c x")))
    // sub-trigram docs (0/1/2 tokens) contribute no rows and no errors —
    // the slice(…, n3=0) guard must hold under ANSI
    val short = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val st = CorpusOps.trigramStream(short, "text", "doc_id")
      .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    assert(st === Set((4L, 0)))
  }
}
