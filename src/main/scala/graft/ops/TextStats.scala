package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics for training-data curation — TF-IDF
  * term salience, PMI collocations, per-source distribution drift, and
  * temperature-scaled mixture weights. All four are exact fixed-point
  * constructions (integer counts, integer floor-division at a documented
  * scale, at most one correctly-rounded IEEE sqrt), so every face is
  * DuckDB-oracle-comparable cell-for-cell — the same discipline as
  * [[Graph.pageRankFixed]]: a float score would diverge in the last ulp
  * with partition order and flicker every downstream threshold.
  *
  * Reference scope: the reference pipeline has no lexical-statistics
  * operators; this module extends the beyond-reference LLM-pipeline
  * surface (SURVEY.md §2 text-analysis family).
  */
object TextStats {

  /** Top-`k` LINEAR-idf salient terms per document: score =
    * `tf · ((N · scale) div df)`. This is deliberately NOT classic
    * log-damped TF-IDF — idf enters linearly, which over-rewards rarity
    * relative to `tf · log(N/df)` (a tf=1 term at N/df=10 outranks a
    * tf=4 term at N/df=2 here; log-TF-IDF ranks them the other way).
    * The trade is determinism: the linear form is an exact integer, so
    * the ranking (and the driver gate) is bit-stable where a log score
    * diverges by engine and summation order. All three factors (tf, df,
    * N via score/tf/df) are on the face, so a consumer wanting log
    * damping can re-rank downstream.
    *
    * Scale shape: one explode + (doc, term) hash agg (map-side combined),
    * one term-keyed df agg, N as a 1-row broadcast cross join; the top-k
    * window partitions by doc — bounded by per-doc vocabulary, never a
    * global sort.
    */
  def tfIdfTopK(df: DataFrame, textCol: String, idCol: String,
                k: Int = 3, scale: Long = 1000000L): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    // document frequency as a term-partitioned window COUNT over the tf
    // table itself — tf has exactly one row per (doc, term), so the
    // partition row count IS df_t. One linear pipeline: r14 computed df_t
    // as a separate aggregate joined back, which made tf a twice-read
    // subtree and forced a checkpoint barrier (and before that, two full
    // corpus scans); the window needs the same term-keyed exchange the
    // join did, minus the join, the second read, and the barrier.
    val wTerm = Window.partitionBy("term")
    val scored = tf
      .withColumn("df_t", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(n))
      .withColumn("score_fp",
        col("tf") * expr(s"(n_docs * ${scale}L) div df_t"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_fp").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "term", "tf", "df_t", "score_fp")
  }

  /** PMI-ranked adjacent-token collocations (phrase mining). The emitted
    * score is the PRE-LOG fixed-point ratio
    * `(n_xy · N · scale) div (n_x · n_y)` — PMI = log of that ratio / scale,
    * and log is monotone, so ranking (and any threshold) on the ratio is
    * ranking on PMI with zero float. `scale` defaults to 100 (not 10⁶)
    * to keep `n_xy · N · scale` inside BIGINT headroom out to ~10⁸-token
    * corpora; callers with small corpora can raise it.
    *
    * `minCount` drops rare bigrams (PMI's classic degeneracy: a 1-count
    * pair of two 1-count tokens maxes the ratio), which also bounds the
    * output at |pairs with support ≥ minCount| — vocabulary-shaped, not
    * corpus-shaped. Scale shape: two hash aggs (bigram, unigram) + one
    * 1-row broadcast; the unigram join keys are the vocabulary.
    */
  def pmiPairs(df: DataFrame, textCol: String, idCol: String,
               minCount: Long = 5L, scale: Long = 100L): DataFrame = {
    // checkpoints: `toks` feeds the unigram AND bigram sides (each was
    // re-scanning + re-splitting the corpus), and vocabulary-sized `uni`
    // feeds the total plus both attach joins (three re-aggregations)
    val toks = df.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
      .localCheckpoint(false)
    val uni = toks.select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val nTok = uni.agg(sum(col("n")).as("n_total"))
    val bi = toks
      .select(explode(TextOps.gramsFromTokens(col("toks"), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bi.join(uni.select(col("t").as("a"), col("n").as("n_x")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("n").as("n_y")), Seq("b"))
      .crossJoin(broadcast(nTok))
      .select(col("a"), col("b"), col("n_xy"), col("n_x"), col("n_y"),
        expr(s"(n_xy * n_total * ${scale}L) div (n_x * n_y)")
          .as("pmi_ratio_fp"))
  }

  /** Per-source unigram distribution drift against the whole corpus:
    * 2·TVD in ppm floors — `Σ_t |⌊p_s(t)·10⁶⌋ − ⌊p(t)·10⁶⌋|` over the
    * FULL vocabulary (terms absent from a source contribute the corpus
    * mass they're missing). Domain-shift / mixture-skew signal: a source
    * whose token distribution diverges from the blend is the one to
    * re-weight. All-integer, hence exact.
    *
    * Scale shape: the (source × vocabulary) spine is a broadcast cross
    * join of two aggregates — sources are few and the vocabulary is the
    * corpus's distinct-token set, both orders of magnitude below the
    * token stream being summarized; the heavy work is the two hash aggs.
    */
  def domainShift(df: DataFrame, textCol: String, idCol: String,
                  sourceCol: String, scale: Long = 1000000L): DataFrame = {
    // checkpoints: `toks` feeds the per-source AND global aggregates (each
    // was re-scanning + re-splitting the corpus), and (source × vocab)-
    // sized `bySrc` feeds its total plus the spine join
    val toks = df.select(col(sourceCol).as("source"),
      explode(TextOps.tokens(col(textCol))).as("t"))
      .localCheckpoint(false)
    val bySrc = toks.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
      .localCheckpoint(false)
    val srcTot = bySrc.groupBy("source").agg(sum(col("c_st")).as("tot_s"))
    val global = toks.groupBy("t").agg(count(lit(1)).as("c_t"))
    val tot = global.agg(sum(col("c_t")).as("tot"))
    // both cross factors carry explicit broadcast hints: srcTot is a
    // grouped aggregate whose PLAN-side size estimate stays corpus-shaped,
    // so without the hint Catalyst plans a CartesianProduct the moment the
    // scan estimate clears the broadcast threshold — the hint is what
    // makes the documented "broadcast cross join" spine actually hold
    val spine = broadcast(srcTot).crossJoin(global.crossJoin(broadcast(tot)))
    spine
      .join(bySrc, Seq("source", "t"), "left")
      .select(col("source"), col("tot_s"),
        expr(s"abs((coalesce(c_st, 0L) * ${scale}L) div tot_s " +
          s"- (c_t * ${scale}L) div tot)").as("d"))
      .groupBy("source")
      .agg(first(col("tot_s")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("d")).as("tvd2_ppm"))
  }

  /** Zipf rank–frequency table with cumulative vocabulary coverage:
    * tokens ranked by (count DESC, token ASC) — a total order — with the
    * running corpus share in exact ppm floors. The coverage curve is the
    * tokenizer-design signal ("how many types cover 95% of the stream")
    * and the rank table is the Zipf-fit input; both all-integer, so the
    * face hash-compares.
    *
    * Scale shape: the heavy pass is the token hash agg; the ranking
    * window then runs over the VOCABULARY (distinct types), which is
    * orders of magnitude below the token stream — a deliberate global
    * window over vocabulary-shaped data, same contract as the
    * (source × vocabulary) spine in [[domainShift]]. That bound is a
    * CONTRACT, not a guarantee: a web-scale corpus can carry 10⁸+ raw
    * types (typos, ids, urls), which this window funnels through one
    * partition. A corpus whose raw vocabulary outgrows one partition
    * caps it first (frequency floor / top-k), which any Zipf consumer
    * does anyway — or uses [[zipfClassCoverage]], the scale-safe twin
    * whose widest window is 64 rows by construction.
    */
  def zipfRanks(df: DataFrame, textCol: String,
                scale: Long = 1000000L): DataFrame = {
    val counts = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    val w = Window.orderBy(col("n").desc, col("t").asc)
    counts.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum",
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("rank").cast("long").as("rank"), // BIGINT like SQL row_number
        col("t").as("token"), col("n"),
        expr(s"(cum * ${scale}L) div total").as("cum_ppm"))
  }

  /** Scale-safe Zipf coverage — the production twin of [[zipfRanks]] for
    * corpora whose RAW vocabulary outgrows one window partition (10⁸+
    * types at web scale): the rank axis coarsens to frequency CLASSES
    * (freq_class = ⌊log₂ n⌋, computed as `length(bin(n)) − 1` — integer-
    * exact, no float log), and the coverage curve is cumulated over
    * classes in descending frequency order. A count is a positive
    * 63-bit integer, so there are at most 63 classes: the global window
    * runs over ≤ 63 rows NO MATTER THE CORPUS — the bound is structural,
    * unlike zipfRanks' vocabulary contract. Exact (no sketch, no
    * agreement floor): every emitted number is an integer aggregate of
    * the same token counts zipfRanks ranks, so the face hash-compares
    * against an independent SQL oracle. What coarsening costs: per-TOKEN
    * ranks; what it keeps: the tokenizer-design signal ("how many types /
    * which frequency strata cover 95% of the stream") — `cum_types` at
    * class c is exactly zipfRanks' rank of the last token in class c.
    * Per-token rank BOUNDS are recoverable by broadcasting this ≤63-row
    * table back onto the counts (rank ∈ (cum_types(c+1), cum_types(c)]).
    */
  def zipfClassCoverage(df: DataFrame, textCol: String,
                        scale: Long = 1000000L): DataFrame = {
    val counts = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val byClass = counts
      .groupBy((length(bin(col("n"))) - 1).cast("int").as("freq_class"))
      .agg(count(lit(1)).as("n_types"), sum(col("n")).as("class_tokens"))
    val tot = byClass.agg(sum(col("class_tokens")).as("total"))
    val w = Window.orderBy(col("freq_class").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byClass.crossJoin(broadcast(tot))
      .withColumn("cum_types", sum(col("n_types")).over(w))
      .withColumn("cum_tok", sum(col("class_tokens")).over(w))
      .select(col("freq_class"), col("n_types"), col("class_tokens"),
        col("cum_types"), expr(s"(cum_tok * ${scale}L) div total").as("cum_ppm"))
  }

  /** Temperature-scaled mixture weights per group (the multilingual
    * sampling rule p ↦ p^α, Conneau & Lample's α-smoothing), at α = ½ —
    * the one exponent expressible as a SINGLE correctly-rounded IEEE op
    * (sqrt), which is what keeps the face engine-exact: `share_ppm` is an
    * integer floor and `temp_share_ppm = ⌊sqrt(n/total)·10⁶⌋` is floor of
    * a correctly-rounded chain over exact inputs, bit-identical in any
    * IEEE-754 engine. (General α needs pow — NOT correctly rounded, and
    * libm vs StrictMath diverge; callers wanting other temperatures
    * compose sqrt: α = ¼ is sqrt∘sqrt.) Weights are emitted unnormalized;
    * the consumer divides by their sum — a k-row reduction it can order
    * deterministically.
    */
  def temperatureWeights(df: DataFrame, groupCol: String,
                         scale: Long = 1000000L): DataFrame = {
    val n = df.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n_docs"))
    val tot = n.agg(sum(col("n_docs")).as("total"))
    n.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_docs"),
        expr(s"(n_docs * ${scale}L) div total").as("share_ppm"),
        floor(sqrt(col("n_docs").cast("double") / col("total")) * scale)
          .cast("long").as("temp_share_ppm"))
  }
}
