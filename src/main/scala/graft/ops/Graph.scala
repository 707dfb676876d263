package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over document corpora — reference-graph quality
  * signals for training-data curation (a page shared/duplicated across
  * many sources is a different quality animal than an orphan).
  *
  * Reference scope: the reference pipeline has no graph operators; this
  * module is part of the beyond-reference LLM-pipeline surface, next to
  * [[Dedup.nearDupComponents]] (connected components), which it shares
  * its iteration discipline with.
  */
object Graph {

  /** Undirected doc–doc edges between documents sharing at least one
    * `chunkSize`-token tumbling chunk — the shared-content graph over
    * which [[pageRankFixed]] scores centrality. Both directions are
    * emitted (src, dst) so degree = neighbor count and the edge set is
    * symmetric.
    *
    * `maxGroup` caps the per-fingerprint group size, the same hot-key
    * knob as `maxDocFreq` in [[Dedup.ngramJaccardPairs]]: a boilerplate
    * chunk shared by d documents would otherwise mint a d² clique —
    * stopword-scale d at 100 TB. Capped groups drop entirely (boilerplate
    * is noise, not signal, for centrality).
    *
    * Scale shape: explode → distinct (doc, fp) → vocabulary-keyed
    * self-join, candidate mass bounded by maxGroup² per fingerprint —
    * the inverted-index discipline of every dedup operator here.
    */
  def sharedChunkEdges(df: DataFrame, textCol: String, idCol: String,
                       chunkSize: Int, maxGroup: Long = 50L): DataFrame = {
    val chunks = df
      .select(col(idCol).as("doc_id"),
        explode(TextOps.chunkTokens(TextOps.tokens(col(textCol)), chunkSize, 0))
          .as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
      .distinct()
    val eligible = chunks.groupBy("fp")
      .agg(count(lit(1)).as("nd")) // (doc, fp) is distinct — count = docs
      .filter(col("nd") >= 2 && col("nd") <= maxGroup)
      .select("fp")
    val member = chunks.join(eligible, Seq("fp"))
    val pairs = member.select(col("fp"), col("doc_id").as("src"))
      .join(member.select(col("fp"), col("doc_id").as("dst")), Seq("fp"))
      .filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Deterministic label propagation (Raghavan et al. 2007) — community
    * detection over the shared-content graph, the coarser sibling of
    * [[Dedup.nearDupComponents]]: CC merges anything connected, LPA keeps
    * densely-linked cores together while letting thin bridges separate,
    * which is the right granularity for topic-level corpus sharding.
    *
    * Classic LPA is notoriously nondeterministic (random vertex order,
    * random tie-breaks). This formulation is EXACT and reproducible:
    * synchronous rounds, label₀(v) = v, and each round every vertex takes
    * the most frequent label among its neighbors with ties broken by
    * smallest label — a total order, so two runs (or two engines) agree
    * cell-for-cell and the face is oracle-comparable. `iters` is a
    * compile-time unroll like [[pageRankFixed]]'s.
    *
    * Edge-direction contract: propagation follows src → dst, and the
    * vertex set is EVERY edge endpoint (src ∪ dst), each seeded with its
    * own id as label₀ — pass BOTH directions (as [[sharedChunkEdges]]
    * emits) for undirected community detection; on symmetric input the
    * endpoint set equals the distinct src set, so this refines the old
    * src-only convention without changing any undirected result. A
    * vertex with no in-edges this round keeps its current label rather
    * than vanishing: each round the
    * vertex's own label rides along as an n=0 candidate row unioned into
    * the neighbor counts before the window. An n=0 candidate can never
    * outrank a real neighbor count (n ≥ 1), so vertices with in-edges are
    * unaffected, while isolated-this-round vertices win with their own
    * label — totality with zero extra joins (the previous formulation
    * restored lost vertices with a vertex-keyed left join per round,
    * which roughly doubled round cost).
    *
    * Scale shape per round: one edge⋈label join (shuffle on src), one
    * (dst, label) hash agg, one per-vertex max_by argmax hash agg —
    * bounded by neighbor count, never global, and every aggregation is
    * map-side partial. Output: (id, community, community size after the
    * last round).
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters >= 1")
    // the argmax below breaks count ties with −label, which is only a
    // total order for NUMERIC vertex ids: a string id would implicit-cast
    // to double NULL and make ties nondeterministic (where the pre-r14
    // row_number over (n desc, label asc) ordered any orderable type).
    // Guard the contract instead of silently degrading (ADVICE r14).
    Seq("src", "dst").foreach { c =>
      require(edges.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"labelPropagation requires numeric vertex ids; '$c' is " +
          s"${edges.schema(c).dataType.simpleString}")
    }
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    var labels = verts.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val cnt = e
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
        // totality candidate: own label at n=0 (see scaladoc above)
        .unionByName(labels.select(col("id"), col("label"), lit(0L).as("n")))
      // argmax by (n desc, label asc) as a hash aggregation — the struct
      // key (n, −label) makes lexicographic max pick the most frequent
      // label with ties to the SMALLEST label, exactly the old rank-1
      // window's order, but with map-side partial aggregation and no
      // partition-wide sort (the window shuffled and sorted every
      // (id, label, n) row; labels are vertex ids, so −label is exact)
      labels = cnt.groupBy("id")
        .agg(max_by(col("label"), struct(col("n"), -col("label"))).as("label"))
        // per-round cut: each round reads `labels` TWICE (the edge join and
        // the n=0 totality union), and the epilogue twice more (sizes +
        // join) — without materialization the round-1 subtree executed
        // 2^iters times (r15 before-plan: 8 copies at iters=3, the whole
        // pipeline re-run per reference). Same no-leak lazy checkpoint as
        // `e`/`verts` above.
        .localCheckpoint(false)
    }
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("id"), col("label").as("community"), col("community_size"))
  }

  /** Fixed-point integer PageRank, `iters` unrolled iterations over a
    * directed edge list — the deterministic formulation a distributed
    * engine needs for reproducible ranks: float PageRank sums doubles in
    * partition order, so two runs (or two engines) disagree in the last
    * ulp and every downstream threshold flickers. Here rank is a BIGINT
    * in units of 1/`scale`: rank₀ = scale (1.0), and each round is
    *
    *   rank(v) = 0.15·scale + Σ_{u→v} (85·rank(u)) DIV (100·deg(u))
    *
    * — integer multiply, integer floor-division, integer sum: exact,
    * associative, order-independent, hence oracle-comparable cell-exact
    * (the discipline behind the cents trick, applied to damping). The
    * DIV truncation loses < 1/scale per edge per round — three orders
    * below any ranking decision at the default scale of 10⁶.
    *
    * Only vertices appearing in `edges` participate (callers union in
    * isolated vertices at base rank if they need totality — the
    * [[Dedup.nearDupComponents]] singleton convention). Output:
    * (id, deg, rank) with rank after `iters` rounds.
    *
    * Scale shape: per round one shuffle (contribution groupBy dst) plus
    * one vertex-keyed left join; `iters` is a compile-time unroll, no
    * driver-side convergence loop — PageRank-to-convergence callers
    * compose this with the CC module's observe-metric round pattern.
    */
  def pageRankFixed(edges: DataFrame, iters: Int = 3,
                    scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters >= 1")
    require(scale >= 100L && scale % 100L == 0L,
      s"scale=$scale must be a positive multiple of 100 so 0.15*scale is exact")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val verts = deg.select(col("src").as("id"))
    val base = 15L * scale / 100L
    var ranks = verts.select(col("id"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("id"))
        // SQL `div` = exact integer floor-division on BIGINT (the Column
        // `/` operator would detour through DOUBLE and round above 2^53)
        .agg(sum(expr("(85 * rank) div (100 * deg)")).as("insum"))
      ranks = verts.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("insum"), lit(0L))).as("rank"))
    }
    ranks.join(deg.select(col("src").as("id"), col("deg")), Seq("id"))
      .select("id", "deg", "rank")
  }
}
