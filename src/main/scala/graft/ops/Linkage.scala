package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage blocking — the Sorted Neighborhood Method (Hernández &
  * Stolfo, SIGMOD'95) as a Spark operator: sort records within a blocking
  * key, slide a fixed window down the sort order, and emit only
  * window-adjacent candidate pairs for exact verification. The candidate
  * count is `O(n·w)` instead of the `O(n²)` of a naive similarity join —
  * the linkage-world sibling of the prefix-filter dedup stages in
  * [[Dedup]].
  *
  * Contract (and its honest limitation): SNM is a RECALL-BOUNDED blocking
  * scheme, not a lossless filter — a true match whose sort keys land more
  * than `w` apart (or in different blocks) is missed. Production linkage
  * runs multiple passes with independent sort keys and unions the pairs;
  * this operator is one such pass. That is a different contract from
  * `ngramPrefixPairs` (lossless by the prefix lemma) and is priced in:
  * the oracle replays the SAME pass, so the gate checks the
  * implementation, not a completeness claim the method doesn't make.
  *
  * Scale shape: the window ranks partition by BLOCK, never globally — a
  * single global sort order (textbook SNM) would serialize on one
  * partition at 100 TB. Blocks must therefore be chosen fine enough to
  * bound the per-block row count (the caller owns that knob), and the
  * self-join joins on the block key + a rank band, so candidate
  * generation shuffles on block and stays `O(n·w)`.
  */
object Linkage {

  /** One SNM pass: rank by `sortKey` (tie-broken by `idCol` — total
    * order, so ranks are deterministic) within each `blockCols` group,
    * pair rows whose ranks differ by at most `window`, then verify each
    * candidate with exact `n`-gram shingle-set Jaccard at
    * `thresholdPct`/100. The Jaccard test is the all-integer
    * cross-multiplication `100·|A∩B| ≥ pct·|A∪B|` — no float, no epsilon,
    * engine-exact.
    *
    * The FULL candidate table is emitted with the verdict column rather
    * than only the survivors: blocking quality (candidate count, match
    * density down the sort order) is the thing an SNM user tunes, so it
    * belongs on the face. Output: (id_a, id_b, inter, uni, is_match),
    * id_a before id_b in rank order within the block. A pair of records
    * both too short to produce any `n`-gram (empty shingle sets) is NOT
    * a match — the cross-multiplication alone would pass it vacuously
    * (0 ≥ pct·0), declaring unrelated short records linked at every
    * threshold, so the verdict additionally requires `uni > 0`.
    */
  def sortedNeighborPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[Column], sortKey: Column,
                          window: Int = 2, n: Int = 3,
                          thresholdPct: Long = 50L): DataFrame = {
    require(window >= 1, "window >= 1")
    require(thresholdPct >= 1 && thresholdPct <= 100, "thresholdPct in [1,100]")
    val blocks = blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }
    val blockNames = blockCols.indices.map(i => s"blk$i")
    val w = Window.partitionBy(blockNames.map(col): _*)
      .orderBy(sortKey.asc, col("id").asc) // idCol is aliased to "id" below
    val ranked = df
      .select(Seq(col(idCol).as("id"), col(textCol)) ++ blocks: _*)
      .withColumn("tset",
        TextOps.shinglesFromTokens(TextOps.tokens(col(textCol)), n))
      .withColumn("rn", row_number().over(w))
      .drop(textCol)
    val a = ranked.select(
      blockNames.map(col) ++ Seq(col("id").as("id_a"),
        col("tset").as("tset_a"), col("rn").as("rn_a")): _*)
    val b = ranked.select(
      blockNames.map(col) ++ Seq(col("id").as("id_b"),
        col("tset").as("tset_b"), col("rn").as("rn_b")): _*)
    a.join(b, blockNames)
      .filter(col("rn_b") > col("rn_a") &&
        col("rn_b") <= col("rn_a") + window)
      .withColumn("inter", size(array_intersect(col("tset_a"), col("tset_b"))).cast("long"))
      .withColumn("uni",
        (size(col("tset_a")) + size(col("tset_b"))).cast("long") - col("inter"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        (col("uni") > 0L &&
          col("inter") * 100L >= lit(thresholdPct) * col("uni")).as("is_match"))
  }

  /** Multi-pass SNM (the production shape Hernández–Stolfo prescribe: the
    * single-pass recall bound is repaired by re-running with INDEPENDENT
    * block/sort keys and unioning candidates — a true match missed because
    * one key ordering separated the pair is caught by a pass whose key
    * agrees with the pair). Each element of `passes` is one
    * (blockCols, sortKey) pass of [[sortedNeighborPairs]]; pairs are
    * canonicalized to id_a < id_b (single-pass order is rank order, which
    * differs between passes) and deduped, keeping `n_passes` = how many
    * passes proposed the pair — the blocking-quality signal a linkage
    * tuner reads (a pair found by every pass is cheap consensus; a pair
    * found by exactly one shows which key ordering earns its keep).
    *
    * The verdict columns (inter, uni, is_match) depend only on the pair,
    * not the pass, so the dedup aggregation takes them via max (all equal).
    * Scale shape: each pass is the O(n·w) block-keyed self-join above;
    * the union dedup is one shuffle on the canonical pair key.
    */
  def multiPassPairs(df: DataFrame, idCol: String, textCol: String,
                     passes: Seq[(Seq[Column], Column)],
                     window: Int = 2, n: Int = 3,
                     thresholdPct: Long = 50L): DataFrame = {
    require(passes.nonEmpty, "at least one pass")
    passes.map { case (blockCols, sortKey) =>
      sortedNeighborPairs(df, idCol, textCol, blockCols, sortKey,
        window, n, thresholdPct)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          col("inter"), col("uni"), col("is_match"))
    }.reduce(_ unionByName _)
      .groupBy("id_a", "id_b")
      .agg(max(col("inter")).as("inter"), max(col("uni")).as("uni"),
        max(col("is_match")).as("is_match"),
        count(lit(1)).as("n_passes"))
  }
}
