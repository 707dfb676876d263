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

  /** Distinct-shingle inverted index: (id, shingle, setSize). */
  private def shingleIndex(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .withColumn("set_size", size(col("sh")))
    sh.select(col("id"), col("set_size"), explode(col("sh")).as("shingle"))
  }

  /** N-gram Jaccard near-dup pairs via shared-shingle join: candidates are
    * pairs sharing ≥1 shingle; Jaccard computed from co-occurrence counts
    * (|A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|) — integer arithmetic, no
    * set materialization per pair.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val ix = shingleIndex(df, textCol, idCol, n)
    val a = ix.select(col("id").as("id_a"), col("set_size").as("n_a"), col("shingle"))
    val b = ix.select(col("id").as("id_b"), col("set_size").as("n_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("co"), first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .withColumn("jaccard",
        col("co").cast("double") / (col("n_a") + col("n_b") - col("co")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: k independent hash slots via seeded xxhash64 over
    * the shingle set (deterministic; no RNG at runtime).
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
    val sigs = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sigs.select(col("id"), col("sh"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"), xxhash64(slice(col("sig"), j * r + 1, r)).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bh"))
    val l = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"), col("bh"))
    val rr = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("band"), col("bh"))
    l.join(rr, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
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

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤3 default):
    * candidates via the pigeonhole 16-bit-chunk join (a pair within Hamming
    * 3 of 64 bits must agree on ≥1 of 4 chunks), verified with bit_count(xor).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))
      }: _*)).as("cc"))
      .select(col("id"), col("sim"), col("cc.chunk"), col("cc.cv"))
    val a = chunked.select(col("id").as("id_a"), col("sim").as("sim_a"), col("chunk"), col("cv"))
    val b = chunked.select(col("id").as("id_b"), col("sim").as("sim_b"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
