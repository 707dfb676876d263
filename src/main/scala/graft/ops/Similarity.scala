package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exactness
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Numeric contract: dot products accumulate in DOUBLE in strict index
  * order (`aggregate` is a sequential left fold), so the same expression in
  * any engine that evaluates IEEE doubles sequentially produces bit-equal
  * cosines — thresholds and rankings are reproducible, not
  * tolerance-dependent.
  */
object Similarity {

  /** Index-ordered double dot product of two float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors of each query vector by brute force.
    *
    * The corpus side is broadcast when it fits (queries stream past it, no
    * shuffle); at 100 TB-corpus scale this becomes the per-bucket scorer
    * behind [[lshBuckets]] — the API stays the same.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     broadcastCorpus: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c0 = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val c = if (broadcastCorpus) broadcast(c0) else c0
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic random hyperplanes (seeded driver-side, shipped as
    * literals): `planes(i)(j)` ~ U(-0.5, 0.5).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextDouble() - 0.5)
  }

  /** Sign-bit LSH bucket id for each vector: bit i = sign(v · plane_i).
    * Vectors in the same bucket are near-angular-neighbors with high
    * probability; ANN = brute-force within bucket (plus optional
    * multi-probe). Bucket key is what the 100 TB corpus is hash-partitioned
    * on, turning ANN into co-partitioned bucket-local scans.
    */
  def lshBuckets(df: DataFrame, planes: Array[Array[Double]]): DataFrame = {
    val vec = col("embedding")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(vec, planeLit, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      shiftleft(when(d >= 0, lit(1L)).otherwise(lit(0L)), i)
    }.reduce(_ bitwiseOR _)
    df.withColumn("bucket", bucket)
  }

  /** Bucketed ANN top-k: candidates share an LSH bucket; exact cosine ranks
    * within bucket. Recall < 1 by construction (measured in ScalaTest
    * against [[bruteForceTopK]]); comparison cost drops by ~2^planes.
    */
  def lshTopK(df: DataFrame, planes: Array[Array[Double]], k: Int): DataFrame = {
    val bucketed = lshBuckets(df, planes)
    val q = bucketed.select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via bucketed
    * candidates (exact over the full corpus when `planes` is empty).
    */
  def cosineDupPairs(df: DataFrame, threshold: Double,
                     planes: Array[Array[Double]] = Array.empty): DataFrame = {
    val src = if (planes.isEmpty) df.withColumn("bucket", lit(0L)) else lshBuckets(df, planes)
    val a = src.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("bucket"))
    val b = src.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
