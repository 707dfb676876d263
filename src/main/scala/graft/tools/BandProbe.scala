package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup
import graft.sources.Tables

/** Band-geometry probe for [[graft.ops.Dedup.minhashLshPairs]]: measures
  * the k=32 signature split as b=8×r=4 (the library default) against
  * b=16×r=2 on the SAME corpus, reporting wall time, candidate-stage pair
  * count (pre-verification), and verified output count per geometry.
  *
  * Why this instrument: the two geometries trade candidate mass for
  * recall margin. At the 0.8 verification threshold the S-curves give
  * P(collide) = 1−(1−j^r)^b — for a true j=0.8 pair that is 0.985 (b=8)
  * vs 1−(1−0.64)^16 ≈ 1−8e-8 (b=16); for background j≈0.1 pairs it is
  * 8e-4 (b=8) vs 0.148 (b=16), i.e. b=16 buys ~7 nines of recall margin
  * at ~100× the random-candidate volume. Which side wins on WALL TIME
  * depends on the corpus's dup-mass/background split, which changed when
  * the driver regenerated testdata in r12 — hence a measured probe, not
  * an argument. Output rows feed BENCH_NOTES' geometry table.
  *
  * Usage: runMain graft.tools.BandProbe <sfDir> [runs=2]
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val docs = Tables.documents(spark, dir)
    for (bands <- Seq(8, 16); r <- 1 to runs) {
      val t0 = System.nanoTime()
      val out = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 32, bands = bands, threshold = 0.8).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[band] b=$bands run$r: $wall%.1f s, verified=$out")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // candidate-stage mass per geometry (the quantity the S-curve trades):
    // replicate the banding join up to the distinct pre-verification pairs
    val sets = Dedup.shingleSets(docs, "text", "doc_id", 3).localCheckpoint(false)
    val k = 32
    val hashed = sets.select(col("id"), explode(col("sh")).as("shingle"))
      .select(col("id") +:
        (0 until k).map(i => xxhash64(concat(col("shingle"), lit(s"#$i"))).as(s"h$i")): _*)
    val sigs = hashed.groupBy("id")
      .agg(min(col("h0")).as("m0"), (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
      .localCheckpoint(false)
    for (bands <- Seq(8, 16)) {
      val rr = k / bands
      val banded = sigs.select(col("id"), explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"),
          xxhash64((j * rr until (j + 1) * rr).map(i => col(s"m$i")): _*).as("bh"))
      }: _*)).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bh"))
      val cand = banded.select(col("id").as("id_a"), col("band"), col("bh"))
        .join(banded.select(col("id").as("id_b"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      println(s"[band] b=$bands candidates=$cand")
    }
    spark.stop()
  }
}
