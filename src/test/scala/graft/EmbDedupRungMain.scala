package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.EmbeddingDedup

/** Standalone driver for the 1M-embedding near-dup rung (the Bench block
  * is a copy of this logic) — iterate here without paying the full suite:
  *
  *   sbt "Test/runMain graft.EmbDedupRungMain 1000000"
  *
  * Prints generation/pipeline seconds, verified pair counts, planted-pair
  * recall, and the hub region's residual pair count (the bucket-cap
  * proof). Asserts the planted invariants the Bench rung pins.
  */
object EmbDedupRungMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .appName("emb-dedup-rung")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, n)
    finally spark.stop()
  }

  def run(spark: SparkSession, n: Long): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("emb_rung").toString
    val (tGen, tPipe, found, foundCore, hubPairs, recall) =
      rung(spark, n, dir)
    println(f"gen=$tGen%.1fs pipeline=$tPipe%.1fs pairs=$found " +
      f"core=$foundCore hub=$hubPairs recall=$recall%.4f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  /** The rung body, shared verbatim with Bench: generate a seeded 1M
    * corpus with planted structure, run the scale path (SimHash-banded
    * LSH candidates + exact-cosine verify), check the planted answer.
    *
    * Planted layout by vec_id (dim 64, expression-only xxhash64 vectors
    * — deterministic, so the counts below are exact modulo the LSH
    * family's own seeded randomness):
    *   [0, 50k)    10k near-dup clusters of 5 (ε = 0.03 ⇒ pair cosine
    *               ≈ 0.999) — 100k planted pairs, found with per-pair
    *               probability ≈ 0.98 at 4×32-bit bands
    *   [50k, 60k)  5k exact-dup pairs (ε = 0) — identical fingerprints
    *               collide in every band, recall 1 by construction
    *   [60k, 80k)  ONE dense region: 20k near-copies of one base
    *               (ε = 0.003). Its four majority band buckets hold
    *               ~19k members each — OVER maxBucketSize, so the cap
    *               drops them before the self-join (by design: an
    *               exact-copy clique belongs to exact dedup, which
    *               finds it in one shuffle). Without the cap this one
    *               region would emit ~4·19k²/2 ≈ 7×10⁸ candidate rows;
    *               with it, only deviant-bucket stragglers pair up
    *               (~tens of thousands) — the printed hub count IS the
    *               hub-guard proof.
    *   [80k, n)    unique
    * τ = 0.99 sits ~8σ above the random-pair cosine at dim 64 (σ =
    * 1/√64), so a non-planted pair passing verify is essentially
    * impossible — asserted exactly (found == core + hub).
    */
  def rung(spark: SparkSession, n: Long, dir: String)
      : (Double, Double, Long, Long, Long, Double) = {
    // the one shared planted-embedding generator (BenchData)
    val gen = BenchData.plantedEmbeddings(spark, n)
    val t0 = System.nanoTime()
    gen.repartition(32).write.mode("overwrite").parquet(dir + "/emb")
    val tGen = (System.nanoTime() - t0) / 1e9
    val emb = spark.read.parquet(dir + "/emb")
    val t1 = System.nanoTime()
    val pairs = EmbeddingDedup.lshPairs(emb, tau = 0.99).persist()
    val found = pairs.count()
    val tPipe = (System.nanoTime() - t1) / 1e9
    // planted-core predicate: same cluster source, below the hub region
    val core = pairs.filter(
      (col("id1") < 50000L && col("id2") < 50000L &&
        floor(col("id1") / 5) === floor(col("id2") / 5)) ||
      (col("id1") >= 50000L && col("id1") < 60000L &&
        col("id2") < 60000L &&
        floor((col("id1") - 50000L) / 2) === floor((col("id2") - 50000L) / 2)))
    val foundCore = core.count()
    val hubPairs = pairs.filter(
      col("id1") >= 60000L && col("id1") < 80000L &&
      col("id2") >= 60000L && col("id2") < 80000L).count()
    pairs.unpersist()
    val planted = 10000L * 10L + 5000L
    val recall = foundCore.toDouble / planted
    // every non-hub pair must be planted (τ = 0.99 is ~8σ for dim 64)
    require(found == foundCore + hubPairs,
      s"unplanted non-hub pairs: found=$found core=$foundCore hub=$hubPairs")
    // exact pairs are recall-1 by construction; near-dups ≈ 0.98 ⇒ floor
    require(recall >= 0.95, s"planted-pair recall $recall below floor")
    // the hub guard: 20k near-copies would emit ~7×10⁸ candidates
    // unguarded; the residual (deviant stragglers) must stay ~10⁴-10⁵
    require(hubPairs < 1000000L,
      s"hub region emitted $hubPairs pairs — bucket cap not effective")
    (tGen, tPipe, found, foundCore, hubPairs, recall)
  }
}
