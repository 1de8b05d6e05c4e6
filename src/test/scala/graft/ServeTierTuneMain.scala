package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfFlat

/** One-off tuning harness for the single-thread ↔ MT driver-tier boundary
  * (r6): measures per-call serving latency at the 500k/1M reference
  * configs with different single-thread bounds. Not part of the suite. */
object ServeTierTuneMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 128
    def synthVecs(n: Long) = spark.range(n)
      .select(col("id"), transform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64(col("id") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
          .cast("float")).as("vec"))
      .repartition(32)

    for ((n, nlist) <- Seq((500000L, 100), (1000000L, 128), (100000L, 100))) {
      val corpus = synthVecs(n).cache(); corpus.count()
      val idx = IvfFlat.build(corpus, nlist = nlist, metric = "L2",
        seed = 42L, maxIter = 5)
      idx.assigned.cache().count()
      idx.centroidsLocal
      idx.packed.count()
      val qs = corpus.filter(col("id") < 100)
        .select(col("id"), col("vec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      for (stBound <- Seq(32L << 20, 8L << 20, 2L << 20, 0L)) {
        // warmup
        (0 until 8).foreach { i =>
          IvfFlat.searchLocalRowsPath(idx, Array(qs(i % qs.length)), "L2", 10,
            10, spark, forceDistributed = false, stBound = stBound)
        }
        val lat = qs.map { q =>
          val t0 = System.nanoTime()
          IvfFlat.searchLocalRowsPath(idx, Array(q), "L2", 10, 10, spark,
            forceDistributed = false, stBound = stBound)
          (System.nanoTime() - t0) / 1e6
        }.sorted
        println(f"n=$n stBound=${stBound / (1L << 20)}M p50=${lat(49)}%.3f p99=${lat(98)}%.3f ms")
      }
      corpus.unpersist(); idx.assigned.unpersist(); idx.packed.unpersist()
    }
    spark.stop()
  }
}
