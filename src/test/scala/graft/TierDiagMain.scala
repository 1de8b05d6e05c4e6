package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfFlat

/** One-off diagnostic: which tier serves 1M single-query calls and at
  * what latency, with tier counters printed around the loop. Not part of
  * the test suite. */
object TierDiagMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
    val synth1m = synthVecs(1000000).cache()
    synth1m.count()
    val idx = IvfFlat.build(synth1m.select(col("id"), col("vec")),
      nlist = 128, metric = "L2", seed = 42L, maxIter = 5)
    idx.assigned.cache().count()
    idx.centroidsLocal
    idx.packed.count()
    println(s"packedDriver defined: ${idx.packedDriver.isDefined}")
    val qs = synth1m.filter(col("id") < 100)
      .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    (0 until 3).foreach { _ =>
      IvfFlat.searchLocalRows(idx, qs, "L2", 10, nprobe = 10, spark).length
    }
    println(s"tiers before lat loop: ${IvfFlat.tierCountsSnapshot}")
    val lat = qs.map { q =>
      val t0 = System.nanoTime()
      IvfFlat.searchLocalRows(idx, Array(q), "L2", 10, nprobe = 10, spark)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(s"tiers after lat loop:  ${IvfFlat.tierCountsSnapshot}")
    println(f"p50=${lat(49)}%.3f p99=${lat(98)}%.3f")
    spark.stop()
  }
}
