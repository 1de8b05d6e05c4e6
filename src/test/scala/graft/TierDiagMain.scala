package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfFlat

/** One-off diagnostic: which tier serves single-query calls and at
  * what latency, with tier counters printed around the loop. Not part of
  * the test suite. args: [n] [nlist] [repeats] (defaults 1000000 128 1). */
object TierDiagMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val nlist = if (args.length > 1) args(1).toInt else 128
    val repeats = if (args.length > 2) args(2).toInt else 1
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
    val synth1m = synthVecs(n).cache()
    synth1m.count()
    val idx = IvfFlat.build(synth1m.select(col("id"), col("vec")),
      nlist = nlist, metric = "L2", seed = 42L, maxIter = 5)
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
    (0 until repeats).foreach { r =>
      val lat = qs.map { q =>
        val t0 = System.nanoTime()
        IvfFlat.searchLocalRows(idx, Array(q), "L2", 10, nprobe = 10, spark)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"run $r MT p50=${lat(49)}%.3f p99=${lat(98)}%.3f min=${lat.head}%.3f max=${lat.last}%.3f")
      val latSt = qs.map { q =>
        val t0 = System.nanoTime()
        IvfFlat.searchLocalRowsPath(idx, Array(q), "L2", 10, nprobe = 10,
          spark, forceDistributed = false, stBound = Long.MaxValue)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"run $r ST p50=${latSt(49)}%.3f p99=${latSt(98)}%.3f min=${latSt.head}%.3f max=${latSt.last}%.3f")
    }
    println(s"tiers after lat loop:  ${IvfFlat.tierCountsSnapshot}")
    spark.stop()
  }
}
