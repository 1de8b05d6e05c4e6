package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfFlat

/** One-off tuning harness for the bench's recall-tracking rows (VERDICT r5
  * item 5): find the clustered-corpus σ where nprobe=2 recall@10 on
  * HELD-OUT queries lands in ~0.85-0.98, so the row has a gradient instead
  * of sitting pinned at 1.0. Not part of the test suite. */
object RecallTuneMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 128

    def mixture(ids: org.apache.spark.sql.DataFrame, sigma: Double) = ids
      .select(col("id"), transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64((col("id") % 256) * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0) +
          (pmod(xxhash64(col("id") * lit(dim) + i + lit(7777777)), lit(2000000)) / 1000000.0 - 1.0) * lit(sigma))
          .cast("float")).as("vec"))

    def hitSets(rows: Array[(Long, Int, Long, Double)]): Map[Long, Set[Long]] =
      rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }

    for (sigma <- args.map(_.toDouble)) {
      val corpus = mixture(spark.range(100000).toDF("id"), sigma)
        .repartition(16).cache()
      corpus.count()
      // held-out: ids ≥ 100000 share the 256 centers (id % 256) but are
      // not corpus members, and their noise hash draw is their own
      val qs = mixture(spark.range(100000, 100100).toDF("id"), sigma)
        .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val flat = IvfFlat.build(corpus, nlist = 1)
      val exact = hitSets(IvfFlat.searchLocalRows(flat, qs, "L2", 10, nprobe = 1, spark))
      val idx = IvfFlat.build(corpus, nlist = 100, metric = "L2", seed = 42L)
      idx.assigned.cache().count()
      idx.centroidsLocal
      def recallAt(np: Int): Double = {
        val got = hitSets(IvfFlat.searchLocalRows(idx, qs, "L2", 10, np, spark))
        exact.map { case (q, e) =>
          got.get(q).map(g => (g & e).size.toDouble / e.size).getOrElse(0.0)
        }.sum / exact.size
      }
      println(f"sigma=$sigma%.2f recall@10: np1=${recallAt(1)}%.4f np2=${recallAt(2)}%.4f np4=${recallAt(4)}%.4f np10=${recallAt(10)}%.4f np100=${recallAt(100)}%.4f")
      corpus.unpersist(); idx.assigned.unpersist(); idx.packed.unpersist()
      flat.packed.unpersist()
    }
    spark.stop()
  }
}
