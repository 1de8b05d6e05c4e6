package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfFlat, IvfPq}

/** Scratch probe: PQ recall on the bench's held-out σ=1.1 gauge as a
  * function of M (bytes/vector) and refine — decides how the bench
  * reports the compression-recall tradeoff. Not part of the suite. */
object PqRecallProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 128
    val sigmaC = 1.1
    def mixtureC(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids
      .select(col("id"), transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64((col("id") % 256) * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0) +
          (pmod(xxhash64(col("id") * lit(dim) + i + lit(7777777)), lit(2000000)) / 1000000.0 - 1.0) * lit(sigmaC))
          .cast("float")).as("vec"))
    val synthC = mixtureC(spark.range(100000)).repartition(32).cache()
    synthC.count()
    val idxC = IvfFlat.build(synthC, nlist = 100, metric = "L2", seed = 42L)
    idxC.assigned.cache().count()
    val flatC = IvfFlat.build(synthC, nlist = 1)
    val qC = mixtureC(spark.range(100000, 100100))
      .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def hitSets(rows: Array[(Long, Int, Long, Double)]) =
      rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val exactC = hitSets(IvfFlat.searchLocalRows(flatC, qC, "L2", 10, 1, spark))
    def recallVs(got: Map[Long, Set[Long]]): Double =
      exactC.map { case (q, e) =>
        got.get(q).map(g => (g & e).size.toDouble / e.size).getOrElse(0.0)
      }.sum / exactC.size
    import spark.implicits._
    val qcDf = qC.toSeq.map { case (q, v) => (q, v.toSeq) }.toDF("query_id", "qvec")
    for (m <- Seq(8, 16, 32)) {
      val pq = IvfPq.buildFrom(idxC, m = m, k = 256)
      pq.assigned.cache().count()
      val adc = recallVs(hitSets(IvfPq.searchLocalRows(pq, qC, 10, 10, spark)))
      def refined(r: Int) = recallVs(
        IvfPq.searchRefined(pq, synthC.select(col("id"), col("vec")), qcDf,
            10, nprobe = 10, refine = r)
          .select("query_id", "id").collect()
          .map(x => (x.getLong(0), x.getLong(1)))
          .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet })
      println(f"m=$m%d adc=$adc%.4f refined10=${refined(10)}%.4f refined50=${refined(50)}%.4f")
      pq.assigned.unpersist()
    }
    spark.stop()
  }
}
