package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, IvfFlat}

/** One-off tuning harness for the bench's HNSW recall rows (round-7
  * VERDICT item 4): pick (m, efConstruction, partitions, ef sweep) so the
  * held-out σ=1.1 gauge lands strictly inside (0.8, 1.0) at the small ef
  * and approaches 1.0 as ef grows. Not part of the test suite.
  * Usage: Test/runMain graft.HnswTuneMain <m> <efC> <parts> <ef...> */
object HnswTuneMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 128
    val sigma = 1.1
    val m = args(0).toInt
    val efC = args(1).toInt
    val parts = args(2).toInt
    val efs = args.drop(3).map(_.toInt)

    def mixture(ids: org.apache.spark.sql.DataFrame) = ids
      .select(col("id"), transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64((col("id") % 256) * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0) +
          (pmod(xxhash64(col("id") * lit(dim) + i + lit(7777777)), lit(2000000)) / 1000000.0 - 1.0) * lit(sigma))
          .cast("float")).as("vec"))

    val corpus = mixture(spark.range(100000).toDF("id")).repartition(32).cache()
    corpus.count()
    val qs = mixture(spark.range(100000, 100100).toDF("id"))
      .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val flat = IvfFlat.build(corpus, nlist = 1)
    def hitSets(rows: Array[(Long, Int, Long, Double)]): Map[Long, Set[Long]] =
      rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val exact = hitSets(IvfFlat.searchLocalRows(flat, qs, "L2", 10, 1, spark))
    def recallVs(got: Map[Long, Set[Long]]): Double =
      exact.map { case (q, e) =>
        got.get(q).map(g => (g & e).size.toDouble / e.size).getOrElse(0.0)
      }.sum / exact.size

    val t0 = System.nanoTime()
    val graphs = Hnsw.build(corpus, "L2", m = m, efConstruction = efC,
      numPartitions = parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graphs.count()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val qDf = qs.toSeq.map { case (q, v) => (q, v.toSeq) }.toDF("query_id", "qvec")
    val rs = efs.map { ef =>
      val got = Hnsw.search(graphs, qDf, 10, efSearch = ef)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, p) => q -> p.map(_._2).toSet }
      f"ef$ef=${recallVs(got)}%.4f"
    }
    println(f"m=$m efC=$efC parts=$parts build=$tBuild%.1f ${rs.mkString(" ")}")
    spark.stop()
  }
}
