package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, IvfFlat}

/** One-off measurement: HNSW at the 1M rung (r9 verdict optional #8 —
  * the one operator proven only at 100k). Builds a 1M×dim128 graph set
  * at the production partitioning (one graph per core — the recall
  * GAUGE stays the 100k row's job, where 4 partitions keep the n-way
  * union from hiding beam quality), then measures resident serving
  * latency (the engine's head+hnswtail tier shape) and recall@10 vs
  * exact. Not part of the test suite:
  * `Test/runMain graft.Hnsw1mMain [n] [parts] [ef]` */
object Hnsw1mMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val ef = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val dim = 128
    // same host-state discipline as the bench: prepay heap faults, and
    // stamp each phase with the process's own sys-share so a storm-priced
    // reading names itself (NOTES_r14 §2/§5b)
    val pt = Bench.preTouchHeap()
    println(f"pretouch_sec=${pt.sec}%.1f completed=${pt.completed} us_per_page=${pt.usPerPage}%.2f")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def synth(ids: org.apache.spark.sql.DataFrame) = ids
      .select(col("id"), transform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64(col("id") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
          .cast("float")).as("vec"))
    val corpus = synth(spark.range(n).toDF("id")).repartition(32).cache()
    corpus.count()
    val qs = synth(spark.range(n, n + 100).toDF("id"))
      .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val own0 = Bench.ownCpuSample()
    val t0 = System.nanoTime()
    val graphs = Hnsw.build(corpus, "L2", m = 32, efConstruction = 200,
      numPartitions = parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graphs.count()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val ownSysB = Bench.ownSysFrac(own0, Bench.ownCpuSample())
    println(f"hnsw_1m_build_sec=$tBuild%.1f n=$n parts=$parts ownsys=$ownSysB%.3f")

    // resident serving: collected sub-graphs, zero-job per-call beam
    val local = graphs.collect()
    Hnsw.searchLocalRows(local, Array(qs.head), 10, efSearch = ef)
    val lat = (0 until 3).flatMap(_ => qs.map { q =>
      val t = System.nanoTime()
      Hnsw.searchLocalRows(local, Array(q), 10, efSearch = ef)
      (System.nanoTime() - t) / 1e6
    }).toArray.sorted
    println(f"hnsw_1m_serving_ms p50=${lat(lat.length / 2)}%.3f " +
      f"p99=${lat(lat.length * 98 / 100)}%.3f ef=$ef n=${lat.length}")

    // recall@10 vs exact over the full corpus
    val flat = IvfFlat.build(corpus, nlist = 1)
    flat.packed.count()
    val exact = IvfFlat.searchLocalRows(flat, qs, "L2", 10, 1, spark)
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val got = Hnsw.searchLocalRows(local, qs, 10, efSearch = ef)
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val recall = exact.map { case (q, e) =>
      got.get(q).map(g => (g & e).size.toDouble / e.size).getOrElse(0.0)
    }.sum / exact.size
    println(f"hnsw_1m_recall10_ef$ef=$recall%.4f")
    spark.stop()
  }
}
