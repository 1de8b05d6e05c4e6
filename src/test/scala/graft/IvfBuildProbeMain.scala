package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: decompose the bench's ivf_10m_build row into its
  * constituent Spark jobs (sample sort, k-means|| init rounds, Lloyd
  * iterations, assignment+persist+count) so optimization effort lands on
  * the dominant phase. `Test/runMain graft.IvfBuildProbeMain [n]` */
object IvfBuildProbeMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dim = 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pt = Bench.preTouchHeap()
    println(f"pretouch_sec=${pt.sec}%.1f completed=${pt.completed}")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.stageInfos.map(si => si.name.take(50)).mkString(" | ")
        starts(js.jobId) = (System.nanoTime(), d)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          println(f"# job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%8.2f s  $d")
        }
    })
    val synth = spark.range(n).toDF("id")
      .select(col("id"), transform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64(col("id") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
          .cast("float")).as("vec"))
    val own0 = Bench.ownCpuSample()
    val t0 = System.nanoTime()
    val idx = graft.operators.IvfFlat.build(synth, nlist = 512,
      metric = "L2", seed = 42L, maxIter = 5)
    val tFit = (System.nanoTime() - t0) / 1e9
    println(f"fit_sec=$tFit%.1f")
    val t1 = System.nanoTime()
    idx.assigned.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val tAssign = (System.nanoTime() - t1) / 1e9
    val ownSys = Bench.ownSysFrac(own0, Bench.ownCpuSample())
    println(f"assign_persist_sec=$tAssign%.1f total=${tFit + tAssign}%.1f ownsys=$ownSys%.3f")
    spark.stop()
  }
}
