package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark for isolating slow stages. */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        if (wall > 300) {
          val site = si.details.linesIterator
            .filterNot(l => l.contains("org.apache.spark") || l.contains("java.") ||
              l.contains("scala.") || l.contains("jdk."))
            .take(3).mkString(" <- ")
          println(f"SLOW-STAGE ${si.stageId} ${si.numTasks}t wall=${wall / 1e3}%.2f run=${tm.executorRunTime / 1e3}%.2f gc=${tm.jvmGCTime / 1e3}%.2f resSer=${tm.resultSerializationTime / 1e3}%.2f | $site")
        }
      }
    })

    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    docs.count()
    def run(): Unit = {
      val t0 = System.nanoTime()
      TextDedup.jaccardPairs(
        docs.repartition(32), n = 3, tau = 0.5, prefixFilter = false).count()
      println(f"TOTAL=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println("== warm-up ==")
    run()
    Thread.sleep(300)
    println("== timed ==")
    run()
    Thread.sleep(300)
    println("== no-AQE ==")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    Thread.sleep(300)
    println("== plan ==")
    val (result, sh) = TextDedup.jaccardPairsPlan(
      docs.repartition(32), n = 3, tau = 0.5, maxDocFreq = 0)
    result.collect()
    println(result.queryExecution.executedPlan.toString.take(6000))
    sh.unpersist()
    spark.stop()
  }
}
