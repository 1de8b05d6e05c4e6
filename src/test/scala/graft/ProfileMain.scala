package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job profiler: runs one named SparkEntry query with a listener
  * that prints per-job wall times, so bench lines can be decomposed into
  * their constituent Spark jobs. Usage:
  *   sbt "Test/runMain graft.ProfileMain <query> [sfDir]"
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("engine_cached_search")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var jobLog = List.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos
          .map(si => s"[${si.stageId}:${si.numTasks}t ${si.name.take(60)}]")
          .mkString(" ")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts(js.jobId) = (System.nanoTime(), s"tasks=$nTasks  $stages")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          jobLog ::= ((je.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        if (wall > 400)
          println(f"  SLOW-STAGE ${si.stageId} ${si.numTasks}t wall=${wall / 1e3}%.2f s run=${tm.executorRunTime / 1e3}%.2f s gc=${tm.jvmGCTime / 1e3}%.2f s deser=${tm.executorDeserializeTime / 1e3}%.2f s ${si.name.take(70)}")
      }
    })

    val fn = SparkEntry.queries(name)
    // warm run (JIT, parquet footers, memoized builds)
    fn(spark, sfDir).count()
    Thread.sleep(500)
    val t1 = System.nanoTime()
    fn(spark, sfDir).count()
    val run1 = (System.nanoTime() - t1) / 1e9
    Thread.sleep(500)
    jobLog = Nil
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    // bench semantics = min of 2 post-warm runs
    println(f"QUERY=$name TOTAL=${math.min(run1, total)}%.3f s (runs $run1%.3f/$total%.3f), jobs=${jobLog.size}")
    jobLog.reverse.foreach { case (id, s, d) =>
      println(f"  job $id%3d  $s%7.3f s  $d")
    }
    spark.stop()
  }
}
