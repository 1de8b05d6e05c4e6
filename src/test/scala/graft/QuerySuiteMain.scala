package graft

import org.apache.spark.sql.SparkSession

/** Isolated re-run of Bench's declared-query loop (same session config,
  * same min-of-2 `.count()` methodology) so per-query optimizations can
  * be measured without paying the full bench's rung sections.
  *
  * Usage: Test/runMain graft.QuerySuiteMain [dataDir] [only...]
  */
object QuerySuiteMain {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same warmup as Bench (entry query + data-dir footer caches)
    SparkEntry.entry(spark).count()
    Seq("embeddings", "documents", "orders", "lineitem", "events",
        "customer", "nation", "part", "region", "supplier").foreach { t =>
      try { graft.model.Tables.load(spark, dataDir, t).count(); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    var total = 0.0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        val runs = Seq(timeOnce(fn(spark, dataDir).count()),
          timeOnce(fn(spark, dataDir).count()))
        total += runs.min
        println(f"$name%-28s ${runs.min}%8.3f  (runs ${runs.map(r => f"$r%.3f").mkString(" ")})")
      }
    println(f"SUITE_TOTAL $total%.2f")
    spark.stop()
  }
}
