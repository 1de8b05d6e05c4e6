package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for every declared query to
  * plans/<outDir>/<name>_<suffix>.txt — the optimization rounds' plan
  * evidence (judge checks plan claims against these files).
  *
  * Usage: Test/runMain graft.PlanDumpMain <suffix> [dataDir] [outDir] [only...]
  *   suffix  — "before" | "after" (file name suffix)
  *   dataDir — testdata dir (default /root/testdata/sf0.01)
  *   outDir  — output dir (default plans/r11)
  *   only    — optional query-name substrings to narrow the dump
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val dataDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "plans/r11"
    val only = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        try {
          val df = fn(spark, dataDir)
          val txt = df.queryExecution.explainString(
            ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(out,
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"# plandump $name -> $out")
        } catch {
          case scala.util.control.NonFatal(e) =>
            java.nio.file.Files.write(out,
              s"PLAN BUILD FAILED: ${e.getMessage}\n"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(s"# plandump $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
