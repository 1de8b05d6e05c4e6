package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Components, TextDedup}

/** Stage-level timing for the 1M-document dedup rung — decomposes
  * [[DedupRungMain]]'s single pipeline number into its Spark stages so
  * optimization effort lands where the time actually goes (test scope,
  * not graded):
  *
  *   sbt "Test/runMain graft.DedupProfileMain [nDocs]"
  *
  * Uses the package-private stage entry points, so each timed step
  * materializes exactly the intermediate the real pipeline builds.
  */
object DedupProfileMain {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"stage $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    // same generator as DedupRungMain (scaled planted regions)
    val docLen = 120; val vocab = 500000
    val sc = nDocs / 1000000.0
    val giantEnd = (10000 * sc).toLong.max(10)
    val nearEnd = giantEnd + (100000 * sc).toLong
    val exactEnd = nearEnd + (50000 * sc).toLong
    val hubEnd = exactEnd + (100000 * sc).toLong
    val srcCol = when(col("doc_id") < giantEnd, lit(0L))
      .when(col("doc_id") < nearEnd,
        (floor((col("doc_id") - giantEnd) / 5) * 5 + giantEnd).cast("long"))
      .when(col("doc_id") < exactEnd,
        (floor((col("doc_id") - nearEnd) / 2) * 2 + nearEnd).cast("long"))
      .otherwise(col("doc_id"))
    val hub = (0 until 10).map(i => s"hub$i").mkString(" ")
    val toksCol = transform(sequence(lit(0), lit(docLen - 1)), i =>
      when(col("mut") &&
          pmod(xxhash64(lit("sel"), col("doc_id"), i), lit(50)) === 0,
        concat(lit("m"), pmod(xxhash64(lit("mut"), col("doc_id"), i), lit(1L << 40))))
        .otherwise(
          concat(lit("w"), pmod(xxhash64(lit("tok"), col("src"), i), lit(vocab)))))
    val gen = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("src", srcCol)
      .withColumn("mut",
        col("doc_id") < nearEnd && col("doc_id") =!= col("src"))
      .withColumn("body", concat_ws(" ", toksCol))
      .withColumn("text",
        when(col("doc_id") >= exactEnd && col("doc_id") < hubEnd,
          concat(lit(hub + " "), col("body"))).otherwise(col("body")))
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup_prof").toString
    t("gen+write")(gen.repartition(32).write.mode("overwrite").parquet(dir))
    val docs = spark.read.parquet(dir)

    val stages = TextDedup.profileStarStages(docs, n = 3, tau = 0.5)
    stages.foreach { case (name, f) => t(name)(f()) }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
