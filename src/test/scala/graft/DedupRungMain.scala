package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Components, TextDedup}

/** Builder-local driver for the bench's 1M-document dedup rung (test
  * scope — the graded numbers come from graft.Bench): same corpus
  * generator, same planted structure, same pipeline, with the doc count
  * parameterizable for fast iteration.
  *
  *   sbt "Test/runMain graft.DedupRungMain 1000000"
  */
object DedupRungMain {
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
    def timeOnce(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docLen = 120
    val vocab = 500000
    // scale the planted regions with nDocs (at 1M these match Bench)
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
          // (src, i) as a MULTI-ARG hash: an arithmetic key like
          // src*K+i overlaps across consecutive ids, handing adjacent
          // "unique" docs shifted copies of one token stream — which
          // chains the whole corpus into one component
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
    val docsDir = java.nio.file.Files
      .createTempDirectory("dedup_rung").toString
    val tGen = timeOnce {
      gen.repartition(32).write.mode("overwrite").parquet(docsDir)
    }
    println(f"docs_gen_sec=$tGen%.2f")
    val docs1m = spark.read.parquet(docsDir)
    var nPairs = 0L; var rounds = 0; var kept = 0L
    val tPipe = timeOnce {
      val pairs = TextDedup.minhashLshStarPairs(docs1m, n = 3, tau = 0.5)
        .persist()
      nPairs = pairs.count()
      val (comp, r) = Components.connectedComponentsWithRounds(pairs)
      rounds = r
      kept = TextDedup.keepCanonicalFrom(docs1m.select("doc_id"), comp)
        .filter(col("keep")).count()
      pairs.unpersist()
    }
    println(f"dedup_pipeline_sec=$tPipe%.2f pairs=$nPairs rounds=$rounds kept=$kept")
    var removedDocs = 0L; var nSpans = 0L
    val tSpan = timeOnce {
      val agg = TextDedup.dedupSpans(docs1m, width = 10).agg(
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)),
        sum("n_spans")).head
      removedDocs = agg.getLong(0); nSpans = agg.getLong(1)
    }
    println(f"span_dedup_sec=$tSpan%.2f removedDocs=$removedDocs spans=$nSpans")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(docsDir))
    spark.stop()
  }
}
