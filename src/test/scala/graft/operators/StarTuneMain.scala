package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.BenchData

/** Head-to-head timing of star-edge candidate shapes at the 10M rung —
  * the r9 verdict's #4 (star_edges 87.2 s window-form residual). Each
  * variant consumes the same persisted signature table and must produce
  * the identical distinct edge COUNT (the full pipeline's correctness is
  * pinned elsewhere; this main only ranks shapes). Test scope, not
  * graded.
  *
  *   sbt "Test/runMain graft.operators.StarTuneMain [nDocs] [variants]"
  *
  * Variants: current (TextDedup.starEdges as shipped),
  * window8 / window32 (r9 shape at 8× / 32× shuffle partitions),
  * twopass / twopass8 (per-task two-pass primitive hash map at 32× / 8×),
  * scan / exchange (decomposition floors).
  */
object StarTuneMain {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val which = args.drop(1).headOption
      .map(_.split(",").toSet)
      .getOrElse(Set("current", "window8", "twopass8"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val gen = BenchData.plantedDocs(spark, nDocs)
    val dir = java.nio.file.Files.createTempDirectory("star_tune").toString
    gen.repartition(32).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val numHashes = 128; val bands = 64
    val docShingles = TextDedup.docShingleTable(docs, 3)
    val sigs = docShingles.select(col("doc_id"),
        TextDedup.minhashUdf(numHashes)(col("shingles")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    println(s"sigs ${sigs.count()}")
    def banded: DataFrame = TextDedup.bandedTable(sigs, numHashes, bands)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"variant $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (edges=$n)")
    }

    // r9 shape: window min over one exchange, external-sort bound
    def windowForm(mult: Int): DataFrame = {
      val parts = mult * spark.sessionState.conf.numShufflePartitions
      val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
      banded.repartition(parts, col("bucket"))
        .withColumn("id1", min("doc_id").over(w))
        .filter(col("doc_id") =!= col("id1"))
        .select(col("id1"), col("doc_id").as("id2"))
        .distinct()
    }

    // two-pass per-task primitive map over one exchange, no sort
    def twoPass(mult: Int): DataFrame = {
      val parts = mult * spark.sessionState.conf.numShufflePartitions
      banded.repartition(parts, col("bucket"))
        .select(col("bucket"), col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          // buffer the partition (bounded: parts sized so a task holds
          // ~|banded|/parts rows), min per bucket, then emit
          var bk = new Array[Long](1 << 16)
          var dc = new Array[Long](1 << 16)
          var n = 0
          while (it.hasNext) {
            val (b, d) = it.next()
            if (n == bk.length) {
              bk = java.util.Arrays.copyOf(bk, n * 2)
              dc = java.util.Arrays.copyOf(dc, n * 2)
            }
            bk(n) = b; dc(n) = d; n += 1
          }
          // open-addressing bucket -> min doc
          var cap = java.lang.Integer.highestOneBit(math.max(16, n * 2 - 1)) * 2
          val keys = new Array[Long](cap)
          val mins = new Array[Long](cap)
          val used = new Array[Boolean](cap)
          val mask = cap - 1
          def slot(k: Long): Int = {
            var h = (k * -7046029254386353131L) >>> 40
            var i = h.toInt & mask
            while (used(i) && keys(i) != k) i = (i + 1) & mask
            i
          }
          var i = 0
          while (i < n) {
            val s = slot(bk(i))
            if (!used(s)) { used(s) = true; keys(s) = bk(i); mins(s) = dc(i) }
            else if (dc(i) < mins(s)) mins(s) = dc(i)
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          i = 0
          while (i < n) {
            val s = slot(bk(i))
            if (dc(i) != mins(s)) out += ((mins(s), dc(i)))
            i += 1
          }
          out.iterator
        }
        .toDF("id1", "id2")
        .distinct()
    }

    if (which("scan")) // band synthesis alone: explode + band-hash UDF
      time("scan") { banded.agg(count(col("bucket"))).head.getLong(0) }
    if (which("exchange")) // synthesis + the bucket exchange, nothing else
      time("exchange") {
        banded.repartition(8 * spark.sessionState.conf.numShufflePartitions,
            col("bucket"))
          .select(col("bucket"), col("doc_id")).as[(Long, Long)]
          .mapPartitions(it => Iterator.single(it.length.toLong))
          .reduce(_ + _)
      }
    if (which("current")) // whatever TextDedup.starEdges currently is
      time("current") { TextDedup.starEdges(banded).count() }
    if (which("window8"))
      time("window8") { windowForm(8).count() }
    if (which("window32"))
      time("window32") { windowForm(32).count() }
    if (which("twopass"))
      time("twopass") { twoPass(32).count() }
    if (which("twopass8"))
      time("twopass8") { twoPass(8).count() }

    sigs.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
