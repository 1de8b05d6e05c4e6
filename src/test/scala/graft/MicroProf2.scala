package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose IvfFlat.searchLocal per-call overhead. */
object MicroProf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 128
    val synth = spark.range(100000)
      .select(col("id"), transform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64(col("id") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
          .cast("float")).as("vec"))
      .repartition(32).cache()
    synth.count()
    val idx = IvfFlat.build(synth.select(col("id"), col("vec")), nlist = 100,
      metric = "L2", seed = 42L)
    idx.assigned.cache().count()
    idx.centroidsLocal
    idx.packed.count()
    val q100 = synth.filter(col("id") < 100)
      .select(col("id").as("query_id"), col("vec").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    def bestOf(n: Int)(f: => Unit): Double =
      (0 until n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // warm up
    (0 until 8).foreach(_ => IvfFlat.searchLocal(idx, q100, "L2", 10, 10, spark).count())

    val full = bestOf(10)(IvfFlat.searchLocal(idx, q100, "L2", 10, 10, spark).count())
    println(f"searchLocal+count: $full%.4f s  (${100 / full}%.0f qps)")

    // raw RDD job only: same probe ranking + kernel, skip toDF
    val cents = idx.centroidsLocal
    def rawJob(): Unit = {
      val byCluster = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
      var qi = 0
      while (qi < q100.length) {
        val qv = q100(qi)._2
        cents.map { case (cid, cv) =>
          var s = 0.0; var i = 0
          while (i < cv.length) { val d = qv(i) - cv(i); s += d * d; i += 1 }
          (cid, -s)
        }.sortBy { case (cid, s) => (-s, cid.toLong) }.take(10)
          .foreach { case (cid, _) =>
            byCluster.getOrElseUpdate(cid, scala.collection.mutable.ArrayBuffer.empty) += qi
          }
        qi += 1
      }
      val probeMap = byCluster.map { case (c, qs) => (c, qs.toArray) }.toMap
      val qvecs = q100.map(_._2)
      val bq = spark.sparkContext.broadcast((qvecs, probeMap))
      val n = idx.packed.mapPartitions { pit =>
        val (qv, probes) = bq.value
        var cnt = 0
        while (pit.hasNext) {
          val p = pit.next()
          probes.foreach { case (cid, probing) =>
            val r = p.ranges.get(cid)
            if (r != null) cnt += r(1) * probing.length
          }
        }
        Iterator.single(cnt)
      }.collect().sum
      require(n > 0)
    }
    val raw = bestOf(10)(rawJob())
    println(f"probe+job+collect only: $raw%.4f s")

    // empty job on the cached RDD (pure scheduling floor)
    val sched = bestOf(10) {
      idx.packed.mapPartitions(_ => Iterator.single(1)).collect()
    }
    println(f"empty job floor: $sched%.4f s")
    spark.stop()
  }
}
