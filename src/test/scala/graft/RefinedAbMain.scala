package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B attribution for the `engine_pq_10m_refined` serving row (r10
  * verdict #1): build ONE 10M×dim128 IVF_PQ snapshot (sidecar written
  * at build), then measure steady-state refined serving on two fresh
  * engine instances over the SAME snapshot —
  *   A: default          (sq16 store loaded from the binary sidecar)
  *   B: sq16IgnoreSidecar (store wave-fetch built from the codes table)
  * Store content is bit-identical (Sq16StoreSpec); if the two serving
  * distributions differ, the sidecar LOAD path (array layout / page
  * locality) is implicated; if they match, the graded regression was
  * estimator variance or section-neighborhood heap pressure. Not part
  * of the suite; run with `Test/runMain graft.RefinedAbMain [n]`. */
object RefinedAbMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dim = 128
    // fault the heap in before any timed phase (host fault phases —
    // Bench.preTouchHeap scaladoc)
    println(s"pretouch ${Bench.preTouchHeap()}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("refined_ab").toString
    sys.addShutdownHook {
      scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
    def vecExpr = transform(sequence(lit(1), lit(dim)),
      i => (pmod(xxhash64(col("seq") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
        .cast("float"))
    def records(m: Long) = spark.range(m).select(col("id").as("seq"))
      .select(concat(lit("v"), col("seq")).as("id"), vecExpr.as("vector"))
      .withColumn("tags", lit(null).cast("array<string>"))
      .withColumn("meta", lit(null).cast("string"))
      .withColumn("updated_at", lit(100L))
      .withColumn("tenant_id", lit("t1"))
      .withColumn("index_name", lit("big"))
    val builder = new GraftEngine(spark, root)
    var t0 = System.nanoTime()
    builder.upsert(records(n))
    println(f"upsert_sec ${(System.nanoTime() - t0) / 1e9}%.1f")
    t0 = System.nanoTime()
    builder.build("t1", "big", nlist = 512, algo = "IVF_PQ", pqM = 8, pqK = 256)
    println(f"build_sec ${(System.nanoTime() - t0) / 1e9}%.1f")
    val qs = records(100).select(col("id"), col("vector")).collect()
      .map(r => (r.getString(0).stripPrefix("v").toLong,
        r.getSeq[Float](1).toArray))

    def measure(label: String, eng: GraftEngine): Unit = {
      val t = System.nanoTime()
      val (r0, tr0) = eng.searchRowsTraced("t1", "big", Array(qs.head), 10,
        nprobe = 10, refine = 50)
      require(r0.length == 10 && tr0.path == "head+pqtail-refined",
        s"$label expected head+pqtail-refined, got ${tr0.path}")
      println(f"$label cold_refined_sec ${(System.nanoTime() - t) / 1e9}%.2f")
      // full-width warmup, then 3 interleaved rounds — the graded row's
      // (fixed) shape
      (0 until 3).foreach { _ =>
        eng.searchRows("t1", "big", qs, 10, nprobe = 10, refine = 50)
      }
      System.gc()
      val lat = (0 until 3).flatMap(_ => qs.map { q =>
        val s = System.nanoTime()
        eng.searchRows("t1", "big", Array(q), 10, nprobe = 10, refine = 50)
        (System.nanoTime() - s) / 1e6
      }).toArray.sorted
      println(f"$label refined_ms p50=${lat(lat.length / 2)}%.3f " +
        f"p90=${lat(lat.length * 9 / 10)}%.3f " +
        f"p99=${lat(lat.length * 98 / 100)}%.3f n=${lat.length}")
    }

    // A: sidecar-loaded store (the graded row's path since r10)
    measure("A_sidecar", new GraftEngine(spark, root))
    // B: wave-fetch-built store over the same snapshot
    measure("B_wavefetch", new GraftEngine(spark, root,
      sq16IgnoreSidecar = true))
    // A again — order-independence check (heap now holds B's store too)
    measure("A2_sidecar_again", new GraftEngine(spark, root))
    spark.stop()
  }
}
