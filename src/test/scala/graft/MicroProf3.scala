package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: profile the warm cached-search path at 20k queries. */
object MicroProf3 {
  val udfCalls = new java.util.concurrent.atomic.AtomicLong(0L)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        if (wall > 500)
          println(f"SLOW-STAGE ${si.stageId} ${si.numTasks}t wall=${wall / 1e3}%.2f run=${tm.executorRunTime / 1e3}%.2f gc=${tm.jvmGCTime / 1e3}%.2f | ${si.name.take(70)}")
      }
    })
    val dim = 128
    val synth = spark.range(100000)
      .select(col("id"), transform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64(col("id") * lit(dim) + i), lit(2000000)) / 1000000.0 - 1.0)
          .cast("float")).as("vec"))
      .repartition(32).cache()
    synth.count()
    val eng = new GraftEngine(spark,
      java.nio.file.Files.createTempDirectory("bench_cache").toString)
    val recs = synth.limit(20000)
      .select(col("id").cast("string").as("id"), col("vec").as("vector"))
      .withColumn("tenant_id", lit("t0"))
      .withColumn("index_name", lit("emb"))
      .withColumn("meta", lit(null).cast("string"))
      .withColumn("tags", lit(null).cast("array<string>"))
      .withColumn("updated_at", lit(100L))
    eng.add(recs)
    eng.build("t0", "emb", nlist = 32)
    val qs = synth.limit(20000)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
    qs.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // decompose the keyed-plan cost on the single-partition query frame
    time("simhash UDF")(qs.select(
      graft.functions.VectorSimHash.simhashCol(col("qvec")).as("s")).agg(sum("s")).count())
    val cents = eng.centroids("t0", "emb").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)
    val bestU = udf { (qv: Seq[Float]) =>
      val arr = qv.toArray
      var bcid = -1; var bs = Double.NegativeInfinity
      bc.value.foreach { case (cid, cv) =>
        var s = 0.0; var i = 0
        while (i < cv.length) { val d = arr(i).toDouble - cv(i); s += d * d; i += 1 }
        val sc = -s
        if (sc > bs) { bs = sc; bcid = cid }
      }
      (bcid, bs)
    }
    time("bestU UDF")(qs.select(bestU(col("qvec")).as("b")).agg(max("b._2")).count())
    time("bestU + 2 field refs")(qs.withColumn("best", bestU(col("qvec")))
      .select(col("best._1").as("c"), col("best._2").as("s"))
      .agg(max("c"), max("s")).count())
    time("l0 key")(qs.select(
      xxhash64(xxhash64(col("qvec")), lit(10)).as("k")).agg(sum("k")).count())

    var t0 = System.nanoTime()
    val cold = eng.searchCached("t0", "emb", qs, 10, nprobe = 4, now = 1000L)
    val coldHits = cold.filter(col("cache_hit")).count()
    println(f"COLD=${(System.nanoTime() - t0) / 1e9}%.2f s hits=$coldHits")

    // incremental reconstruction of the exact hitRows chain
    {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Caching
      val m = eng.manifest("t0", "emb")
      val cents2 = eng.centroids("t0", "emb").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val bc2 = spark.sparkContext.broadcast(cents2)
      val bestU2 = udf { (qv: Seq[Float]) =>
        val arr = qv.toArray
        var bcid = -1; var bs = Double.NegativeInfinity
        bc2.value.foreach { case (cid, cv) =>
          var s = 0.0; var i = 0
          while (i < cv.length) { val d = arr(i).toDouble - cv(i); s += d * d; i += 1 }
          if (-s > bs) { bs = -s; bcid = cid }
        }
        (bcid, bs)
      }
      val tagsNorm = array().cast("array<string>")
      val cost = lit(20000 / 10000.0) * (size(col("qvec")) / 128.0)
      val admitted = sqrt(-col("cscore")) <= Caching.closenessThreshold("L2", cost)
      val withCluster = qs
        .withColumn("best", bestU2(col("qvec")))
        .withColumn("cscore", col("best._2"))
        .withColumn("l2_cluster", when(admitted, col("best._1")))
        .select(col("query_id"), col("qvec"), col("l2_cluster"))
      val keyed = withCluster
        .withColumn("l0_key", Caching.queryKey(lit("t0"), lit("emb"), lit(10),
          lit("L2"), tagsNorm, xxhash64(xxhash64(col("qvec")), lit(10))))
        .withColumn("l1_key", Caching.queryKey(lit("t0"), lit("emb"), lit(10),
          lit("L2"), tagsNorm, graft.functions.VectorSimHash.simhashCol(col("qvec"))))
        .withColumn("l2_key", when(col("l2_cluster").isNotNull,
          Caching.queryKey(lit("t0"), lit("emb"), lit(10), lit("L2"), tagsNorm,
            col("l2_cluster").cast("long"))))
        .cache()
      time("A0 qs recount")(qs.count())
      time("A1 withCluster")(withCluster.count())
      time("A2 +l0")(withCluster.withColumn("l0_key",
        Caching.queryKey(lit("t0"), lit("emb"), lit(10), lit("L2"), tagsNorm,
          xxhash64(xxhash64(col("qvec")), lit(10)))).count())
      time("A3 +l1")(withCluster.withColumn("l1_key",
        Caching.queryKey(lit("t0"), lit("emb"), lit(10), lit("L2"), tagsNorm,
          graft.functions.VectorSimHash.simhashCol(col("qvec")))).count())
      val nocache = withCluster
        .withColumn("l0_key", Caching.queryKey(lit("t0"), lit("emb"), lit(10),
          lit("L2"), tagsNorm, xxhash64(xxhash64(col("qvec")), lit(10))))
        .withColumn("l1_key", Caching.queryKey(lit("t0"), lit("emb"), lit(10),
          lit("L2"), tagsNorm, graft.functions.VectorSimHash.simhashCol(col("qvec"))))
        .withColumn("l2_key", when(col("l2_cluster").isNotNull,
          Caching.queryKey(lit("t0"), lit("emb"), lit(10), lit("L2"), tagsNorm,
            col("l2_cluster").cast("long"))))
      time("A4 full no cache")(nocache.count())
      for (c <- Seq("l0_key", "l1_key", "l2_key", "l2_cluster")) {
        val one = nocache.select(col("query_id"), col(c)).cache()
        time(s"A5 cache $c")(one.count())
        one.unpersist()
      }
      // driver-side cost of simhash64 itself on the same 20k vectors
      {
        val arrs = qs.collect().map(_.getSeq[Float](1))
        val t0 = System.nanoTime()
        var acc = 0L
        arrs.foreach(a => acc ^= graft.functions.VectorSimHash.simhash64(a, 42L))
        println(f"A9 driver simhash64 x${arrs.length}: ${(System.nanoTime() - t0) / 1e9}%.2f s (acc=$acc)")
      }
      // how many times does Spark actually invoke the UDF under checkpoint?
      {
        MicroProf3.udfCalls.set(0L)
        val countingSimhash = udf { (v: Seq[Float]) =>
          MicroProf3.udfCalls.incrementAndGet()
          graft.functions.VectorSimHash.simhash64(v, 42L)
        }
        qs.select(col("query_id"), countingSimhash(col("qvec")).as("s"))
          .localCheckpoint(false).count()
        println(s"A10 UDF invocations for 20k rows under ckpt: ${MicroProf3.udfCalls.get()}")
      }
      time("A6 agg over full l1 expr")(
        nocache.agg(sum(col("l1_key"))).count())
      time("A7 ckpt RAW simhash only")(
        qs.select(col("query_id"),
          graft.functions.VectorSimHash.simhashCol(col("qvec")).as("s"))
          .localCheckpoint(false).count())
      time("A8 ckpt queryKey-wrapped simhash")(
        qs.select(col("query_id"),
          Caching.queryKey(lit("t0"), lit("emb"), lit(10), lit("L2"),
            array().cast("array<string>"),
            graft.functions.VectorSimHash.simhashCol(col("qvec"))).as("k"))
          .localCheckpoint(false).count())
      time("A keyed count")(keyed.count())
      val probes = keyed.withColumn("alias_key", lit(null).cast("long"))
        .select(col("query_id"),
          explode(filter(array(
            struct(lit(0).as("pri"), lit("L0").as("layer"), col("l0_key").as("key")),
            struct(lit(1).as("pri"), lit("L0.5").as("layer"), col("alias_key").as("key")),
            struct(lit(2).as("pri"), lit("L1").as("layer"), col("l1_key").as("key")),
            struct(lit(3).as("pri"), lit("L2").as("layer"), col("l2_key").as("key"))),
            p => p("key").isNotNull)).as("p"))
        .select(col("query_id"), col("p.pri"), col("p.layer"), col("p.key"))
      time("B probes count")(probes.count())
      val wNewest = Window.partitionBy("cache_key")
        .orderBy(col("written_at").desc, xxhash64(to_json(col("hits"))))
      val valid = eng.cacheEntries("t0", "emb")
        .filter(col("epoch") === m.epoch && col("expires_at") > 1010L)
        .withColumn("vrn", row_number().over(wNewest))
        .filter(col("vrn") === 1)
        .select(col("cache_key"), col("hits"))
      time("C valid count")(valid.count())
      val joined = probes.join(valid, probes("key") === valid("cache_key"))
      time("D join count")(joined.count())
      val wPri = Window.partitionBy("query_id").orderBy(col("pri"))
      val hr = joined.withColumn("hrn", row_number().over(wPri))
        .filter(col("hrn") === 1)
        .select(col("query_id"), col("layer"), col("hits"))
      time("E window count")(hr.count())
      time("F checkpoint")(hr.localCheckpoint())
      keyed.unpersist()
    }

    // standalone repro of the hitRows probe-join shape
    {
      import org.apache.spark.sql.expressions.Window
      val m = eng.manifest("t0", "emb")
      val probes = qs.select(col("query_id"),
        xxhash64(lit("t0"), lit("emb"), lit(10), lit("L2"), lit(""),
          xxhash64(xxhash64(col("qvec")), lit(10))).as("key"))
      val wNewest = Window.partitionBy("cache_key")
        .orderBy(col("written_at").desc, xxhash64(to_json(col("hits"))))
      val valid = eng.cacheEntries("t0", "emb")
        .filter(col("epoch") === m.epoch && col("expires_at") > 1010L)
        .withColumn("vrn", row_number().over(wNewest))
        .filter(col("vrn") === 1)
        .select(col("cache_key"), col("hits"))
      val joined = probes.join(valid, probes("key") === valid("cache_key"))
      time("probe-join repro")(joined.count())
      joined.count()
      println("JOIN PLAN: " + joined.queryExecution.executedPlan.toString.take(2500))
    }
    t0 = System.nanoTime()
    val warm = eng.searchCached("t0", "emb", qs, 10, nprobe = 4, now = 1010L)
    val warmRows = warm.count()
    val warmMiss = warm.filter(!col("cache_hit")).count()
    println(f"WARM=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$warmRows missRows=$warmMiss")
    spark.stop()
  }
}
