package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.lit

import graft.{GraftEngine, SparkSpec}

/** The OPERATIONAL sidecar loop: live engine counters out through the
  * contract dir, sidecar policy frames back, TTL applied to subsequent
  * cache inserts — the reference's 10 s reporter loop
  * (SidecarMetricsReporter.cs:52-110 → DynamicPolicyEngine.cs:31-45)
  * driven tick-by-tick. */
class SidecarLoopSpec extends SparkSpec {
  import spark.implicits._

  private def mkEngine(): (GraftEngine, String) = {
    val root = Files.createTempDirectory("sidecar-loop-eng").toString
    val eng = new GraftEngine(spark, root)
    val recs = (0 until 30).map(i =>
        (s"v$i", Seq(i.toFloat, 1f, 0f), null: String, Seq.empty[String], 100L))
      .toDF("id", "vector", "meta", "tags", "updated_at")
      .withColumn("tenant_id", lit("t1"))
      .withColumn("index_name", lit("idx"))
      .withColumn("deleted", lit(false))
    eng.add(recs)
    eng.build("t1", "idx", nlist = 2)
    (eng, root)
  }

  test("tick publishes live counters and applies the newest policy's TTL to subsequent inserts") {
    val (eng, _) = mkEngine()
    val contract = Files.createTempDirectory("sidecar-loop-dir").toString
    val loop = new SidecarLoop(eng, spark, contract)

    // serve: two misses, one hit → live counters 1 hit / 2 misses
    eng.searchCachedRows("t1", "idx", 1L, Array(4f, 1f, 0f), k = 3,
      nprobe = 2, now = 1000L)
    eng.searchCachedRows("t1", "idx", 1L, Array(4f, 1f, 0f), k = 3,
      nprobe = 2, now = 1001L)
    eng.searchCachedRows("t1", "idx", 2L, Array(9f, 1f, 0f), k = 8,
      nprobe = 2, now = 1002L)

    // no policy frame yet: tick publishes metrics, engine keeps defaults
    loop.tick(window = 1L)
    assert(loop.latestPolicyWindow.isEmpty)
    assert(eng.servingTtl("t1") == 60)
    val m = SidecarContract.readMetrics(spark, contract, 1L).collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("tenant") == "t1")
    assert(m.head.getAs[Long]("n_requests") == 3L)
    assert(m.head.getAs[Long]("n_misses") == 2L)

    // the sidecar half: heuristic policy off the published window, frame
    // written back through the same contract dir (as SidecarContractSpec
    // pins for the pure-data path)
    val policies = Policy.heuristic(
        SidecarContract.readMetrics(spark, contract, 1L).drop("window"))
      .drop("miss_rate", "aggressive")
    SidecarContract.writePolicies(policies, contract, 1L)

    // next tick applies it: miss-rate 2/3 → aggressive ttl 300
    loop.tick(window = 2L)
    assert(eng.servingTtl("t1") == 300, eng.servingPolicyOf("t1"))
    assert(eng.servingPolicyOf("t1").contains((300, 0.05, "aggressive")))

    // the applied TTL drives the cache horizon: an insert under ttl 300
    // still serves at +100 s (the default 60 would have expired) and
    // dies past +300
    val qv = Array(13f, 1f, 0f)
    val ttl = eng.servingTtl("t1")
    val (miss, rows) = eng.searchCachedRows("t1", "idx", 3L, qv, k = 3,
      nprobe = 2, now = 2000L, ttlSeconds = ttl)
    assert(miss == "MISS")
    val (hitLate, rowsLate) = eng.searchCachedRows("t1", "idx", 3L, qv,
      k = 3, nprobe = 2, now = 2100L, ttlSeconds = ttl)
    assert(hitLate == "L0", s"ttl 300 entry must outlive the default 60: $hitLate")
    assert(rowsLate.toSeq == rows.toSeq)
    val (missExp, _) = eng.searchCachedRows("t1", "idx", 3L, qv, k = 3,
      nprobe = 2, now = 2301L, ttlSeconds = ttl)
    assert(missExp == "MISS", "entry must expire at the applied horizon")
    loop.close()
  }

  test("ttl 0 policy = the reference's NoCache: misses answer but never populate") {
    val (eng, _) = mkEngine()
    val contract = Files.createTempDirectory("sidecar-loop-nocache").toString
    val loop = new SidecarLoop(eng, spark, contract)
    SidecarContract.writePolicies(
      Seq(("t1", 0, 0.1, "default"))
        .toDF("tenant", "ttl_seconds", "admission_threshold",
          "eviction_priority"),
      contract, 5L)
    loop.tick(window = 6L)
    assert(eng.servingTtl("t1") == 0)
    val qv = Array(7f, 1f, 0f)
    val (m1, rows1) = eng.searchCachedRows("t1", "idx", 9L, qv, k = 3,
      nprobe = 2, now = 3000L, ttlSeconds = eng.servingTtl("t1"))
    assert(m1 == "MISS" && rows1.nonEmpty)
    // the entry was born expired: the repeat call at a LATER now must
    // miss again (correct answers, no caching — NoCache semantics)
    val (m2, rows2) = eng.searchCachedRows("t1", "idx", 9L, qv, k = 3,
      nprobe = 2, now = 3001L, ttlSeconds = eng.servingTtl("t1"))
    assert(m2 == "MISS", s"NoCache policy must not serve cached: $m2")
    assert(rows2.toSeq == rows1.toSeq)
    loop.close()
  }

  test("background loop publishes windows on its own cadence") {
    val (eng, _) = mkEngine()
    val contract = Files.createTempDirectory("sidecar-loop-bg").toString
    val loop = new SidecarLoop(eng, spark, contract)
    eng.searchCachedRows("t1", "idx", 1L, Array(4f, 1f, 0f), k = 3,
      nprobe = 2, now = 1000L)
    loop.start(intervalMs = 100L)
    try {
      val deadline = System.currentTimeMillis() + 10000
      var found = false
      while (!found && System.currentTimeMillis() < deadline) {
        found = Files.exists(java.nio.file.Paths.get(s"$contract/metrics")) &&
          Files.list(java.nio.file.Paths.get(s"$contract/metrics")).count() > 0
        if (!found) Thread.sleep(50)
      }
      assert(found, "loop thread must publish at least one metrics window")
    } finally loop.close()
  }
}
