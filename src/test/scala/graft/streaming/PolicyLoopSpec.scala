package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sidecar policy loop end-to-end (St5 assembled): interval metrics →
  * heuristic policy → LLM validate/clamp overlay → seeded bandit
  * exploration → write-hot TTL shortening → decision log roundtrip
  * (reference loop: SidecarMetricsReporter.cs:52-110 + server.py:126-167
  * + policy/bandit/llm engines). */
class PolicyLoopSpec extends SparkSpec {
  import spark.implicits._

  test("metrics → heuristic → clamp → bandit → hot-TTL → decision log") {
    // t1 misses hard (aggressive), t2 is healthy (normal)
    val metrics = Seq(("t1", 100L, 80L), ("t2", 100L, 10L))
      .toDF("tenant", "n_requests", "n_misses")
    val heur = Policy.heuristic(metrics)
    val h = heur.collect().map(r =>
      r.getString(0) -> (r.getInt(3), r.getDouble(2))).toMap
    assert(h("t1") == ((300, 0.05))) // aggressive
    assert(h("t2") == ((60, 0.2)))   // normal

    // LLM overlay: t1 gets a valid (out-of-range) response → clamped;
    // t2's response is garbage → fallback flag, heuristic value kept
    val responses = Seq(
      ("t1", """{"ttl_seconds": 99999, "admission_threshold": 0.5, "eviction_priority": 1}"""),
      ("t2", "no json here")).toDF("tenant", "response")
    val clamped = Policy.validateClamp(responses)
    val overlaid = heur.drop("ttl_seconds", "admission_threshold")
      .join(clamped.select(col("tenant"), col("ttl_seconds"),
        col("admission_threshold"), col("fallback")), "tenant")
      // fallback rows keep the heuristic decision (reference fallback path)
      .withColumn("ttl_seconds",
        when(col("fallback"), when(col("tenant") === "t1", 300).otherwise(60))
          .otherwise(col("ttl_seconds")))
    val o = overlaid.collect().map(r =>
      r.getAs[String]("tenant") -> r.getAs[Int]("ttl_seconds")).toMap
    assert(o("t1") == 3600) // clamped from 99999
    assert(o("t2") == 60)   // fallback → heuristic

    // bandit exploration halves TTL on a deterministic hash of (tenant, window)
    val windowed = overlaid.withColumn("w", lit(7L))
    val band = Policy.banditAdjust(windowed, "w", epsilonPct = 100) // explore all
    val b = band.collect().map(r =>
      r.getAs[String]("tenant") -> r.getAs[Int]("ttl_seconds")).toMap
    assert(b("t1") == 1800 && b("t2") == 30)

    // write-hot cluster → TTL shortened to 10% floor 1 s
    val heat = Seq(("t1", 3, true)).toDF("tenant", "cluster", "hot")
    val hot = Policy.shortenHotTtl(band, heat)
    val ht = hot.collect().map(r =>
      r.getAs[String]("tenant") -> r.getAs[Int]("ttl_seconds")).toMap
    assert(ht("t1") == 180) // 1800/10
    assert(ht("t2") == 30)  // untouched

    // decision log roundtrip (S14)
    val dir = java.nio.file.Files.createTempDirectory("decisions").toString + "/log"
    Policy.writeDecisions(hot.select("tenant", "ttl_seconds", "miss_rate"), dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("tenant", "ttl_seconds", "miss_rate"))
  }

  test("learning loop: interval hit rates become rewards, arm values drive the next TTL") {
    // TTL arms under evaluation; no prior knowledge
    val arms = Seq(("t1", 60, 0.0, 0L), ("t1", 300, 0.0, 0L))
      .toDF("tenant", "arm", "value", "n")
    // interval 1 served under arm 60 and missed hard; interval 2 under
    // arm 300 hit well — the reward IS the observed hit rate
    def reward(metrics: org.apache.spark.sql.DataFrame, arm: Int) =
      Policy.heuristic(metrics).select(col("tenant"), lit(arm).as("arm"),
        (lit(1.0) - col("miss_rate")).as("reward"))
    val v1 = Policy.banditUpdate(arms,
      reward(Seq(("t1", 100L, 80L)).toDF("tenant", "n_requests", "n_misses"), 60))
    val v2 = Policy.banditUpdate(v1,
      reward(Seq(("t1", 100L, 10L)).toDF("tenant", "n_requests", "n_misses"), 300))
    // pure exploitation (ε=0): the learned winner overrides the heuristic
    val pol = Policy.heuristic(
        Seq(("t1", 100L, 10L)).toDF("tenant", "n_requests", "n_misses"))
      .withColumn("w", lit(5L))
    val chosen = Policy.banditPolicy(pol, v2, "w", epsilonPct = 0)
      .select("ttl_seconds").head.getInt(0)
    assert(chosen == 300)
  }
}
