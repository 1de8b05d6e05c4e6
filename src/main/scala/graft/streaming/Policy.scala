package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableHash

/** The sidecar's cache-policy computation as deterministic Spark
  * transformations (St5 consumer side).
  */
object Policy {

  /** Heuristic warm-path policy from interval metrics
    * (reference: src/Pyrope.AISidecar/policy_engine.py:12-25 — miss_rate
    * > 0.5 ⇒ aggressive ttl 300 s / admission 0.05, else defaults).
    * metrics: (tenant, n_requests, n_misses). */
  def heuristic(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("miss_rate",
        when(col("n_requests") > 0, col("n_misses") / col("n_requests"))
          .otherwise(0.0))
      .withColumn("aggressive", col("miss_rate") > 0.5)
      .withColumn("admission_threshold",
        when(col("aggressive"), 0.05).otherwise(0.2))
      .withColumn("ttl_seconds",
        when(col("aggressive"), 300).otherwise(60))
      .withColumn("eviction_priority",
        when(col("aggressive"), "aggressive").otherwise("normal"))
      .select("tenant", "miss_rate", "admission_threshold", "ttl_seconds",
        "eviction_priority")

  /** ε-greedy bandit override: explore ~ε of (tenant, window) arms by
    * halving TTL (reference: src/Pyrope.AISidecar/bandit_engine.py:36-77).
    * Exploration is drawn from a seeded hash of (tenant, window) instead of
    * a RNG, so replays are reproducible. */
  def banditAdjust(policies: DataFrame, windowCol: String,
                   epsilonPct: Int = 10, seed: Long = 42L): DataFrame = {
    val explore = udf { (tenant: String, w: Long) =>
      math.floorMod(StableHash.rehash(StableHash.hashString(tenant, seed), w), 100L) < epsilonPct
    }
    policies
      .withColumn("explore", explore(col("tenant"), col(windowCol)))
      .withColumn("ttl_seconds",
        when(col("explore"), (col("ttl_seconds") / 2).cast("int"))
          .otherwise(col("ttl_seconds")))
  }

  /** Reward-driven bandit learning step — the deterministic `partial_fit`
    * analog of the sidecar's SGD bandit (reference:
    * src/Pyrope.AISidecar/bandit_engine.py:52-77): each (tenant, arm)'s
    * value estimate is the running mean of its observed rewards, updated
    * incrementally from this interval's observations.
    *
    * values:  (tenant, arm INT, value DOUBLE, n BIGINT) — arm is a policy
    *          ttl_seconds candidate; n is how many rewards value averages.
    * rewards: (tenant, arm INT, reward DOUBLE) — e.g. the interval's
    *          observed cache hit rate under that arm.
    * Returns the updated value table (same schema; unobserved arms pass
    * through unchanged). Pure column arithmetic — no RNG, no state outside
    * the table — so replays are exact. */
  def banditUpdate(values: DataFrame, rewards: DataFrame): DataFrame =
    values
      .join(rewards.groupBy("tenant", "arm")
          .agg(sum("reward").as("r_sum"), count(lit(1)).as("r_n")),
        Seq("tenant", "arm"), "left")
      .withColumn("value",
        when(col("r_n").isNotNull,
          (col("value") * col("n") + col("r_sum")) / (col("n") + col("r_n")))
          .otherwise(col("value")))
      .withColumn("n", col("n") + coalesce(col("r_n"), lit(0L)))
      .select("tenant", "arm", "value", "n")

  /** ε-greedy arm selection over a learned value table (the
    * exploit/explore choice of bandit_engine.py:36-50, seeded like
    * [[banditAdjust]]): per (tenant, window), explore ~ε of the time by
    * hash-picking an arm uniformly, otherwise exploit the arm with the
    * highest learned value (tie-break: lowest arm). The chosen arm
    * OVERRIDES the policy row's ttl_seconds; tenants absent from the
    * value table keep their heuristic ttl. */
  def banditPolicy(policies: DataFrame, values: DataFrame, windowCol: String,
                   epsilonPct: Int = 10, seed: Long = 42L): DataFrame = {
    val wBest = Window.partitionBy("tenant")
      .orderBy(col("value").desc, col("arm"))
    val best = values.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("tenant"), col("arm").as("best_arm"))
    val armsOf = values.groupBy("tenant")
      .agg(sort_array(collect_list(col("arm"))).as("arms"))
    val explore = udf { (tenant: String, w: Long) =>
      math.floorMod(StableHash.rehash(StableHash.hashString(tenant, seed), w),
        100L) < epsilonPct
    }
    val pick = udf { (tenant: String, w: Long, arms: Seq[Int]) =>
      arms(math.floorMod(
        StableHash.rehash(StableHash.hashString(tenant, seed + 1), w),
        arms.length.toLong).toInt)
    }
    policies
      .join(broadcast(best), Seq("tenant"), "left")
      .join(broadcast(armsOf), Seq("tenant"), "left")
      .withColumn("explore",
        col("arms").isNotNull && explore(col("tenant"), col(windowCol)))
      .withColumn("ttl_seconds",
        when(col("explore"), pick(col("tenant"), col(windowCol), col("arms")))
          .when(col("best_arm").isNotNull, col("best_arm"))
          .otherwise(col("ttl_seconds")))
      .drop("best_arm", "arms")
  }

  /** Deterministic half of the LLM policy engine (reference:
    * src/Pyrope.AISidecar/llm_policy_engine.py:50-122): extract the first
    * `{...}` JSON object from the raw model response, require the three
    * policy fields, clamp ttl to [30, 3600], admission to [0, 1], eviction
    * priority to [0, 2]; any parse/validation failure falls back to the
    * heuristic defaults (fallback = true). The model call itself is out of
    * scope — this consumes a column of already-produced response text.
    * raw: (..., `responseCol` STRING) → adds (ttl_seconds, admission_threshold,
    * eviction_priority, fallback). */
  def validateClamp(raw: DataFrame, responseCol: String = "response",
                    fallbackTtl: Int = 60, fallbackAdmission: Double = 0.2,
                    fallbackEviction: Int = 1): DataFrame = {
    val jsonStr = regexp_extract(col(responseCol), "\\{[^}]+\\}", 0)
    val parsed = from_json(when(jsonStr === "", null).otherwise(jsonStr),
      org.apache.spark.sql.types.StructType.fromDDL(
        "ttl_seconds INT, admission_threshold DOUBLE, eviction_priority INT"))
    raw
      .withColumn("_p", parsed)
      .withColumn("fallback",
        col("_p").isNull || col("_p.ttl_seconds").isNull ||
          col("_p.admission_threshold").isNull || col("_p.eviction_priority").isNull)
      .withColumn("ttl_seconds",
        when(col("fallback"), fallbackTtl)
          .otherwise(greatest(lit(30), least(lit(3600), col("_p.ttl_seconds")))))
      .withColumn("admission_threshold",
        when(col("fallback"), fallbackAdmission)
          .otherwise(greatest(lit(0.0), least(lit(1.0), col("_p.admission_threshold")))))
      .withColumn("eviction_priority",
        when(col("fallback"), fallbackEviction)
          .otherwise(greatest(lit(0), least(lit(2), col("_p.eviction_priority")))))
      .drop("_p")
  }

  /** Query-decision log (S14 — reference:
    * src/Pyrope.AISidecar/logger.py + server.py:186-201): append the
    * policy decisions with their input features for offline training. */
  def writeDecisions(policies: DataFrame, path: String): Unit =
    policies.write.mode("append").json(path)

  /** Write-hot TTL shortening on L2 entries: hot clusters get 10% TTL,
    * floor 1 s (reference: VectorCommandSet.cs:500-537 +
    * SemanticClusterRegistry.cs:95-121). */
  def shortenHotTtl(policies: DataFrame, heat: DataFrame): DataFrame =
    policies.join(heat.select("tenant", "cluster", "hot"),
        Seq("tenant"), "left")
      .withColumn("ttl_seconds",
        when(coalesce(col("hot"), lit(false)),
          greatest((col("ttl_seconds") / 10).cast("int"), lit(1)))
          .otherwise(col("ttl_seconds")))
}
