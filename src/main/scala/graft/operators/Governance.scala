package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multi-tenant governance analytics: billing, budgets, quotas, write-heat
  * and latency percentiles — the reference's serving-side guardrails
  * re-expressed as windowed aggregations over a query/event log
  * (SURVEY §2.4 A7-A14; tenant ↔ user_id, cluster ↔ event_type here).
  */
object Governance {

  /** Per-tenant billing accumulation
    * (reference: Services/BillingMeter.cs:32-119): request counts and
    * exact integer-cents cost sums, plus the reference's compute-cost proxy
    * cost = count/10000 · dim/128 (reference: Vector/CostCalculator.cs:15-32). */
  def billingUsage(events: DataFrame, dim: Int = 64): DataFrame =
    events.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_requests"),
        sum(Tables.cents(col("value"))).as("total_cents"),
        min(Tables.cents(col("value"))).as("min_cents"),
        max(Tables.cents(col("value"))).as("max_cents"))
      .withColumn("cost_units",
        (col("n_requests") / 10000.0) * (dim / 128.0))

  /** Monthly cost window vs budget
    * (reference: TenantQuotaEnforcer.cs:94-135 — monthly reset, compare to
    * MonthlyBudget). ts is epoch-nanos. */
  def monthlyBudget(events: DataFrame, budgetCents: Long): DataFrame =
    events
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), year(col("t")).as("y"), month(col("t")).as("m"))
      .agg(sum(Tables.cents(col("value"))).as("month_cents"))
      .withColumn("over_budget", col("month_cents") > budgetCents)

  /** Write-heat: tumbling 1-minute per-key write counts, hot when > 10/min
    * (reference: Services/SemanticClusterRegistry.cs:72-121). */
  def writeHeat(events: DataFrame, hotThreshold: Int = 10): DataFrame =
    events
      .withColumn("minute", expr("ts div 60000000000"))
      .groupBy("user_id", "minute")
      .agg(count(lit(1)).as("n_writes"))
      .withColumn("hot", col("n_writes") > hotThreshold)

  /** QPS quota violations: 1-second windows vs a per-tenant max-QPS table
    * (reference: TenantQuotaEnforcer.cs:137-158). */
  def qpsViolations(events: DataFrame, quotas: DataFrame): DataFrame =
    events
      .withColumn("sec", expr("ts div 1000000000"))
      .groupBy("user_id", "sec")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(quotas), Seq("user_id"))
      .filter(col("n") > col("max_qps"))

  /** Exact nearest-rank percentiles per group
    * (reference: Benchmarks/Stats/LatencySummary.cs:17-57 — sorted sample,
    * index ceil(p·n)). Pure order-statistic selection: no interpolation
    * arithmetic, so results are engine-exact. */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val ranked = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = ps.map { p =>
      max(when(col("rn") === ceil(lit(p) * col("n")), col(valueCol)))
        .as(s"p${(p * 100).round}")
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** 6-bucket latency histogram (reference: Services/MetricsCollector.cs:39-53). */
  def latencyHistogram(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn("bucket",
        when(col(valueCol) < 1, "b0_lt1")
          .when(col(valueCol) < 5, "b1_lt5")
          .when(col(valueCol) < 10, "b2_lt10")
          .when(col(valueCol) < 50, "b3_lt50")
          .when(col(valueCol) < 100, "b4_lt100")
          .otherwise("b5_ge100"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** VEC.STATS metrics-text dump (S5): Prometheus exposition format over
    * the counter aggregates + 6-bucket latency histogram — the reference's
    * GetStats text (reference: Services/MetricsCollector.cs:55-103).
    * Counters render in the reference's order; histogram buckets are
    * CUMULATIVE (le= upper bounds 1/5/10/50/100/+Inf) like the reference's
    * running `count`. `histogram` is [[latencyHistogram]] output. */
  def metricsText(counters: Seq[(String, String, Long)],
                  histogram: DataFrame): String = {
    val sb = new StringBuilder
    counters.foreach { case (name, help, v) =>
      sb.append(s"# HELP $name $help\n")
      sb.append(s"# TYPE $name counter\n")
      sb.append(s"$name $v\n")
    }
    val byBucket = histogram.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("b0_lt1" -> "1", "b1_lt5" -> "5", "b2_lt10" -> "10",
      "b3_lt50" -> "50", "b4_lt100" -> "100", "b5_ge100" -> "+Inf")
    sb.append("# HELP vector_search_latency_ms Latency buckets\n")
    sb.append("# TYPE vector_search_latency_ms histogram\n")
    var cum = 0L
    order.foreach { case (bucket, le) =>
      cum += byBucket.getOrElse(bucket, 0L)
      sb.append(s"""vector_search_latency_ms_bucket{le="$le"} $cum""").append('\n')
    }
    sb.append(s"vector_search_latency_ms_count $cum\n")
    sb.append("vector_search_latency_ms_sum 0\n")
    sb.toString
  }

  /** The reference's counter names/help strings, for callers assembling a
    * full VEC.STATS dump (MetricsCollector.cs:55-75). */
  def standardCounters(hits: Long, misses: Long, evictions: Long,
                       fallbacks: Long): Seq[(String, String, Long)] = Seq(
    ("cache_hit_total", "Total number of cache hits", hits),
    ("cache_miss_total", "Total number of cache misses", misses),
    ("cache_eviction_total", "Total number of cache evictions", evictions),
    ("ai_fallback_total", "Total number of AI fallback events", fallbacks))

  /** SLO check per window: nearest-rank p99 vs target → degraded flag
    * (reference batch form of SloGuardrailsMonitor.cs:80-113; the
    * hysteresis variant lives in the streaming module). */
  def sloWindows(events: DataFrame, valueCol: String, target: Double): DataFrame = {
    val w = Window.partitionBy("event_type", "minute").orderBy(valueCol)
    events
      .withColumn("minute", expr("ts div 60000000000"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type", "minute")))
      .filter(col("rn") === ceil(lit(0.99) * col("n")))
      .select(col("event_type"), col("minute"), col(valueCol).as("p99"))
      .withColumn("degraded", col("p99") > target)
  }
}
