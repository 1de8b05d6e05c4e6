package graft.operators

import graft.SparkSpec

/** VEC.STATS metrics-text emission (S5) — string-level assertion against
  * the reference's Prometheus exposition format
  * (reference: Services/MetricsCollector.cs:55-103). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("metricsText renders counters + cumulative latency histogram") {
    // latencies: 0.5 (b0), 3 (b1), 7 (b2), 20 (b3), 20 (b3), 150 (b5)
    val lat = Seq(0.5, 3.0, 7.0, 20.0, 20.0, 150.0).toDF("latency_ms")
    val hist = Governance.latencyHistogram(lat, "latency_ms")
    val text = Governance.metricsText(
      Governance.standardCounters(hits = 10, misses = 4, evictions = 1, fallbacks = 0),
      hist)

    val expected =
      """# HELP cache_hit_total Total number of cache hits
        |# TYPE cache_hit_total counter
        |cache_hit_total 10
        |# HELP cache_miss_total Total number of cache misses
        |# TYPE cache_miss_total counter
        |cache_miss_total 4
        |# HELP cache_eviction_total Total number of cache evictions
        |# TYPE cache_eviction_total counter
        |cache_eviction_total 1
        |# HELP ai_fallback_total Total number of AI fallback events
        |# TYPE ai_fallback_total counter
        |ai_fallback_total 0
        |# HELP vector_search_latency_ms Latency buckets
        |# TYPE vector_search_latency_ms histogram
        |vector_search_latency_ms_bucket{le="1"} 1
        |vector_search_latency_ms_bucket{le="5"} 2
        |vector_search_latency_ms_bucket{le="10"} 3
        |vector_search_latency_ms_bucket{le="50"} 5
        |vector_search_latency_ms_bucket{le="100"} 5
        |vector_search_latency_ms_bucket{le="+Inf"} 6
        |vector_search_latency_ms_count 6
        |vector_search_latency_ms_sum 0
        |""".stripMargin
    assert(text == expected)
  }
}
