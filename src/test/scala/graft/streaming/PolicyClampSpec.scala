package graft.streaming

import graft.SparkSpec

/** Deterministic LLM-policy validate/clamp/fallback
  * (reference: src/Pyrope.AISidecar/llm_policy_engine.py:50-122 and its
  * pytest coverage under Pyrope.AISidecar/tests). */
class PolicyClampSpec extends SparkSpec {
  import spark.implicits._

  private def run(responses: Seq[String]) =
    Policy.validateClamp(
        responses.zipWithIndex.map { case (r, i) => (i, r) }.toDF("row_id", "response"))
      .orderBy("row_id")
      .select("ttl_seconds", "admission_threshold", "eviction_priority", "fallback")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getBoolean(3)))

  test("valid in-range JSON passes through unchanged") {
    val Array(r) = run(Seq(
      """{"ttl_seconds": 300, "admission_threshold": 0.5, "eviction_priority": 1}"""))
    assert(r == ((300, 0.5, 1, false)))
  }

  test("out-of-range values clamp to [30,3600] / [0,1] / [0,2]") {
    val got = run(Seq(
      """{"ttl_seconds": 5, "admission_threshold": -0.5, "eviction_priority": 9}""",
      """{"ttl_seconds": 99999, "admission_threshold": 1.5, "eviction_priority": -1}"""))
    assert(got(0) == ((30, 0.0, 2, false)))
    assert(got(1) == ((3600, 1.0, 0, false)))
  }

  test("JSON embedded in surrounding prose is extracted (regex, like the reference)") {
    val Array(r) = run(Seq(
      """Sure! Here is the config: {"ttl_seconds": 120, "admission_threshold": 0.1, "eviction_priority": 0} Hope that helps."""))
    assert(r == ((120, 0.1, 0, false)))
  }

  test("garbage / missing-field / empty responses fall back to heuristic defaults") {
    val got = run(Seq(
      "not json at all",
      """{"ttl_seconds": 300}""",
      "",
      """{"ttl_seconds": "soon", "admission_threshold": 0.5, "eviction_priority": 1}"""))
    got.foreach { r => assert(r == ((60, 0.2, 1, true)), s"expected fallback, got $r") }
  }
}
