package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** The sidecar boundary contract end to end: the full metrics→policy loop
  * through the on-disk contract dir, version-skew rejection, and
  * partial-frame rejection. */
class SidecarContractSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() =
    Files.createTempDirectory("sidecar-contract").toString

  test("roundtrip: engine metrics out, sidecar policies back, applied") {
    val root = newRoot()
    val w = 7L

    // engine side publishes the interval metrics
    val metrics = Seq(
      ("t0", 100L, 80L),  // miss_rate 0.8 → aggressive
      ("t1", 100L, 10L))  // miss_rate 0.1 → defaults
      .toDF("tenant", "n_requests", "n_misses")
    SidecarContract.writeMetrics(metrics, root, w)

    // sidecar side consumes them, computes policy, publishes back
    val got = SidecarContract.readMetrics(spark, root, w)
    assert(got.count() == 2)
    val policies = Policy.heuristic(got.drop("window"))
      .drop("miss_rate", "aggressive")
    SidecarContract.writePolicies(policies, root, w)

    // engine side consumes the decisions
    val back = SidecarContract.readPolicies(spark, root, w)
      .collect().map(r => r.getAs[String]("tenant") ->
        ((r.getAs[Int]("ttl_seconds"), r.getAs[Double]("admission_threshold"),
          r.getAs[String]("eviction_priority")))).toMap
    assert(back("t0") == ((300, 0.05, "aggressive")))
    assert(back("t1") == ((60, 0.2, "normal")))
  }

  test("version skew is rejected loudly on read and on later writes") {
    val root = newRoot()
    SidecarContract.writeMetrics(
      Seq(("t0", 1L, 0L)).toDF("tenant", "n_requests", "n_misses"), root, 1L)
    // a future sidecar bumps the contract
    Files.write(Paths.get(s"$root/CONTRACT.json"),
      """{"version":999}""".getBytes(UTF_8))
    val e = intercept[IllegalArgumentException] {
      SidecarContract.readMetrics(spark, root, 1L)
    }
    assert(e.getMessage.contains("version skew"))
    intercept[IllegalArgumentException] {
      SidecarContract.writeMetrics(
        Seq(("t0", 1L, 0L)).toDF("tenant", "n_requests", "n_misses"), root, 2L)
    }
  }

  test("frames missing contract fields are rejected; partial policy rows are dropped, not served") {
    val root = newRoot()
    // writer side: a frame without n_misses must not cross the boundary
    val e = intercept[IllegalArgumentException] {
      SidecarContract.writeMetrics(
        Seq(("t0", 1L)).toDF("tenant", "n_requests"), root, 1L)
    }
    assert(e.getMessage.contains("n_misses"))
    // reader side: a policy row missing a required field (hand-landed
    // JSON, as a skewed sidecar would write) is dropped by the validity
    // filter instead of coming back with nulls
    SidecarContract.ensureContract(root)
    val dir = Paths.get(s"$root/policies/window=3")
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-0.json"),
      ("""{"tenant":"t0","window":3,"ttl_seconds":60,"admission_threshold":0.2,"eviction_priority":"normal"}""" +
        "\n" +
        """{"tenant":"t1","window":3,"ttl_seconds":60}""").getBytes(UTF_8))
    val rows = SidecarContract.readPolicies(spark, root, 3L).collect()
    assert(rows.map(_.getAs[String]("tenant")).toSeq == Seq("t0"))
  }
}
