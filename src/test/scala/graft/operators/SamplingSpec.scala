package graft.operators

import graft.SparkSpec

/** Deterministic stratified sampling ([[Sampling.stratified]]): quota
  * exactness, partition-layout independence, seed sensitivity, and
  * agreement with a local reimplementation of the (hash, id) order. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 97L).map(i => (i, s"s${(i % 3)}"))

  private def localOracle(n: Int, seed: Long): Map[String, Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hk(id: Long): String = {
      val d = md.digest(s"$seed:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(13)
    }
    docs.groupBy(_._2).map { case (s, rows) =>
      s -> rows.map(_._1).sortBy(id => (hk(id), id)).take(n)
    }
  }

  private def run(n: Int, seed: Long, parts: Int): Map[String, Seq[Long]] =
    Sampling
      .stratified(docs.toDF("doc_id", "lang").repartition(parts),
        "lang", "doc_id", n, seed)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, rows) => s -> rows.sortBy(_._2).map(_._3).toSeq }

  test("exact quota per stratum, ranked by the seeded hash order") {
    assert(run(n = 10, seed = 42L, parts = 4) == localOracle(10, 42L))
  }

  test("partition layout does not change the sample") {
    val a = run(n = 7, seed = 1L, parts = 1)
    assert(a == run(n = 7, seed = 1L, parts = 13))
    assert(a == localOracle(7, 1L))
  }

  test("short strata return all their rows; seeds decorrelate") {
    val all = run(n = 1000, seed = 42L, parts = 3)
    assert(all.values.map(_.size).sum == docs.size)
    assert(run(10, 42L, 3) != run(10, 43L, 3))
  }
}
