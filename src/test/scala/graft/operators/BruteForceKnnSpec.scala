package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mirrors the reference's E2E smoke fixture
  * (reference: tests/smoke_test.py:31-80 and FIXTURES.md §4). */
class BruteForceKnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vectors = Seq(
    (1L, Seq(1f, 0f, 0f), Seq.empty[String]), // doc1
    (2L, Seq(0f, 1f, 0f), Seq("tagA"))        // doc2
  ).toDF("id", "vec", "tags")

  test("smoke: [0.9,0.1,0] topK=2 → top-1 is doc1 (all metrics)") {
    val q = Seq((100L, Seq(0.9f, 0.1f, 0f))).toDF("query_id", "qvec")
    for (metric <- Seq("L2", "IP", "COSINE")) {
      val hits = BruteForceKnn.knn(vectors.select("id", "vec"), q, metric, 2)
        .orderBy("rank").collect()
      assert(hits.length == 2, metric)
      assert(hits(0).getAs[Long]("id") == 1L, s"metric=$metric top-1 should be doc1")
    }
  }

  test("smoke: [0,0.9,0] topK=1 FILTER tagA → doc2") {
    val q = Seq((101L, Seq(0f, 0.9f, 0f), Seq("tagA")))
      .toDF("query_id", "qvec", "filter_tags")
    val hits = BruteForceKnn.knnFiltered(vectors, q, "L2", 1).collect()
    assert(hits.length == 1)
    assert(hits(0).getAs[Long]("id") == 2L)
  }

  test("conjunctive all-of tag semantics (reference VectorCommandSet.cs:802-824)") {
    val vs = Seq(
      (1L, Seq(1f, 0f), Seq("a", "b")),
      (2L, Seq(1f, 0f), Seq("a")),
      (3L, Seq(1f, 0f), Seq.empty[String])
    ).toDF("id", "vec", "tags")
    // all-of {a,b}: only id 1 survives
    val q1 = Seq((1L, Seq(1f, 0f), Seq("a", "b"))).toDF("query_id", "qvec", "filter_tags")
    assert(BruteForceKnn.knnFiltered(vs, q1, "COSINE", 10)
      .select("id").as[Long].collect().toSet == Set(1L))
    // empty filter passes everything, including records with no tags
    val q2 = Seq((2L, Seq(1f, 0f), Seq.empty[String])).toDF("query_id", "qvec", "filter_tags")
    assert(BruteForceKnn.knnFiltered(vs, q2, "COSINE", 10)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // empty record tags fail a non-empty filter
    val q3 = Seq((3L, Seq(1f, 0f), Seq("a"))).toDF("query_id", "qvec", "filter_tags")
    assert(BruteForceKnn.knnFiltered(vs, q3, "COSINE", 10)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("maxScans caps the standalone brute path deterministically (F6)") {
    val vs = (0 until 50).map(i => (i.toLong, Seq(i.toFloat, 0f))).toDF("id", "vec")
    val q = Seq((1L, Seq(25f, 0f))).toDF("query_id", "qvec")
    val capped = BruteForceKnn.knn(vs, q, "L2", 50, maxScans = 5).collect()
    assert(capped.length == 5, s"expected exactly maxScans hits, got ${capped.length}")
    // deterministic: the capped candidate set is stable across runs
    val again = BruteForceKnn.knn(vs, q, "L2", 50, maxScans = 5).collect()
    assert(capped.map(_.getAs[Long]("id")).toSet == again.map(_.getAs[Long]("id")).toSet)
  }

  test("no shuffle of the vectors side: plan broadcasts the query batch") {
    val q = Seq((1L, Seq(1f, 0f, 0f))).toDF("query_id", "qvec")
    val plan = BruteForceKnn.knn(vectors.select("id", "vec"), q, "COSINE", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
