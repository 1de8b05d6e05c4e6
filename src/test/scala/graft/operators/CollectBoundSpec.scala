package graft.operators

import scala.util.Random

import graft.SparkSpec

/** The no-unbounded-driver-collect rule on every query path: when the
  * query batch exceeds `maxLocalQueries`, the PQ / IVF-PQ / HNSW searches
  * must switch to their distributed (or chunked) plans and return results
  * identical to the driver-local fast path. */
class CollectBoundSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private lazy val vectors = {
    val rng = new Random(11)
    (0 until 400).map(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
      .toDF("id", "vec").cache()
  }
  private lazy val queries = {
    val rng = new Random(12)
    (0 until 10).map(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
      .toDF("query_id", "qvec").cache()
  }

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("Pq.knn: distributed ADC path == local broadcast path") {
    val cb = Pq.train(vectors, m = 4, k = 8)
    val enc = Pq.encode(vectors, cb)
    val local = Pq.knn(enc, queries, cb, 5)
    val dist = Pq.knn(enc, queries, cb, 5, maxLocalQueries = 3)
    assert(resultSet(local) == resultSet(dist))
  }

  test("IvfPq.search: distributed ADC-column path == local broadcast path") {
    val idx = IvfPq.build(vectors, nlist = 4, m = 4, k = 8)
    val local = IvfPq.search(idx, queries, 5, nprobe = 2)
    // cap below nq*nprobe = 20 probe rows → distributed branch
    val dist = IvfPq.search(idx, queries, 5, nprobe = 2, maxLocalQueries = 7)
    assert(resultSet(local) == resultSet(dist))
  }

  test("Hnsw.search: chunked broadcast path == single-collect path") {
    val graphs = Hnsw.build(vectors, "L2", numPartitions = 2)
    val one = Hnsw.search(graphs, queries, 5)
    val chunked = Hnsw.search(graphs, queries, 5, maxLocalQueries = 3)
    assert(resultSet(one) == resultSet(chunked))
  }

  test("Hnsw.search: empty query batch returns an empty frame") {
    val graphs = Hnsw.build(vectors, "L2", numPartitions = 2)
    val empty = queries.filter("query_id < 0")
    assert(Hnsw.search(graphs, empty, 5).count() == 0)
  }
}
