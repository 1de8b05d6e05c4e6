package graft.streaming

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfFlat

class PrefetchSpec extends SparkSpec {
  import spark.implicits._

  test("A→B rule materializes cluster-B centroid results into the cache (St4)") {
    val rng = new Random(42)
    val pts = (0 until 400).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(8)(d => c * 10.0f + d + (rng.nextFloat() - 0.5f)))
    }
    val vectors = pts.toDF("id", "vec")
    val idx = IvfFlat.build(vectors, nlist = 4)

    // trained sequence A,B,A,B,... (FIXTURES §6): ≥3 A→B transitions
    val transitions = Seq.fill(4)(("t1", 0, 1)).toDF("tenant", "prev", "next")
    val rules = Streams.extractRules(transitions)
    assert(rules.count() == 1)

    val cache = Prefetch.materialize(rules, idx, k = 5)
    val rows = cache.collect()
    assert(rows.length == 5)
    val warmed = rows.head.getAs[Int]("cluster_id")
    // every warmed hit belongs to the predicted cluster
    val members = idx.assigned.filter(col("cluster_id") === warmed)
      .select("id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("id")).forall(members.contains))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("expires_at") != null))
    // one stable cache key per (tenant, cluster)
    assert(rows.map(_.getAs[Long]("cache_key")).distinct.length == 1)
  }
}
