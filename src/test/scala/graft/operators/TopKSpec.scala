package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perGroup matches sort-desc-limit oracle incl. tie-break by id") {
    val rng = new Random(42)
    val rows = for {
      q <- 0 until 5
      i <- 0 until 200
    } yield (q.toLong, i.toLong, math.floor(rng.nextDouble() * 100) / 100) // forced ties
    val df = rows.toDF("query_id", "id", "score").repartition(7)

    val got = TopK.perGroup(df, Seq("query_id"), 10)
      .select("query_id", "rank", "id", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    val want = rows.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      rs.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex.map { case ((_, id, s), i) =>
        (q, i + 1, id, s)
      }
    }.sortBy(t => (t._1, t._2))

    assert(got.toSeq == want)
  }

  test("map-side partial aggregation: exchange carries at most k rows per (query, partition)") {
    // Structural check: the aggregate is a partial+final pair, not a window
    // over the full scored set — i.e., plan contains ObjectHashAggregate /
    // SortAggregate twice around the shuffle.
    val df = (0 until 100).map(i => (i % 3L, i.toLong, i * 1.0))
      .toDF("query_id", "id", "score")
    val plan = TopK.perGroup(df, Seq("query_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("native TopKHits agrees with the typed-Aggregator cross-check") {
    val rng = new Random(7)
    val rows = for { q <- 0 until 4; i <- 0 until 500 }
      yield (q.toLong, i.toLong, math.floor(rng.nextDouble() * 50) / 50)
    val df = rows.toDF("query_id", "id", "score").repartition(9)
    val native = df.groupBy("query_id")
      .agg(TopK.topkCol(7, col("id"), col("score")).as("hits"))
      .orderBy("query_id").collect().map(_.toString)
    val udafR = df.groupBy("query_id")
      .agg(TopK.topkColUdaf(7, col("id"), col("score")).as("hits"))
      .orderBy("query_id").collect().map(_.toString)
    assert(native.sameElements(udafR))
  }

  test("k larger than group size returns whole group ranked") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 3.0)).toDF("query_id", "id", "score")
    val got = TopK.perGroup(df, Seq("query_id"), 10)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 11L), (2, 10L)))
  }
}
