package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key — the shape that melts a single reducer
  private lazy val skewed = ((0 until 9000).map(_ => ("hot", 1.0)) ++
    (0 until 1000).map(i => (s"k${i % 50}", 2.0)))
    .toDF("key", "v").repartition(8)

  test("salted count equals direct count on skewed keys") {
    val direct = skewed.groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(skewed, Seq("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("hot") == 9000)
  }

  test("salted sum equals direct sum (integer-valued doubles, exact)") {
    val direct = skewed.groupBy("key").agg(sum("v").as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Salting.saltedSum(skewed, Seq("key"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("salted plan has two aggregation exchanges (the skew split)") {
    val plan = Salting.saltedCount(skewed, Seq("key"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2, plan)
  }
}
