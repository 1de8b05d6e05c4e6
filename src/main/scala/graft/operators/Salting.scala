package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys: two-phase salted aggregation.
  *
  * At 100 TB a handful of hot keys (one tenant doing 90% of traffic, one
  * ubiquitous token) overwhelm single reducers. Salting splits each key
  * into `buckets` sub-keys for a partial aggregate, then combines the
  * partials — turning one hot reducer into `buckets` even ones. AQE's
  * skew-join handling covers joins; this covers aggregations.
  */
object Salting {

  /** Two-phase salted count: groupBy(keys ++ salt) partial counts →
    * groupBy(keys) sum. Result identical to a direct count, shuffle
    * balanced across `buckets` sub-partitions per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id()
      + xxhash64(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("n"))
  }

  /** Two-phase salted sum of an expression. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_v", value)
      .withColumn("_salt", pmod(spark_partition_id()
        + xxhash64(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum("_v").as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("total"))
  }
}
