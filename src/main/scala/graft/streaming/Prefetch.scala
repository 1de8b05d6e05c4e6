package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfFlat, TopK}

/** Predictive prefetch materializer (St4).
  *
  * The reference fires a background search of the predicted next cluster's
  * centroid and caches the result for 5 minutes
  * (reference: src/Pyrope.GarnetServer/Extensions/VectorCommandSet.cs:318-379,
  * Services/PrefetchBackgroundQueue.cs:15-77). Batch-engine form: join the
  * mined rules to the centroid table, run one batched centroid-search, and
  * append the hits to the cache table with a TTL — warming the cache ahead
  * of the predicted access.
  */
object Prefetch {

  /** rules: (tenant, prev, next, cnt) — from Streams.extractRules.
    * Returns cache rows (cache_key, tenant, cluster_id, id, rank, score,
    * expires_at). */
  def materialize(rules: DataFrame, index: IvfFlat.Index, k: Int,
                  metric: String = "L2", ttlSeconds: Int = 300): DataFrame = {
    // one query per predicted cluster: its own centroid
    val queries = rules.select(col("tenant"), col("next").as("cluster_id")).distinct()
      .join(broadcast(index.centroids), Seq("cluster_id"))
      .select(col("tenant"), col("cluster_id"),
        col("cluster_id").cast("long").as("query_id"),
        col("centroid").as("qvec"))

    // search restricted to the predicted cluster's own inverted list —
    // the reference's prefetch probes exactly the predicted cluster
    val scored = index.assigned
      .join(broadcast(queries), Seq("cluster_id"))
      .select(col("tenant"), col("query_id"), col("id"),
        graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
    TopK.perGroup(scored, Seq("tenant", "query_id"), k)
      .select(col("tenant"), col("query_id").cast("int").as("cluster_id"),
        col("rank"), col("id"), col("score"))
      .withColumn("cache_key",
        xxhash64(col("tenant"), lit("prefetch"), col("cluster_id")))
      .withColumn("expires_at",
        current_timestamp() + expr(s"INTERVAL $ttlSeconds SECONDS"))
  }
}
