package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ: coarse inverted lists + product-quantized residuals.
  *
  * Capability mirror of the reference's IvfPqVectorIndex
  * (reference: src/Pyrope.GarnetServer/Vector/IvfPqVectorIndex.cs:55-198):
  * build = coarse KMeans → residual v − centroid → PQ codebooks on
  * residuals → byte codes; search = probe top-nprobe clusters, build one
  * residual ADC table per (query, probed cluster), score candidates by
  * table lookups only.
  */
object IvfPq {

  case class Index(assigned: DataFrame, // (id, cluster_id, codes BINARY)
                   centroids: DataFrame, // (cluster_id, centroid ARRAY<FLOAT>)
                   cb: Pq.Codebook)

  def build(vectors: DataFrame, nlist: Int, m: Int, k: Int,
            seed: Long = 123L): Index = {
    val coarse = IvfFlat.build(vectors, nlist, "L2", seed)
    val residuals = coarse.assigned
      .join(broadcast(coarse.centroids), Seq("cluster_id"))
      .withColumn("rvec", zip_with(col("vec"), col("centroid"), (x, y) => x - y))
      .select("id", "cluster_id", "rvec")
    val cb = Pq.train(residuals, m, k, seed, vecCol = "rvec")
    val assigned = Pq.encode(residuals, cb, vecCol = "rvec")
      .select("id", "cluster_id", "codes")
    Index(assigned, coarse.centroids, cb)
  }

  /** Persist the IVF-PQ index: cluster-partitioned codes + centroids +
    * PQ codebook (reference snapshot parity: IvfPqVectorIndex.cs:233-298). */
  def save(index: Index, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("cluster_id").parquet(s"$path/codes")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Pq.saveCodebook(index.cb, index.centroids.sparkSession, s"$path/codebooks")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(
      spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/centroids"),
      Pq.loadCodebook(spark, s"$path/codebooks"))

  /** Candidate generation without the final top-k: (query_id, id, score)
    * for every (query, probed-cluster member) pair — lets callers (the
    * engine's delta merge) union other candidate streams before ranking. */
  def scoredCandidates(index: Index, queries: DataFrame, nprobe: Int,
                       maxLocalQueries: Int = 10000): DataFrame = {
    val spark = queries.sparkSession
    val coarse = IvfFlat.Index(index.assigned, index.centroids)
    val probeSet = IvfFlat.probes(coarse, queries, "L2", nprobe)
      .join(broadcast(index.centroids), Seq("cluster_id"))
      .withColumn("rq", zip_with(col("qvec"), col("centroid"), (x, y) => x - y))
      .select("query_id", "cluster_id", "rq")

    // probeSet has nq × nprobe rows — bound it in QUERY units so the knob
    // keeps its documented meaning, but ALSO cap the driver's table bytes:
    // each admitted (query, cluster) pair costs one M×K-double ADC table,
    // so large nprobe must flip to the distributed path rather than
    // multiply the driver footprint nprobe-fold (~256 MB ceiling)
    val tableBytes = index.cb.m.toLong * index.cb.k * 8L
    val memCapPairs = math.max(1L, (256L << 20) / math.max(1L, tableBytes))
    val pairCap = (maxLocalQueries.toLong * math.max(1, nprobe))
      .min(memCapPairs).min(Int.MaxValue - 1L).toInt
    val sample = probeSet.limit(pairCap + 1).collect()
    val scored =
      if (sample.length <= pairCap) {
        // One residual ADC table per (query, probed cluster):
        // nq × nprobe × M × K doubles — small here by construction.
        val tables = sample.map { r =>
          (r.getLong(0), r.getInt(1)) -> Pq.adcTableFor(r.getSeq[Float](2), index.cb)
        }.toMap
        val bTables = spark.sparkContext.broadcast(tables)
        val score = udf { (queryId: Long, clusterId: Int, codes: Array[Byte]) =>
          val t = bTables.value((queryId, clusterId))
          var s = 0.0; var mi = 0
          while (mi < codes.length) { s += t(mi)(codes(mi) & 0xff); mi += 1 }
          -s
        }
        import spark.implicits._
        val probePairs = broadcast(
          tables.keys.toSeq.toDF("query_id", "cluster_id"))
        index.assigned
          .join(probePairs, Seq("cluster_id"))
          .select(col("query_id"), col("id"),
            score(col("query_id"), col("cluster_id"), col("codes")).as("score"))
      } else {
        val kk = index.cb.k
        val bcb = spark.sparkContext.broadcast(index.cb)
        val tableCol = udf { (rq: Seq[Float]) => Pq.adcTableFor(rq, bcb.value).flatten }
        val withTables = probeSet
          .select(col("query_id"), col("cluster_id"), tableCol(col("rq")).as("adc"))
        val score = udf { (adc0: Seq[Double], codes: Array[Byte]) =>
          val adc = graft.functions.doubleArray(adc0)
          var s = 0.0; var mi = 0
          while (mi < codes.length) { s += adc(mi * kk + (codes(mi) & 0xff)); mi += 1 }
          -s
        }
        index.assigned
          .join(withTables, Seq("cluster_id"))
          .select(col("query_id"), col("id"),
            score(col("adc"), col("codes")).as("score"))
      }
    scored
  }

  def search(index: Index, queries: DataFrame, k: Int, nprobe: Int,
             maxLocalQueries: Int = 10000): DataFrame =
    TopK.perGroup(
      scoredCandidates(index, queries, nprobe, maxLocalQueries),
      Seq("query_id"), k)

  /** ADC candidate generation + exact rerank against the true vectors
    * (see Pq.knnRefined — same rationale). */
  def searchRefined(index: Index, vectors: DataFrame, queries: DataFrame,
                    k: Int, nprobe: Int, refine: Int = 10): DataFrame = {
    val candidates = search(index, queries, k * refine, nprobe)
      .select("query_id", "id")
    Pq.rerank(candidates, vectors, queries, k, "L2")
  }
}
