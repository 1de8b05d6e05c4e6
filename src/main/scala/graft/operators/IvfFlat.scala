package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** IVF-Flat approximate nearest-neighbor index as Spark batch jobs.
  *
  * Capability mirror of the reference's inverted-file index
  * (reference: src/Pyrope.GarnetServer/Vector/IvfFlatVectorIndex.cs:85-218;
  * KMeans trainer Vector/KMeansUtils.cs:10-93) re-expressed Spark-first:
  *
  *  - Build = MLlib KMeans (coarse codebook) + assignment column; at scale
  *    the assigned table is written `partitionBy("cluster_id")` so nprobe
  *    becomes parquet partition pruning (SURVEY §4.1).
  *  - Search = query×centroid coarse scoring (broadcast, nlist rows) →
  *    top-nprobe probe set → equi-join into the inverted lists → exact
  *    scoring → bounded top-k.
  *
  * The only shuffle in the search path is the final ≤k-rows-per-partition
  * top-k exchange; the big vector table is joined via broadcast of the
  * (tiny) probe set.
  */
object IvfFlat {

  case class Index(assigned: DataFrame, centroids: DataFrame)

  /** Train the coarse codebook and assign every vector to its inverted list.
    * Cosine metric uses MLlib's cosine distance measure; L2/IP use
    * euclidean — mirroring the reference's metric-aware assignment
    * (reference: Vector/KMeansUtils.cs:70-93).
    * vectors: (id BIGINT, vec ARRAY<FLOAT>). */
  def build(vectors: DataFrame, nlist: Int, metric: String = "L2",
            seed: Long = 42L, maxIter: Int = 10): Index = {
    if (nlist <= 1) {
      // degenerate FLAT index: one inverted list = exact full scan
      // (MLlib KMeans requires k >= 2)
      val spark = vectors.sparkSession
      import spark.implicits._
      val dim = vectors.select(size(col("vec"))).head.getInt(0)
      return Index(
        vectors.withColumn("cluster_id", lit(0)),
        Seq((0, Seq.fill(dim)(0.0f))).toDF("cluster_id", "centroid"))
    }
    val feat = vectors.withColumn("features", array_to_vector(col("vec")))
    val km = new KMeans()
      .setK(nlist)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setDistanceMeasure(if (metric.equalsIgnoreCase("COSINE")) "cosine" else "euclidean")
    val model = km.fit(feat)
    val assigned = model.transform(feat)
      .withColumnRenamed("prediction", "cluster_id")
      .drop("features")
    val spark = vectors.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cluster_id", "centroid")
    Index(assigned, centroids)
  }

  /** Persist the index: cluster-partitioned vectors + centroid table
    * (reference snapshot: IvfFlatVectorIndex.cs:233-298). Reading back and
    * filtering on cluster_id gives partition pruning for free. */
  def save(index: Index, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("cluster_id").parquet(s"$path/vectors")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(
      spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/centroids"))

  /** Probe selection: score each query against all centroids, keep the
    * top-nprobe clusters (reference: IvfFlatVectorIndex.cs:183-198).
    * The top-nprobe aggregation groups on the integer query_id only (never
    * on the float-array qvec — array grouping keys wreck the hash
    * aggregate); qvec is joined back afterwards. */
  def probes(index: Index, queries: DataFrame, metric: String, nprobe: Int): DataFrame = {
    val scored = queries
      .crossJoin(broadcast(index.centroids))
      .select(col("query_id"),
        col("cluster_id").cast("long").as("id"),
        vector_score(metric, col("qvec"), col("centroid")).as("score"))
    TopK.perGroup(scored, Seq("query_id"), nprobe)
      .select(col("query_id"), col("id").cast("int").as("cluster_id"))
      .join(queries, "query_id")
      .select("query_id", "qvec", "cluster_id")
  }

  /** Driver-side probe selection: centroids (nlist rows) and the query
    * batch are both driver-sized by construction — exactly the data the
    * reference holds in memory — so the coarse ranking can skip two Spark
    * jobs and feed the probe set straight into the inverted-list join.
    * Semantically identical to [[probes]] (same scores, same id
    * tie-break). */
  private def probesLocal(index: Index, qs: Array[(Long, Seq[Float])],
                          metric: String, nprobe: Int,
                          spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val cents = index.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val rows = qs.flatMap { case (qid, qv) =>
      cents.headOption.foreach { case (_, cv) =>
        require(qv.length == cv.length,
          s"vector dimension mismatch: ${qv.length} vs ${cv.length}")
      }
      cents.map { case (cid, cv) =>
        val score = metric.toUpperCase match {
          case "L2" =>
            var s = 0.0; var i = 0
            while (i < cv.length) { val d = qv(i).toDouble - cv(i); s += d * d; i += 1 }
            -s
          case "IP" | "INNERPRODUCT" =>
            var s = 0.0; var i = 0
            while (i < cv.length) { s += qv(i).toDouble * cv(i); i += 1 }
            s
          case "COSINE" =>
            var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < cv.length) {
              val x = qv(i).toDouble; val y = cv(i).toDouble
              dp += x * y; na += x * x; nb += y * y; i += 1
            }
            val den = math.sqrt(na) * math.sqrt(nb)
            if (den < 1e-6) 0.0 else dp / den
          case m => throw new IllegalArgumentException(s"unknown metric: $m")
        }
        (qid, cid, score)
      }.sortBy { case (_, cid, s) => (-s, cid.toLong) }
        .take(nprobe)
        .map { case (q, cid, _) => (q, cid, qv) }
    }
    import spark.implicits._
    rows.toSeq.toDF("query_id", "cluster_id", "qvec")
      .select("query_id", "qvec", "cluster_id")
  }

  /** Full IVF search: probe top-nprobe inverted lists, exact-score their
    * members, return global top-k per query. Probe selection runs
    * driver-side when the query batch is driver-sized (one bounded collect
    * decides the path AND supplies the rows), as a distributed plan
    * otherwise. Note the local path materializes probes at call time —
    * the returned DataFrame snapshots them, like the built index itself. */
  def search(index: Index, queries: DataFrame, metric: String,
             k: Int, nprobe: Int, maxLocalQueries: Int = 10000): DataFrame = {
    val probeSet = {
      val sample = queries.select("query_id", "qvec").limit(maxLocalQueries + 1).collect()
      if (sample.length <= maxLocalQueries) {
        val qs = sample.map(r => (r.getLong(0), r.getSeq[Float](1)))
        probesLocal(index, qs, metric, nprobe, queries.sparkSession)
      } else probes(index, queries, metric, nprobe)
    }
    val scored = index.assigned
      .join(broadcast(probeSet), Seq("cluster_id"))
      .select(col("query_id"), col("id"),
        vector_score(metric, col("qvec"), col("vec")).as("score"))
    TopK.perGroup(scored, Seq("query_id"), k)
  }
}
