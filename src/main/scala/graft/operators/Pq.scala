package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization + asymmetric-distance (ADC) search.
  *
  * Capability mirror of the reference's ProductQuantizer / IvfPqVectorIndex
  * (reference: src/Pyrope.GarnetServer/Vector/ProductQuantizer.cs:16-136,
  * Vector/IvfPqVectorIndex.cs:55-198), Spark-first:
  *
  *  - Train: the vector is split into M subspaces; each subspace gets its
  *    own KMeans codebook (K ≤ 256) — M small MLlib fits, parallel inside
  *    each fit (the reference parallelizes across subspaces instead).
  *  - Encode: nearest sub-centroid per subspace → one byte per subspace
  *    (32× compression at dim 64 / M 8 vs float32).
  *  - Search (ADC): per query, a M×K table of L2 distances from the query's
  *    subvectors to every sub-centroid is precomputed and broadcast; each
  *    candidate's score is -Σ table[m][code[m]] — a pure table-lookup scan,
  *    no float math per element.
  */
object Pq {

  /** codebooks(m)(k) = sub-centroid (length dsub). */
  case class Codebook(m: Int, dsub: Int, k: Int,
                      codebooks: Array[Array[Array[Float]]]) extends Serializable

  /** Train per-subspace codebooks on (id, vec).
    *
    * All M subspaces train TOGETHER in one batched Lloyd's loop over an
    * exploded (m, subvec) table — one assignment job + one centroid-update
    * job per iteration for every subspace at once, instead of M sequential
    * MLlib fits (whose per-fit driver overhead dominates; the reference
    * instead parallelizes across subspaces with threads,
    * ProductQuantizer.cs:35-58). Deterministic: init picks the k
    * hash-smallest subvectors per subspace; empty clusters keep their
    * previous centroid. */
  def train(vectors: DataFrame, m: Int, k: Int, seed: Long = 42L,
            maxIter: Int = 10, vecCol: String = "vec"): Codebook = {
    val spark = vectors.sparkSession
    val dim = vectors.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val dsub = dim / m

    // (m, subvec) exploded table — cached, it drives every iteration
    val sub = vectors.select(posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          mi => slice(col(vecCol), mi * dsub + 1, lit(dsub)))))
      .select(col("pos").as("m"), col("col").as("subvec"))
      .cache()

    // deterministic init: k hash-smallest subvectors per subspace
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("m")
      .orderBy(xxhash64(col("m"), col("subvec"), lit(seed)))
    val init = sub.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("m", "rn", "subvec").collect()
    val cbs = Array.fill(m, k)(new Array[Float](dsub))
    init.foreach { r =>
      cbs(r.getInt(0))(r.getInt(1) - 1) = r.getSeq[Float](2).toArray
    }

    var iter = 0
    while (iter < maxIter) {
      val bc = spark.sparkContext.broadcast(cbs)
      val assign = udf { (mi: Int, v: Seq[Float]) =>
        val cb = bc.value(mi)
        var best = 0; var bestD = Double.MaxValue
        var ki = 0
        while (ki < cb.length) {
          var d = 0.0; var i = 0
          while (i < v.length) {
            val diff = v(i).toDouble - cb(ki)(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = ki }
          ki += 1
        }
        best
      }
      // centroid update: per-dimension means via one aggregation over
      // (m, code, dim) — all subspaces in a single job
      val updated = sub
        .withColumn("code", assign(col("m"), col("subvec")))
        .select(col("m"), col("code"), posexplode(col("subvec")))
        .groupBy("m", "code", "pos")
        .agg(avg("col").as("mean"))
        .collect()
      updated.foreach { r =>
        cbs(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
      }
      bc.destroy()
      iter += 1
    }
    sub.unpersist()
    Codebook(m, dsub, k, cbs)
  }

  private def encodeOne(v: Seq[Float], cb: Codebook): Array[Byte] = {
    val out = new Array[Byte](cb.m)
    var mi = 0
    while (mi < cb.m) {
      var best = 0; var bestD = Double.MaxValue
      var ki = 0
      while (ki < cb.codebooks(mi).length) {
        val c = cb.codebooks(mi)(ki)
        var d = 0.0; var i = 0
        while (i < cb.dsub) {
          val diff = v(mi * cb.dsub + i).toDouble - c(i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Encode vectors → `codes BINARY` (one byte per subspace)
    * (reference: ProductQuantizer.cs:60-80). */
  def encode(vectors: DataFrame, cb: Codebook, vecCol: String = "vec"): DataFrame = {
    val enc = udf((v: Seq[Float]) => encodeOne(v, cb))
    vectors.withColumn("codes", enc(col(vecCol)))
  }

  /** Decode codes back to the reconstructed vector
    * (reference: ProductQuantizer.cs:82-96). */
  def decode(df: DataFrame, cb: Codebook, codesCol: String = "codes"): DataFrame = {
    val dec = udf { (codes: Array[Byte]) =>
      val out = new Array[Float](cb.m * cb.dsub)
      var mi = 0
      while (mi < cb.m) {
        val c = cb.codebooks(mi)(codes(mi) & 0xff)
        System.arraycopy(c, 0, out, mi * cb.dsub, cb.dsub)
        mi += 1
      }
      out.toSeq
    }
    df.withColumn("decoded", dec(col(codesCol)))
  }

  /** ADC distance table for one query vector: table(m)(k) = L2² between the
    * query's m-th subvector and sub-centroid k
    * (reference: ProductQuantizer.cs:98-120). */
  private[operators] def adcTableFor(q: Seq[Float], cb: Codebook): Array[Array[Double]] =
    adcTable(q, cb)

  private def adcTable(q: Seq[Float], cb: Codebook): Array[Array[Double]] = {
    Array.tabulate(cb.m) { mi =>
      Array.tabulate(cb.codebooks(mi).length) { ki =>
        val c = cb.codebooks(mi)(ki)
        var d = 0.0; var i = 0
        while (i < cb.dsub) {
          val diff = q(mi * cb.dsub + i).toDouble - c(i)
          d += diff * diff; i += 1
        }
        d
      }
    }
  }

  /** Brute-force PQ search over encoded vectors: score = -Σ table lookups
    * (reference scoring: IvfPqVectorIndex.cs:159-198). The per-query ADC
    * tables (nq × M × K doubles — tiny) are broadcast to executors. */
  def knn(encoded: DataFrame, queries: DataFrame, cb: Codebook, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val qRows = queries.select("query_id", "qvec").collect()
      .map(r => r.getLong(0) -> adcTable(r.getSeq[Float](1), cb)).toMap
    val tables = spark.sparkContext.broadcast(qRows)
    val score = udf { (queryId: Long, codes: Array[Byte]) =>
      val t = tables.value(queryId)
      var s = 0.0; var mi = 0
      while (mi < codes.length) { s += t(mi)(codes(mi) & 0xff); mi += 1 }
      -s
    }
    import spark.implicits._
    val qIds = qRows.keys.toSeq.toDF("query_id")
    val scored = encoded
      .crossJoin(broadcast(qIds))
      .select(col("query_id"), col("id"), score(col("query_id"), col("codes")).as("score"))
    TopK.perGroup(scored, Seq("query_id"), k)
  }

  /** ADC candidate generation + exact rerank: fetch top-(k·refine) by ADC,
    * re-score those candidates against the true vectors, return top-k.
    * PQ codes are a coarse sieve — quantization error rivals true neighbor
    * gaps on clustered data — so production search refines; the candidate
    * fetch is the cheap full scan, the rerank touches only k·refine·nq rows. */
  def knnRefined(encoded: DataFrame, vectors: DataFrame, queries: DataFrame,
                 cb: Codebook, k: Int, refine: Int = 10,
                 metric: String = "L2"): DataFrame = {
    val candidates = knn(encoded, queries, cb, k * refine)
      .select("query_id", "id")
    rerank(candidates, vectors, queries, k, metric)
  }

  /** Exact rerank of a small (query_id, id) candidate set. */
  private[operators] def rerank(candidates: DataFrame, vectors: DataFrame,
                                queries: DataFrame, k: Int, metric: String): DataFrame = {
    val rescored = candidates
      .join(vectors, "id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("id"),
        graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
    TopK.perGroup(rescored, Seq("query_id"), k)
  }
}
