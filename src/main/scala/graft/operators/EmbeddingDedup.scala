package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{vector_cosine, VectorSimHash}

/** Embedding-space near-duplicate detection.
  *
  * Two paths:
  *  - [[topPairs]]: exact all-pairs cosine, global top-k — the baseline /
  *    oracle, O(n²); fine for a sampled slice, not the 100 TB path.
  *  - [[lshPairs]]: SimHash-bucketed candidate generation (16-bit bands of
  *    a 64-bit sign-random-projection fingerprint) + exact cosine verify —
  *    the scale path: candidates come from equi-joins on band buckets, so
  *    cost tracks the number of true near-dups, not n².
  */
object EmbeddingDedup {

  /** Exact top-k most-similar pairs (id1 < id2) by cosine. */
  def topPairs(embeddings: DataFrame, k: Int): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = embeddings.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), vector_cosine(col("v1"), col("v2")).as("cosine"))
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** Near-dup pairs with cosine ≥ tau via SimHash band buckets. */
  def lshPairs(embeddings: DataFrame, tau: Double, seed: Long = 42L): DataFrame = {
    val fp = embeddings.select(col("vec_id"), col("embedding"),
      VectorSimHash.simhashCol(col("embedding"), seed).as("simhash"))
    val banded = fp.select(col("vec_id"), col("embedding"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", expr("shiftrightunsigned(simhash, band * 16)")
        .bitwiseAND(lit(0xffffL)))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.embedding").as("v1"), col("b.embedding").as("v2"))
      .dropDuplicates("id1", "id2")
      .withColumn("cosine", vector_cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= tau)
      .select("id1", "id2", "cosine")
  }
}
