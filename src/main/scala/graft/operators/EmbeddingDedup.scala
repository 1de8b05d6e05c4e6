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

  /** Near-dup pairs with cosine ≥ tau via SimHash band buckets. The banded
    * fingerprint table is persisted across the self-join branches (the
    * projection UDF would otherwise run twice per row) and released once
    * the (small) verified pair set is materialized. */
  /** Materialized form (localCheckpoint): frees the banded cache as soon
    * as the small verified pair set exists. Local-storage checkpointing
    * trades executor-loss recoverability for not re-running the LSH job on
    * every downstream action — the result is ≤ the true near-dup count, so
    * re-deriving it after a lost executor is the cheap path anyway. */
  def lshPairs(embeddings: DataFrame, tau: Double, seed: Long = 42L): DataFrame = {
    val (plan, banded) = lshPairsPlan(embeddings, tau, seed)
    try plan.localCheckpoint()
    finally banded.unpersist()
  }

  /** The un-checkpointed plan (exposed for plan-shape assertions).
    * Only the 3-long-column banded keys are persisted — never the
    * embedding vectors (a ×4-exploded vector cache would rival the corpus
    * size at scale); the exact-cosine verify re-attaches vectors by id to
    * the (small) candidate set. */
  private[graft] def lshPairsPlan(embeddings: DataFrame, tau: Double,
                                  seed: Long): (DataFrame, DataFrame) = {
    val banded = embeddings.select(col("vec_id"),
        VectorSimHash.simhashCol(col("embedding"), seed).as("simhash"))
      .select(col("vec_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", expr("shiftrightunsigned(simhash, band * 16)")
        .bitwiseAND(lit(0xffffL)))
      .select("vec_id", "band", "bh")
      .persist()
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      .distinct()
    val v1 = embeddings.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val v2 = embeddings.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val result = candidates
      .join(v1, "id1").join(v2, "id2")
      .withColumn("cosine", vector_cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= tau)
      .select("id1", "id2", "cosine")
    (result, banded)
  }
}
