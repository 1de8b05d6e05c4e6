package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{vector_cosine, VectorSimHash}

/** Embedding-space near-duplicate detection.
  *
  * Two paths:
  *  - [[topPairs]]: exact all-pairs cosine, global top-k — the baseline /
  *    oracle, O(n²); fine for a sampled slice, not the 100 TB path.
  *  - [[lshPairs]]: SimHash-bucketed candidate generation (sign-random-
  *    projection fingerprint cut into equi-width bands) + exact cosine
  *    verify — the scale path: candidates come from equi-joins on band
  *    buckets, so cost tracks the number of true near-dups, not n².
  *
  * Scale parameters (the two knobs that decide whether the candidate set
  * stays sub-quadratic at n = 10⁹):
  *
  *  - Band width. A random (unrelated) pair collides in one b-bit band
  *    with probability ~2⁻ᵇ, so expected random candidates ≈
  *    nBands · n² / 2^(b+1). At the old 4×16-bit default that is
  *    ~6×10⁻⁵·n²/2 — ~3×10¹³ junk pairs at n = 10⁹. The 4×32-bit default
  *    (128-bit fingerprint) puts random collisions at 4·2⁻³² ≈ 10⁻⁹,
  *    i.e. ~5×10⁸ junk pairs at n = 10⁹ — linear-ish in n, verifiable.
  *  - Bucket cap. Band collision probability for a TRUE pair at angle θ
  *    is (1−θ/π)ᵇ per band — but a degenerate dense region (one point
  *    surrounded by thousands of near-copies) makes a single bucket emit
  *    |bucket|²/2 candidates regardless of b. `maxBucketSize` drops
  *    over-dense (band, value) buckets before the self-join — the exact
  *    analog of TextDedup's `maxDocFreq` hub guard — bounding any one
  *    bucket's contribution to cap²/2.
  *
  * Recall bound with the 4×32-bit default: a pair at angle θ survives
  * with P = 1 − (1 − (1−θ/π)³²)⁴. Exact duplicates (θ = 0) share the
  * whole fingerprint and collide in every band — recall 1 regardless of
  * width. At cos τ = 0.999 (θ ≈ 0.0447, bit-flip 1.42%): per-band
  * 0.9858³² ≈ 0.63, P ≈ 0.982. At cos τ = 0.99: P ≈ 0.63. At τ = 0.95:
  * P ≈ 0.12 — the wide-band config targets near-identical embeddings
  * (the dedup regime); for aggressive lower-τ sweeps, narrow the bands
  * (bandBits = 16 restores the old S-curve: P ≈ 0.29 at τ = 0.95) and
  * pay the quadratic-candidate tax on a smaller corpus slice.
  *
  * Recall cost of the cap: a true pair inside a dropped bucket is found
  * only if it also collides in another, under-cap band. A clique of
  * > maxBucketSize EXACT copies over-fills all four of its band buckets
  * and is dropped entirely — by design: exact-copy cliques belong to
  * exact dedup (hash groupBy, [[TextDedup.exact]]-style), which finds
  * them in one shuffle without pair explosion.
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

  /** Near-dup pairs with cosine ≥ tau via SimHash band buckets.
    * Materialized form (localCheckpoint): frees the banded cache as soon
    * as the small verified pair set exists. Local-storage checkpointing
    * trades executor-loss recoverability for not re-running the LSH job on
    * every downstream action — the result is ≤ the true near-dup count, so
    * re-deriving it after a lost executor is the cheap path anyway. */
  def lshPairs(embeddings: DataFrame, tau: Double, seed: Long = 42L,
               bandBits: Int = 32, nBands: Int = 4,
               maxBucketSize: Int = 10000): DataFrame = {
    val (plan, banded) =
      lshPairsPlan(embeddings, tau, seed, bandBits, nBands, maxBucketSize)
    try plan.localCheckpoint()
    finally banded.unpersist()
  }

  /** The un-checkpointed plan (exposed for plan-shape assertions).
    * Only the 3-long-column banded keys are persisted — never the
    * embedding vectors (a ×4-exploded vector cache would rival the corpus
    * size at scale); the exact-cosine verify re-attaches vectors by id to
    * the (small) candidate set. */
  private[graft] def lshPairsPlan(embeddings: DataFrame, tau: Double,
                                  seed: Long, bandBits: Int = 32,
                                  nBands: Int = 4,
                                  maxBucketSize: Int = 10000): (DataFrame, DataFrame) = {
    require(bandBits == 8 || bandBits == 16 || bandBits == 32 || bandBits == 64,
      s"bandBits must divide a 64-bit word: $bandBits")
    val widthBits = bandBits * nBands
    require(widthBits >= bandBits && widthBits <= 128,
      s"fingerprint width $widthBits out of range (supported: ≤ 128 bits)")
    require(maxBucketSize >= 2, s"maxBucketSize too small: $maxBucketSize")
    // fingerprint words: independent 64-bit sign-random-projection hashes
    // (seed, seed+1, …) concatenated to the requested width
    val nWords = (widthBits + 63) / 64
    val words = array((0 until nWords).map(w =>
      VectorSimHash.simhashCol(col("embedding"), seed + w)): _*)
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val bandsPerWord = 64 / bandBits
    val banded = embeddings.select(col("vec_id"), words.as("words"))
      .select(col("vec_id"), col("words"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bh",
        expr(s"shiftrightunsigned(element_at(words, int(band div $bandsPerWord) + 1)," +
          s" (band % $bandsPerWord) * $bandBits)")
          .bitwiseAND(lit(mask)))
      .select("vec_id", "band", "bh")
      .persist()
    // hub guard: drop over-dense (band, bh) buckets BEFORE the self-join
    // so one degenerate embedding region can't emit |bucket|²/2 pairs —
    // the maxDocFreq analog (TextDedup). Left-semi against the small
    // under-cap key set; AQE broadcasts it when it fits.
    val keptKeys = banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .select("band", "bh")
    val kept = banded.join(keptKeys, Seq("band", "bh"), "left_semi")
    val a = kept.as("a"); val b = kept.as("b")
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
