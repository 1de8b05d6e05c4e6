package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH-vs-exact oracle for embedding near-dup detection: the banded
  * SimHash path ([[EmbeddingDedup.lshPairs]] — the 100-TB plan) must
  * recover the planted near-duplicate pairs that the exact O(n²) path
  * ([[EmbeddingDedup.topPairs]] — the oracle) finds. */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val nBase = 300
  private val nDups = 20
  private val tau = 0.95

  // base vectors well-spread + planted near-dups (tiny perturbation of a
  // base vector → cosine ≈ 0.999, far above tau)
  private lazy val embeddings = {
    val rng = new Random(7)
    val base = (0 until nBase).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() * 2 - 1).toSeq)
    }
    val dups = (0 until nDups).map { j =>
      val (srcId, v) = base(j * 3)
      ((nBase + j).toLong, v.map(x => x + (rng.nextFloat() - 0.5f) * 0.01f))
    }
    (base ++ dups).toDF("vec_id", "embedding").cache()
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactPairs = {
    // exact threshold pairs from the all-pairs oracle
    val a = embeddings.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = embeddings.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    pairSet(a.join(b, col("id1") < col("id2"))
      .withColumn("cosine", graft.functions.vector_cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= tau))
  }

  test("planted near-dups exist and exact path finds them all") {
    assert(exactPairs.size >= nDups, s"fixture too weak: ${exactPairs.size}")
    (0 until nDups).foreach { j =>
      val p = ((j * 3).toLong, (nBase + j).toLong)
      assert(exactPairs.contains(p), s"planted pair $p missing from exact")
    }
  }

  test("lshPairs: full recall of planted near-dups, no false positives vs tau") {
    val got = EmbeddingDedup.lshPairs(embeddings, tau)
    val gotPairs = pairSet(got)
    // precision is structural (exact cosine verify after candidate gen)
    assert(gotPairs.subsetOf(exactPairs), "LSH returned a below-threshold pair")
    // recall on the planted dups: perturbation is tiny → (nearly) all 128
    // fingerprint bits agree with the source → at least one of the 4
    // 32-bit bands collides (deterministic under the fixed seeds)
    (0 until nDups).foreach { j =>
      val p = ((j * 3).toLong, (nBase + j).toLong)
      assert(gotPairs.contains(p), s"LSH missed planted pair $p")
    }
  }

  test("lshPairs: narrow-band legacy config (4x16 of 64 bits) still works") {
    val got = pairSet(EmbeddingDedup.lshPairs(embeddings, tau,
      bandBits = 16, nBands = 4))
    assert(got.subsetOf(exactPairs))
    (0 until nDups).foreach { j =>
      val p = ((j * 3).toLong, (nBase + j).toLong)
      assert(got.contains(p), s"16-bit-band LSH missed planted pair $p")
    }
  }

  test("maxBucketSize caps a degenerate clique's quadratic bucket; other pairs unaffected") {
    // 60 EXACT copies of one vector (a degenerate dense region: every
    // band bucket holds all 60) + one small planted pair elsewhere
    val rng = new Random(11)
    val cliqueV = Array.fill(dim)(rng.nextFloat() * 2 - 1).toSeq
    val pairV = Array.fill(dim)(rng.nextFloat() * 2 - 1).toSeq
    val clique = (0 until 60).map(i => (i.toLong, cliqueV))
    val pair = Seq((1000L, pairV), (1001L, pairV.map(x => x + 0.001f)))
    val df = (clique ++ pair).toDF("vec_id", "embedding").cache()

    // uncapped: the clique emits all 60·59/2 pairs
    val uncapped = pairSet(EmbeddingDedup.lshPairs(df, tau, maxBucketSize = 10000))
    assert(uncapped.count { case (a, b) => a < 60 && b < 60 } == 60 * 59 / 2)
    assert(uncapped.contains((1000L, 1001L)))

    // capped at 10: all four clique buckets hold 60 > 10 → dropped whole
    // (exact-copy cliques are exact-dedup's job — hash groupBy, no pair
    // explosion); the unrelated small pair's buckets are under cap
    val capped = pairSet(EmbeddingDedup.lshPairs(df, tau, maxBucketSize = 10))
    assert(capped.count { case (a, b) => a < 60 && b < 60 } == 0,
      "over-cap clique bucket must be dropped")
    assert(capped.contains((1000L, 1001L)), "under-cap pair must survive the hub guard")
    df.unpersist()
  }

  test("topPairs ranks the planted dups first") {
    val top = EmbeddingDedup.topPairs(embeddings, nDups)
    assert(top.count() == nDups)
    val topPairsSet = pairSet(top)
    val planted = (0 until nDups).map(j => ((j * 3).toLong, (nBase + j).toLong)).toSet
    assert(topPairsSet == planted)
  }
}
