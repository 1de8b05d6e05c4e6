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
    // recall on the planted dups: perturbation is tiny → all 64 simhash
    // bits agree with the source → all 4 bands collide → guaranteed found
    (0 until nDups).foreach { j =>
      val p = ((j * 3).toLong, (nBase + j).toLong)
      assert(gotPairs.contains(p), s"LSH missed planted pair $p")
    }
  }

  test("topPairs ranks the planted dups first") {
    val top = EmbeddingDedup.topPairs(embeddings, nDups)
    assert(top.count() == nDups)
    val topPairsSet = pairSet(top)
    val planted = (0 until nDups).map(j => ((j * 3).toLong, (nBase + j).toLong)).toSet
    assert(topPairsSet == planted)
  }
}
