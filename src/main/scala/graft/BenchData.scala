package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, expression-only synthetic corpora for the dedup scale rungs —
  * shared by [[Bench]] and the standalone rung/profiler mains so the
  * graded rung, the iteration harness, and the stage profiler can never
  * silently diverge onto different corpora. Everything derives from
  * multi-arg xxhash64 over (tag, key, position), so the planted answers
  * are deterministic across runs, machines, and partitionings — each
  * rung asserts them exactly and is its own correctness gate.
  *
  * NOTE on hashing keys: the per-token hash MUST be multi-arg
  * (`xxhash64(lit(tag), src, i)`), never an arithmetic key like
  * `xxhash64(src*K + i)` — the arithmetic form hands consecutive doc
  * ids SHIFTED copies of one token stream, chaining the whole corpus
  * into a single near-dup component (found the hard way in r8: kept=2
  * instead of 88,501 at the 100k trial).
  */
object BenchData {

  /** Documents with planted duplication, scaled by `nDocs` (regions
    * match the graded 1M rung exactly at nDocs = 1,000,000):
    *   [0, 1% )        ONE giant near-dup cluster of doc 0 (2% token
    *                   mutation) — the Θ(bands·c²) hazard star edges
    *                   exist for
    *   [1%, 11%)       near-dup clusters of 5 (2% mutation)
    *   [11%, 16%)      exact-dup clusters of 2
    *   [16%, 26%)      unique docs behind a shared 10-token hub span
    *                   (the span-dedup / collision-bucket case)
    *   [26%, 100%)     unique
    * 120 tokens/doc over a 500k vocabulary. */
  def plantedDocs(spark: SparkSession, nDocs: Long): DataFrame = {
    val docLen = 120
    val vocab = 500000
    val sc = nDocs / 1000000.0
    val giantEnd = (10000 * sc).toLong.max(10)
    val nearEnd = giantEnd + (100000 * sc).toLong
    val exactEnd = nearEnd + (50000 * sc).toLong
    val hubEnd = exactEnd + (100000 * sc).toLong
    val srcCol = when(col("doc_id") < giantEnd, lit(0L))
      .when(col("doc_id") < nearEnd,
        (floor((col("doc_id") - giantEnd) / 5) * 5 + giantEnd).cast("long"))
      .when(col("doc_id") < exactEnd,
        (floor((col("doc_id") - nearEnd) / 2) * 2 + nearEnd).cast("long"))
      .otherwise(col("doc_id"))
    val hub = (0 until 10).map(i => s"hub$i").mkString(" ")
    val toksCol = transform(sequence(lit(0), lit(docLen - 1)), i =>
      when(col("mut") &&
          pmod(xxhash64(lit("sel"), col("doc_id"), i), lit(50)) === 0,
        concat(lit("m"), pmod(xxhash64(lit("mut"), col("doc_id"), i), lit(1L << 40))))
        .otherwise(
          concat(lit("w"), pmod(xxhash64(lit("tok"), col("src"), i), lit(vocab)))))
    spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("src", srcCol)
      .withColumn("mut",
        col("doc_id") < nearEnd && col("doc_id") =!= col("src"))
      .withColumn("body", concat_ws(" ", toksCol))
      .withColumn("text",
        when(col("doc_id") >= exactEnd && col("doc_id") < hubEnd,
          concat(lit(hub + " "), col("body"))).otherwise(col("body")))
      .select("doc_id", "text")
  }

  /** Embeddings with planted near-dup structure, dim 64 (regions are
    * FIXED counts, not scaled — the rung requires nVecs > 100k):
    *   [0, 50k)    10k near-dup clusters of 5 (ε = 0.03 ⇒ pair cosine
    *               ≈ 0.999)
    *   [50k, 60k)  5k exact-dup pairs (identical fingerprints)
    *   [60k, 80k)  ONE dense region of 20k near-copies (ε = 0.003) —
    *               the maxBucketSize hub-guard case
    *   [80k, n)    unique */
  def plantedEmbeddings(spark: SparkSession, nVecs: Long): DataFrame = {
    require(nVecs > 100000L, s"rung layout needs n > 100k, got $nVecs")
    val dim = 64
    val srcE = when(col("vec_id") < 50000L,
        (floor(col("vec_id") / 5) * 5).cast("long"))
      .when(col("vec_id") < 60000L,
        (floor((col("vec_id") - 50000L) / 2) * 2 + 50000L).cast("long"))
      .when(col("vec_id") < 80000L, lit(60000L))
      .otherwise(col("vec_id"))
    val epsE = when(col("vec_id") === col("src"), lit(0.0))
      .when(col("vec_id") < 50000L, lit(0.03))
      .when(col("vec_id") < 60000L, lit(0.0))
      .otherwise(lit(0.003))
    def u(tag: String, kc: org.apache.spark.sql.Column,
          i: org.apache.spark.sql.Column) =
      xxhash64(lit(tag), kc, i).cast("double") / lit(Long.MaxValue.toDouble)
    val vecE = transform(sequence(lit(0), lit(dim - 1)), i =>
      (u("base", col("src"), i) + col("eps") * u("noise", col("vec_id"), i))
        .cast("float"))
    spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("src", srcE)
      .withColumn("eps", epsE)
      .select(col("vec_id"), vecE.as("embedding"))
  }
}
