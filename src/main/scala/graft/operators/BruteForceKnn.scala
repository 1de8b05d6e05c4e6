package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.vector_score

/** Exact brute-force top-k nearest-neighbor search as a DataFrame plan.
  *
  * Capability mirror of the reference's flat scan index
  * (reference: src/Pyrope.GarnetServer/Vector/BruteForceVectorIndex.cs:275-379),
  * re-shaped for Spark: the per-query loop becomes a broadcast
  * nested-loop join of the (small) query batch against the (huge) vector
  * table, scored by a codegen'd expression, reduced by a map-side bounded
  * top-k aggregate. The big table is never shuffled — only ≤ k rows per
  * (query, input partition) reach the exchange.
  */
object BruteForceKnn {

  /** vectors: (id BIGINT, vec ARRAY<FLOAT>), queries: (query_id BIGINT,
    * qvec ARRAY<FLOAT>) → (query_id, rank, id, score).
    *
    * `repartitionTo` (> 0) redistributes the vector side before scoring —
    * needed when the input is a handful of small files whose row groups
    * can't be split (a local-bench artifact); at cluster scale the file
    * count itself provides parallelism and the knob should stay 0 (no
    * shuffle of the big side). */
  /** `maxScans` (> 0) caps scored candidates per query — the reference's
    * scan-budget ceiling (F6, BruteForceVectorIndex.cs:288-344). The
    * reference truncates its insertion-order scan; the deterministic
    * distributed analog keeps the maxScans hash-smallest ids per query
    * (documented divergence, COVERAGE.md). The cap is a pre-scoring filter
    * on the id hash — no window/shuffle of the big side. */
  def knn(vectors: DataFrame, queries: DataFrame, metric: String, k: Int,
          repartitionTo: Int = 0, maxScans: Int = 0): DataFrame = {
    val vs0 = if (repartitionTo > 0) vectors.repartition(repartitionTo) else vectors
    val vs =
      if (maxScans <= 0) vs0
      else {
        // candidate set is query-independent here (no per-query filter), so
        // the hash-smallest-N cap can be applied ONCE to the vector side
        // before the join instead of per (query, id) pair — same semantics,
        // one bounded top-k instead of a giant window
        val capped = vs0
          .select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(maxScans)
        capped.select("id", "vec")
      }
    val scored = vs
      .crossJoin(broadcast(queries))
      .select(
        col("query_id"),
        col("id"),
        vector_score(metric, col("qvec"), col("vec")).as("score"))
    TopK.perGroup(scored, Seq("query_id"), k)
  }

  /** Tag-filtered variant: conjunctive all-of tag semantics
    * (reference: src/Pyrope.GarnetServer/Extensions/VectorCommandSet.cs:802-824 —
    * empty filter passes everything; a record must contain every filter tag).
    * Unlike the reference (which filters AFTER top-k and can return < k
    * hits), we filter before ranking — strictly better recall; the
    * divergence is deliberate and documented in SURVEY §4.1.
    * vectors additionally carries `tags ARRAY<STRING>`; queries carries
    * `filter_tags ARRAY<STRING>`. */
  def knnFiltered(vectors: DataFrame, queries: DataFrame, metric: String, k: Int): DataFrame = {
    val scored = vectors
      .crossJoin(broadcast(queries))
      .filter(
        // NULL filter_tags means "no filter" (pass everything), like an
        // absent FILTER clause in the reference — not "match nothing"
        coalesce(size(col("filter_tags")), lit(0)) === 0 ||
          forall(col("filter_tags"), t => array_contains(col("tags"), t)))
      .select(
        col("query_id"),
        col("id"),
        vector_score(metric, col("qvec"), col("vec")).as("score"))
    TopK.perGroup(scored, Seq("query_id"), k)
  }
}
