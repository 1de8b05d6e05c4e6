package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: per-stratum quotas
  * (so a 100-TB crawl can be down-mixed to "at most N documents per
  * source/language") with selection that is a pure function of
  * (seed, id) — reproducible across runs, partitionings, and engines,
  * unlike `DataFrame.sample`'s partition-dependent RNG draw.
  *
  * Scale shape: selection runs through the bounded top-k aggregate
  * ([[TopKHits]]), so each task ships at most n rows per stratum into the
  * shuffle (map-side partial aggregation). The naive
  * `row_number() over (partition by stratum order by hash)` alternative
  * shuffles and sorts the ENTIRE corpus and serializes a hot stratum
  * through one task — exactly the skew this engine's top-k path exists to
  * avoid.
  */
object Sampling {

  /** Exactly `min(n, |stratum|)` rows per stratum, ranked by the seeded
    * content hash: ascending (13-hex-char md5 prefix of "seed:id", id).
    * 13 hex chars = 52 bits, exactly representable in the aggregate's
    * Double score, so the rank order is bit-stable; the same order is
    * SQL-expressible (`substring(md5(seed || ':' || id), 1, 13)`), which
    * is what makes the operator engine-checkable.
    *
    * Output: (stratumCol, rank, idCol) with rank 1..n per stratum.
    */
  def stratified(docs: DataFrame, stratumCol: String, idCol: String,
                 n: Int, seed: Long = 42L): DataFrame = {
    // the top-k aggregate carries (BIGINT id, DOUBLE score) — a
    // non-integral id column would fail analysis with an opaque type
    // error deep in the plan; state the contract at the call boundary
    // (callers with string ids map through a surrogate, e.g. xxhash64,
    // and join back — the engine's id-pool pattern)
    require({
      import org.apache.spark.sql.types._
      Set[DataType](LongType, IntegerType, ShortType, ByteType)
        .contains(docs.schema(idCol).dataType)
    },
      s"stratified requires an integral id column; '$idCol' is " +
        s"${docs.schema(idCol).dataType.simpleString} — hash it to a " +
        "surrogate (xxhash64) and join back, or cast")
    val key = substring(
      md5(concat_ws(":", lit(seed).cast("string"),
        col(idCol).cast("string"))), 1, 13)
    // ascending hash == descending score for the top-k aggregate
    val scored = docs.select(col(stratumCol), col(idCol).as("id"),
      (-conv(key, 16, 10).cast("double")).as("score"))
    TopK.perGroup(scored, Seq(stratumCol), n)
      .select(col(stratumCol), col("rank"), col("id").as(idCol))
  }
}
