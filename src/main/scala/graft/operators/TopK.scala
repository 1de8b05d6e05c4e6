package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One search hit: vector row id + metric-aware score (higher is better).
  * Mirrors the reference's `SearchResult`
  * (reference: src/Pyrope.GarnetServer/Vector/IVectorIndex.cs:12). */
case class ScoredId(id: Long, score: Double)

/** Bounded top-k-by-score aggregate — the Spark-native version of the
  * reference's bounded min-heap
  * (reference: src/Pyrope.GarnetServer/Vector/BruteForceVectorIndex.cs:291-359).
  *
  * Why an `Aggregator` and not a window: `row_number() over (partition by
  * query)` shuffles EVERY scored candidate row; at 100 TB that is the whole
  * scored cross product. A typed aggregate gets map-side partial
  * aggregation, so each task ships at most k rows per query to the shuffle.
  *
  * Determinism: ties broken by ascending id, so results are stable across
  * partitionings and match a `ORDER BY score DESC, id` SQL oracle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Seq[ScoredId]] {

  // Keep the buffer a few multiples of k and compact by sorting; amortized
  // O(n log k)-ish without a heap object that resists serialization.
  private val cap = math.max(4 * k, 64)

  private def compact(buf: ArrayBuffer[ScoredId], n: Int): ArrayBuffer[ScoredId] = {
    if (buf.length > n) {
      val best = buf.sortBy(h => (-h.score, h.id)).take(n)
      buf.clear()
      buf ++= best
    }
    buf
  }

  override def zero: ArrayBuffer[ScoredId] = new ArrayBuffer[ScoredId](k)

  override def reduce(buf: ArrayBuffer[ScoredId], in: ScoredId): ArrayBuffer[ScoredId] = {
    buf += in
    if (buf.length >= cap) compact(buf, k) else buf
  }

  override def merge(a: ArrayBuffer[ScoredId], b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = {
    a ++= b
    if (a.length >= cap) compact(a, k) else a
  }

  override def finish(buf: ArrayBuffer[ScoredId]): Seq[ScoredId] =
    compact(buf, k).sortBy(h => (-h.score, h.id)).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] =
    Encoders.kryo[ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {

  /** Aggregate column producing the top-k (id, score) hits — the native
    * [[TopKHits]] imperative aggregate (primitive buffers, no encoder /
    * kryo per-row cost). */
  def topkCol(k: Int, id: Column, score: Column): Column =
    graft.functions.mkCol(
      TopKHits(graft.functions.mkExpr(id), graft.functions.mkExpr(score), k)
        .toAggregateExpression())

  /** The typed-Aggregator form — kept as a cross-check for tests. */
  def topkColUdaf(k: Int, id: Column, score: Column): Column =
    udaf(new TopKAggregator(k)).apply(id, score)

  /** From scored candidates `(groupCols..., id, score)` to ranked hits
    * `(groupCols..., rank, id, score)` — the reference's sort-desc-take-k
    * (reference: src/Pyrope.GarnetServer/Vector/BruteForceVectorIndex.cs:370-373). */
  def perGroup(scored: DataFrame, groupCols: Seq[String], k: Int,
               idCol: String = "id", scoreCol: String = "score"): DataFrame = {
    scored
      .groupBy(groupCols.map(scored.col): _*)
      .agg(topkCol(k, col(idCol), col(scoreCol)).as("hits"))
      .select(groupCols.map(col) :+ posexplode(col("hits")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.score").as(scoreCol)): _*)
  }
}
