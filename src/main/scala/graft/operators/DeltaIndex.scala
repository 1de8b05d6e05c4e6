package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LSM-style head/tail freshness semantics.
  *
  * Capability mirror of the reference's DeltaVectorIndex
  * (reference: src/Pyrope.GarnetServer/Vector/DeltaVectorIndex.cs:76-158):
  * fresh writes land in a small mutable "head", the bulk lives in a built
  * "tail" index; every search consults both and merges per-id with the head
  * winning; Build compacts head into tail.
  */
object DeltaIndex {

  /** Merge per-query hit lists, head wins on id collision, re-rank, top-k
    * (reference: DeltaVectorIndex.cs:76-122 — dedup union then sort desc). */
  def mergeHits(headHits: DataFrame, tailHits: DataFrame, k: Int): DataFrame = {
    val unioned = headHits.select("query_id", "id", "score").withColumn("pri", lit(0))
      .unionByName(tailHits.select("query_id", "id", "score").withColumn("pri", lit(1)))
    val w = Window.partitionBy("query_id", "id").orderBy(col("pri"))
    val deduped = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("query_id", "id", "score")
    TopK.perGroup(deduped, Seq("query_id"), k)
  }

  /** Current-state resolution for an append-only record log: latest write
    * per id wins, tombstones drop the id entirely
    * (reference upsert/delete: Services/VectorStore.cs:23-58; SURVEY §1.5).
    * records: (..., id, updated_at-comparable ordCol, deleted BOOLEAN). */
  def currentState(records: DataFrame, keyCols: Seq[String], ordCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol).desc)
    records
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .filter(!col("deleted"))
  }

  /** Search head (exact brute force) + tail (IVF) and merge head-wins. */
  def search(head: DataFrame, tail: IvfFlat.Index, queries: DataFrame,
             metric: String, k: Int, nprobe: Int): DataFrame = {
    val headHits = BruteForceKnn.knn(head, queries, metric, k)
    val tailHits = IvfFlat.search(tail, queries, metric, k, nprobe)
    mergeHits(headHits, tailHits, k)
  }

  /** Compaction: fold head rows into the tail table and rebuild
    * (reference Build: DeltaVectorIndex.cs:124-158). Head rows override
    * same-id tail rows (last-write-wins). */
  def compact(head: DataFrame, tailVectors: DataFrame, nlist: Int,
              metric: String = "L2", seed: Long = 42L): IvfFlat.Index = {
    val all = head.select("id", "vec").withColumn("pri", lit(0))
      .unionByName(tailVectors.select("id", "vec").withColumn("pri", lit(1)))
    val w = Window.partitionBy("id").orderBy(col("pri"))
    val merged = all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("id", "vec")
    IvfFlat.build(merged, nlist, metric, seed)
  }
}
