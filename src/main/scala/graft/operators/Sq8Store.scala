package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-resident SQ8 (uint8) copy of a snapshot's RAW vectors, keyed by
  * sorted surrogate id — the zero-job rerank store behind the refined PQ
  * serving tier.
  *
  * Why it exists: at the 10M rung the raw floats (5.1 GB) are past any
  * driver residency budget, so the resident tier serves raw-ADC answers
  * whose recall on hard data is the price of 64× compression (the bench
  * gauge reads 0.156 @ M=8). The designed answer is the classic refine
  * step — re-score the top k·refine ADC candidates against (near-)exact
  * vectors. A per-call Spark job against the snapshot would re-impose the
  * scheduler floor the resident tier exists to avoid; SQ8 at 4× compression
  * (dim bytes/vec — 1.28 GB at 10M×128) fits a budget raw floats cannot,
  * and re-scoring ≤ k·refine DEQUANTIZED vectors driver-side costs ~µs.
  * The reference's own SQ8 trade (ScalarQuantizer.cs:8-85) applied to the
  * rerank stage instead of the scan.
  *
  * Quantization is [[ScalarQuant]]'s global min/max affine map; the
  * dequantization arithmetic here is the bit-exact driver twin of
  * `ScalarQuant.decodeCol` ((mn + code·delta).toFloat, delta computed in
  * Double), so the plan-side sq8 refine mode and this store score
  * IDENTICAL floats — tier parity is exact, spec-pinned.
  *
  * Layout: one sorted surrogate array + one flat code blob (row r's codes
  * at r·dim). Built from per-partition PRE-SORTED runs merged on the
  * driver (k-way, same discipline as [[graft.IdPool]]) — transient
  * footprint equals the final store, never n boxed rows.
  */
final class Sq8Store(val ids: Array[Long], val codes: Array[Byte],
                     val dim: Int, val mn: Float, val mx: Float)
  extends Serializable {

  val delta: Double = if (mx > mn) (mx - mn) / 255.0 else 0.0

  /** Resident bytes (for the engine's residency registry). */
  val bytes: Long = ids.length * 8L + codes.length.toLong + 64L

  def size: Int = ids.length

  /** Row position of a surrogate id, or -1 when absent. */
  def lookup(id: Long): Int = {
    val i = java.util.Arrays.binarySearch(ids, id)
    if (i < 0) -1 else i
  }

  /** Dequantized vector of row `row` — bit-exact twin of
    * ScalarQuant.decodeCol's arithmetic. */
  def dequant(row: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val off = row * dim
    var i = 0
    while (i < dim) {
      out(i) = (mn + (codes(off + i) & 0xff) * delta).toFloat
      i += 1
    }
    out
  }
}

object Sq8Store {

  /** One partition's pre-sorted run: ids ascending + aligned flat codes. */
  final case class Run(ids: Array[Long], codes: Array[Byte])

  /** Pack one partition's (id, qvec8) rows into a sorted run — executor
    * side; emits flat primitive arrays only. */
  def packRun(rows: Iterator[(Long, Array[Byte])], dim: Int): Iterator[Run] = {
    val buf = rows.toArray
    if (buf.isEmpty) Iterator.empty
    else {
      val order = Array.range(0, buf.length).sortBy(i => buf(i)._1)
      val ids = new Array[Long](buf.length)
      val codes = new Array[Byte](buf.length * dim)
      var i = 0
      while (i < buf.length) {
        val (id, c) = buf(order(i))
        require(c.length == dim, s"sq8 code width ${c.length} != dim $dim")
        ids(i) = id
        System.arraycopy(c, 0, codes, i * dim, dim)
        i += 1
      }
      Iterator(Run(ids, codes))
    }
  }

  /** K-way merge of sorted runs into one store — driver side. Duplicate
    * surrogates (xxhash64 collisions across distinct id strings — ~n²/2⁶⁵)
    * keep the first occurrence, deterministically (runs ordered, then id):
    * the same tie the id pool resolves the same way. */
  def merge(runs: Array[Run], dim: Int, mn: Float, mx: Float): Sq8Store = {
    val total = runs.map(_.ids.length).sum
    val ids = new Array[Long](total)
    // flat JVM arrays are Int-indexed (≤ ~2.1 GB of codes — 16M vectors
    // at dim 128); the engine's residency gate denies past that, and
    // multiplyExact turns a gate bug into a loud failure, not corruption
    val codes = new Array[Byte](math.multiplyExact(total, dim))
    // cursor per run; pick the (id, runIdx)-smallest head each step
    val cur = new Array[Int](runs.length)
    var n = 0
    var lastId = Long.MinValue
    var any = true
    var first = true
    while (any) {
      any = false
      var best = -1
      var bestId = Long.MaxValue
      var r = 0
      while (r < runs.length) {
        if (cur(r) < runs(r).ids.length) {
          val id = runs(r).ids(cur(r))
          if (!any || id < bestId) { best = r; bestId = id; any = true }
        }
        r += 1
      }
      if (any) {
        if (first || bestId != lastId) {
          ids(n) = bestId
          System.arraycopy(runs(best).codes, cur(best) * dim,
            codes, n * dim, dim)
          n += 1
          lastId = bestId
          first = false
        }
        cur(best) += 1
      }
    }
    if (n == total) new Sq8Store(ids, codes, dim, mn, mx)
    else new Sq8Store(java.util.Arrays.copyOf(ids, n),
      java.util.Arrays.copyOf(codes, n * dim), dim, mn, mx)
  }

  /** Collect a (id BIGINT, qvec8 BINARY) codes table into a resident
    * store: per-partition sorted runs on the executors, k-way merge on
    * the driver. The caller decides residency from measured bytes BEFORE
    * calling (same contract as IdPool). */
  def buildResident(codesTable: DataFrame, dim: Int,
                    mn: Float, mx: Float): Sq8Store = {
    val runs = codesTable.select("id", "qvec8")
      .queryExecution.toRdd.mapPartitions { it =>
        // getBinary returns an owned copy (unlike UTF8String views)
        packRun(it.map(r => (r.getLong(0), r.getBinary(1))), dim)
      }.collect()
    merge(runs, dim, mn, mx)
  }
}
