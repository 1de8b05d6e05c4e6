package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-resident SQ16 (uint16) copy of a snapshot's RAW vectors, keyed
  * by sorted surrogate id — the zero-job rerank store behind the refined
  * PQ serving tier.
  *
  * Why it exists: at the 10M rung the raw floats (5.1 GB) are past any
  * driver residency budget, so the resident tier serves raw-ADC answers
  * whose recall on hard data is the price of 64× compression (the bench
  * gauge reads 0.156 @ M=8). The designed answer is the classic refine
  * step — re-score the top k·refine ADC candidates against near-exact
  * vectors. A per-call Spark job against the snapshot would re-impose the
  * scheduler floor the resident tier exists to avoid; a resident
  * scalar-quantized copy keeps the rerank in-heap at ~µs per call.
  *
  * Why 16 bits and not 8: the bench's held-out σ=1.1 gauge makes true
  * neighbors nearly equidistant — uint8's per-coordinate error
  * (range/255/2) measurably reorders the top-k boundary there (measured
  * recall@10 0.980 vs 0.995 for the exact rerank at refine 50). uint16's
  * error is 256× smaller (range/65535), which prices below float noise on
  * real data — the refined wire answer matches the exact rerank's recall
  * while still halving the float footprint (2 B/dim: 2.56 GB of codes at
  * 10M×128 where floats are 5.1 GB). The store gets its OWN residency
  * budget line; denial falls back to the plan's distributed rerank.
  *
  * Quantization is ScalarQuant's global min/max affine map at 65535
  * levels, with the SAME float-then-double choreography the portable
  * SQ8 oracle proved cross-engine ((x − mn) is a FLOAT subtraction,
  * scale/delta are DOUBLE); the dequantization here is the bit-exact
  * driver twin of the plan-side sq16 decode expression, so the plan's
  * `refineStore = "sq16"` mode and this store score IDENTICAL floats —
  * tier parity is exact, spec-pinned.
  *
  * Layout: one sorted surrogate array + one flat uint16 code blob
  * (row r's codes at r·dim, stored in Short cells, read `& 0xffff`).
  * Built from per-partition PRE-SORTED runs merged on the driver (k-way,
  * same discipline as [[graft.IdPool]]) — transient footprint equals the
  * final store, never n boxed rows.
  */
final class Sq16Store(val ids: Array[Long], val codes: Array[Short],
                      val dim: Int, val mn: Float, val mx: Float)
  extends Serializable {

  val delta: Double = if (mx > mn) (mx - mn) / 65535.0 else 0.0

  /** Resident bytes (for the engine's residency registry). */
  val bytes: Long = ids.length * 8L + codes.length.toLong * 2L + 64L

  def size: Int = ids.length

  /** Row position of a surrogate id, or -1 when absent. */
  def lookup(id: Long): Int = {
    val i = java.util.Arrays.binarySearch(ids, id)
    if (i < 0) -1 else i
  }

  /** Dequantized vector of row `row` — bit-exact twin of the plan-side
    * decode expression ((mn + code·delta).toFloat, double arithmetic). */
  def dequant(row: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val off = row * dim
    val mnD = mn.toDouble
    var i = 0
    while (i < dim) {
      out(i) = (mnD + (codes(off + i) & 0xffff) * delta).toFloat
      i += 1
    }
    out
  }
}

object Sq16Store {

  /** One partition's pre-sorted run: ids ascending + aligned flat codes. */
  final case class Run(ids: Array[Long], codes: Array[Short])

  /** Pack one partition's (id, codes ARRAY<INT> in 0..65535) rows into a
    * sorted run — executor side; emits flat primitive arrays only. */
  def packRun(rows: Iterator[(Long, Array[Int])], dim: Int): Iterator[Run] = {
    val buf = rows.toArray
    if (buf.isEmpty) Iterator.empty
    else {
      val order = Array.range(0, buf.length).sortBy(i => buf(i)._1)
      val ids = new Array[Long](buf.length)
      val codes = new Array[Short](buf.length * dim)
      var i = 0
      while (i < buf.length) {
        val (id, c) = buf(order(i))
        require(c.length == dim, s"sq16 code width ${c.length} != dim $dim")
        ids(i) = id
        var d = 0
        while (d < dim) { codes(i * dim + d) = c(d).toShort; d += 1 }
        i += 1
      }
      Iterator(Run(ids, codes))
    }
  }

  /** K-way merge of sorted runs into one store — driver side. Duplicate
    * surrogates (xxhash64 collisions across distinct id strings — ~n²/2⁶⁵)
    * keep the first occurrence, deterministically (runs ordered, then id):
    * the same tie the id pool resolves the same way. */
  def merge(runs: Array[Run], dim: Int, mn: Float, mx: Float): Sq16Store = {
    // accumulate the run lengths in LONG: an Int sum wraps silently and
    // a direct caller (the engine's residency gate is upstream of this)
    // would see a negative allocation or index corruption, not an error
    // — same guard discipline as IdPool.merge
    val totalL = runs.map(_.ids.length.toLong).sum
    require(totalL * dim <= Int.MaxValue,
      s"sq16 store exceeds the Int-indexed flat-array bound: $totalL vectors x dim $dim")
    val total = totalL.toInt
    val ids = new Array[Long](total)
    // flat JVM arrays are Int-indexed (≤ ~2^31 shorts — 16M vectors at
    // dim 128); the engine's residency gate denies past that, and
    // multiplyExact turns a gate bug into a loud failure, not corruption
    val codes = new Array[Short](math.multiplyExact(total, dim))
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
    if (n == total) new Sq16Store(ids, codes, dim, mn, mx)
    else new Sq16Store(java.util.Arrays.copyOf(ids, n),
      java.util.Arrays.copyOf(codes, n * dim), dim, mn, mx)
  }

  /** Partitions fetched per driver-side wave during [[buildResident]]:
    * each wave is ONE job whose serialized results stay bounded (the
    * residency gate caps the whole store at ~3 GB over 32 partitions →
    * ~95 MB/run → ~380 MB/wave, under the default 1g
    * `spark.driver.maxResultSize`), while the scan+encode work of the
    * wave's partitions runs in PARALLEL — a full collect() tripped
    * maxResultSize at the 10M rung (r8, 1058 MiB) and the r8 fix
    * (`toLocalIterator`) serialized the fetch to one partition at a
    * time, pricing the one-time cold build at ~86 s standalone. */
  val FetchWavePartitions: Int = 4

  /** Collect a (id BIGINT, qvec16 ARRAY<INT>) codes table into a resident
    * store: per-partition sorted runs on the executors, k-way merge on
    * the driver. The caller decides residency from measured bytes BEFORE
    * calling (same contract as IdPool).
    *
    * Runs are fetched in bounded-parallel WAVES of
    * [[FetchWavePartitions]] partitions (one runJob per wave) — NOT
    * collect(), whose single job trips `spark.driver.maxResultSize`
    * (default 1g) on a multi-GB store regardless of real driver
    * headroom, and NOT one-partition-at-a-time `toLocalIterator`, which
    * serializes the scan work behind a single in-flight task. */
  def buildResident(codesTable: DataFrame, dim: Int,
                    mn: Float, mx: Float): Sq16Store = {
    val rdd = codesTable.select("id", "qvec16")
      .queryExecution.toRdd.mapPartitions { it =>
        packRun(it.map { r =>
          val arr = r.getArray(1)
          (r.getLong(0), arr.toIntArray())
        }, dim)
      }
    val sc = codesTable.sparkSession.sparkContext
    val nParts = rdd.getNumPartitions
    val runs = new Array[Run](nParts)
    (0 until nParts).grouped(FetchWavePartitions).foreach { wave =>
      val fetched = sc.runJob(rdd, (it: Iterator[Run]) => it.toArray, wave)
      wave.zip(fetched).foreach { case (p, rs) =>
        runs(p) = if (rs.nonEmpty) rs.head
                  else Run(Array.emptyLongArray, Array.empty[Short])
      }
    }
    merge(runs, dim, mn, mx)
  }
}
