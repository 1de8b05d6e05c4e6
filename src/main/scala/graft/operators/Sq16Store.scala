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
  * Layout: SEGMENTED — sorted surrogate arrays + aligned flat uint16
  * code blobs (Short cells, read `& 0xffff`), each segment bounded at
  * [[Sq16Store.SegMaxCodes]] cells so NO array-index ceiling exists:
  * the store's only capacity limit is its byte budget (the same
  * "budgets, not Int cliffs" discipline as the rows gate — a flat
  * single-array layout capped the store at Int.MaxValue/dim vectors,
  * 16.7M at dim 128, an accident of JVM indexing rather than a policy).
  * Segments are globally sorted (every id in segment i precedes segment
  * i+1), so a lookup is two binary searches: segment by first-id, then
  * row within — the same probe count as the flat layout ±1. Built from
  * per-partition PRE-SORTED runs merged on the driver (k-way, same
  * discipline as [[graft.IdPool]]) — transient footprint equals the
  * final store, never n boxed rows. Rows are addressed by a GLOBAL Long
  * row index (what [[lookup]] returns and [[dequant]] takes).
  */
final class Sq16Store private[operators] (
    private val segIds: Array[Array[Long]],
    private val segCodes: Array[Array[Short]],
    val dim: Int, val mn: Float, val mx: Float)
  extends Serializable {

  val delta: Double = if (mx > mn) (mx - mn) / 65535.0 else 0.0

  /** Global row index of each segment's first row (length nSegs + 1;
    * last entry = total rows). */
  private val segStarts: Array[Long] = {
    val out = new Array[Long](segIds.length + 1)
    var i = 0
    while (i < segIds.length) { out(i + 1) = out(i) + segIds(i).length; i += 1 }
    out
  }

  /** First surrogate of each segment — the lookup's segment router. */
  private val segFirst: Array[Long] =
    segIds.map(ids => if (ids.nonEmpty) ids(0) else Long.MaxValue)

  def size: Long = segStarts(segStarts.length - 1)

  /** Resident heap bytes (for the engine's residency registry). */
  val bytes: Long = {
    var b = 64L
    var i = 0
    while (i < segIds.length) {
      b += segIds(i).length * 8L + segCodes(i).length.toLong * 2L + 64L
      i += 1
    }
    b
  }

  /** Global row index of a surrogate id, or -1 when absent. */
  def lookup(id: Long): Long = {
    // greatest segment whose first id is <= id (global sort order)
    val p = java.util.Arrays.binarySearch(segFirst, id)
    val seg = if (p >= 0) p else -p - 2
    if (seg < 0) return -1L
    val i = java.util.Arrays.binarySearch(segIds(seg), id)
    if (i < 0) -1L else segStarts(seg) + i
  }

  /** The uint16 code cell of global row `row`, coordinate `d` (specs /
    * debugging; the serving path uses [[dequant]]). */
  def code(row: Long, d: Int): Int = {
    val seg = segOf(row)
    val local = (row - segStarts(seg)).toInt
    segCodes(seg)(local * dim + d) & 0xffff
  }

  private def segOf(row: Long): Int = {
    val p = java.util.Arrays.binarySearch(segStarts, row)
    val seg = if (p >= 0) p else -p - 2
    require(seg >= 0 && seg < segIds.length && row < size,
      s"sq16 row $row out of range [0, $size)")
    seg
  }

  /** Dequantized vector of global row `row` — bit-exact twin of the
    * plan-side decode expression ((mn + code·delta).toFloat, double
    * arithmetic). */
  def dequant(row: Long): Array[Float] = {
    val seg = segOf(row)
    val codes = segCodes(seg)
    val off = (row - segStarts(seg)).toInt * dim
    val out = new Array[Float](dim)
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

  /** Per-segment code-cell bound: 2^30 Short cells = 2 GiB per code
    * array — comfortably inside JVM array limits while keeping segment
    * count single-digit at multi-GB stores (a 20M×128 store is 3
    * segments). Small enough that the last segment's trim waste is
    * bounded; large enough that the lookup's extra segment probe is ~2
    * comparisons. */
  val SegMaxCodes: Int = 1 << 30

  /** One partition's pre-sorted run: ids ascending + aligned flat codes. */
  final case class Run(ids: Array[Long], codes: Array[Short])

  /** Pack one partition's (id, codes ARRAY<INT> in 0..65535) rows into
    * sorted runs — executor side; emits flat primitive arrays only.
    * Partitions past [[SegMaxCodes]]/dim rows (16.7M at dim 128 — a
    * raised `maxPartitionBytes`, an unsplittable codec, an upstream
    * coalesce) emit MULTIPLE bounded runs instead of overflowing the
    * Int-sized `rows·dim` code allocation: each chunk is sorted
    * internally, which is all [[merge]] requires of a run, and chunks
    * keep partition order so duplicate-surrogate resolution stays
    * first-occurrence-deterministic. */
  def packRun(rows: Iterator[(Long, Array[Int])], dim: Int): Iterator[Run] = {
    val cap = math.max(1, SegMaxCodes / dim)
    rows.grouped(cap).map { chunk =>
      val buf = chunk.toArray
      val order = Array.range(0, buf.length).sortBy(i => buf(i)._1)
      val ids = new Array[Long](buf.length)
      val codes = new Array[Short](math.multiplyExact(buf.length, dim))
      var i = 0
      while (i < buf.length) {
        val (id, c) = buf(order(i))
        require(c.length == dim, s"sq16 code width ${c.length} != dim $dim")
        ids(i) = id
        var d = 0
        while (d < dim) { codes(i * dim + d) = c(d).toShort; d += 1 }
        i += 1
      }
      Run(ids, codes)
    }
  }

  /** K-way merge of sorted runs into one store — driver side. Duplicate
    * surrogates (xxhash64 collisions across distinct id strings — ~n²/2⁶⁵)
    * keep the first occurrence, deterministically (runs ordered, then id):
    * the same tie the id pool resolves the same way. Output rows fill
    * bounded segments sequentially (`rowsPerSeg`, default
    * [[SegMaxCodes]]/dim), so total capacity is heap-bounded, never
    * Int-index-bounded; the run-length sum stays in LONG throughout
    * (an Int sum wraps silently — same guard discipline as
    * IdPool.merge). */
  def merge(runs: Array[Run], dim: Int, mn: Float, mx: Float): Sq16Store =
    merge(runs, dim, mn, mx, math.max(1, SegMaxCodes / dim))

  private[operators] def merge(runs: Array[Run], dim: Int, mn: Float,
                               mx: Float, rowsPerSeg: Int): Sq16Store = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(rowsPerSeg > 0, s"rowsPerSeg must be positive, got $rowsPerSeg")
    val totalL = runs.map(_.ids.length.toLong).sum
    val nSegs = math.max(1L, (totalL + rowsPerSeg - 1) / rowsPerSeg)
    require(nSegs <= 4096,
      s"sq16 store would need $nSegs segments ($totalL vectors × dim " +
        s"$dim) — past any sane residency budget")
    val segIds = new Array[Array[Long]](nSegs.toInt)
    val segCodes = new Array[Array[Short]](nSegs.toInt)
    var seg = -1 // current segment (allocated lazily below)
    var segLen = 0 // rows filled in the current segment
    var segCap = 0 // row capacity of the current segment
    var remaining = totalL
    val cur = new Array[Int](runs.length)
    var lastId = Long.MinValue
    var wrote = 0L
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
          if (seg < 0 || segLen == segCap) {
            seg += 1
            segCap = math.min(remaining, rowsPerSeg.toLong).toInt
            segIds(seg) = new Array[Long](segCap)
            segCodes(seg) = new Array[Short](segCap * dim)
            segLen = 0
          }
          segIds(seg)(segLen) = bestId
          System.arraycopy(runs(best).codes, cur(best) * dim,
            segCodes(seg), segLen * dim, dim)
          segLen += 1
          wrote += 1
          remaining -= 1
          lastId = bestId
          first = false
        }
        cur(best) += 1
      }
    }
    // duplicates dropped entries: trim the tail segment to its filled
    // prefix and drop never-allocated segments
    val used = if (seg < 0) 0 else seg + 1
    val outIds = new Array[Array[Long]](math.max(used, 1))
    val outCodes = new Array[Array[Short]](math.max(used, 1))
    if (used == 0) {
      outIds(0) = Array.emptyLongArray
      outCodes(0) = Array.empty[Short]
    } else {
      var i = 0
      while (i < used) {
        if (i < used - 1 || segLen == segIds(i).length) {
          outIds(i) = segIds(i)
          outCodes(i) = segCodes(i)
        } else {
          outIds(i) = java.util.Arrays.copyOf(segIds(i), segLen)
          outCodes(i) = java.util.Arrays.copyOf(segCodes(i), segLen * dim)
        }
        i += 1
      }
    }
    new Sq16Store(outIds, outCodes, dim, mn, mx)
  }

  /** Max partitions fetched per driver-side wave during
    * [[buildResident]]: each wave is ONE job whose serialized results
    * stay bounded, while the scan+encode work of the wave's partitions
    * runs in PARALLEL — a full collect() tripped the default 1g
    * `spark.driver.maxResultSize` at the 10M rung (r8, 1058 MiB) and
    * the r8 fix (`toLocalIterator`) serialized the fetch to one
    * partition at a time, pricing the one-time cold build at ~86 s
    * standalone. When the caller supplies the store's estimated bytes,
    * the wave narrows further so one wave's results stay under
    * [[WaveResultBudgetBytes]] even for a near-budget store over few
    * partitions (an 8 GiB-admitted store over 32 partitions is
    * ~256 MB/run — four of those in one job is the exact r8 failure
    * again). */
  val FetchWavePartitions: Int = 4

  /** Per-wave serialized-result budget: half the default 1g
    * `spark.driver.maxResultSize`, leaving headroom for serialization
    * overhead and estimate error. */
  val WaveResultBudgetBytes: Long = 512L << 20

  /** Collect a (id BIGINT, qvec16 ARRAY<INT>) codes table into a resident
    * store: per-partition sorted runs on the executors, k-way merge on
    * the driver. The caller decides residency from measured bytes BEFORE
    * calling (same contract as IdPool); passing that estimate as
    * `estBytes` lets the wave sizing bound each job's serialized
    * results (unknown/-1 keeps the fixed [[FetchWavePartitions]]).
    *
    * Runs are fetched in bounded-parallel WAVES (one runJob per wave) —
    * NOT collect(), whose single job trips `spark.driver.maxResultSize`
    * (default 1g) on a multi-GB store regardless of real driver
    * headroom, and NOT one-partition-at-a-time `toLocalIterator`, which
    * serializes the scan work behind a single in-flight task. */
  def buildResident(codesTable: DataFrame, dim: Int,
                    mn: Float, mx: Float,
                    estBytes: Long = -1L): Sq16Store = {
    val rdd = codesTable.select("id", "qvec16")
      .queryExecution.toRdd.mapPartitions { it =>
        packRun(it.map { r =>
          val arr = r.getArray(1)
          (r.getLong(0), arr.toIntArray())
        }, dim)
      }
    val sc = codesTable.sparkSession.sparkContext
    val nParts = rdd.getNumPartitions
    val waveSize =
      if (estBytes <= 0 || nParts == 0) FetchWavePartitions
      else {
        val perPart = math.max(1L, estBytes / nParts)
        math.max(1, math.min(FetchWavePartitions.toLong,
          WaveResultBudgetBytes / perPart).toInt)
      }
    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
    (0 until nParts).grouped(waveSize).foreach { wave =>
      val fetched = sc.runJob(rdd, (it: Iterator[Run]) => it.toArray, wave)
      // partition-then-chunk order (waves are sequential, partitions
      // in-order within a wave): duplicate surrogates stay
      // first-occurrence-deterministic through the merge. Empty
      // partitions emit no runs and contribute nothing.
      fetched.foreach(runs ++= _)
    }
    merge(runs.toArray, dim, mn, mx)
  }
}
