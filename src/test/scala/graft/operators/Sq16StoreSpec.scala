package graft.operators

import scala.util.Random

import graft.SparkSpec

/** The resident uint16 rerank store behind refined PQ serving: packed
  * sorted runs, k-way merge, wave-fetched build — direct unit coverage
  * for the pieces EngineSpec only exercises end-to-end (the Long-sum
  * merge guard, the empty-partition wave slot, duplicate-surrogate
  * resolution, dequant bit-exactness). */
class Sq16StoreSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  private def codesOf(rng: Random): Array[Int] =
    Array.fill(dim)(rng.nextInt(65536))

  test("buildResident parity with a Map over a multi-partition table incl. EMPTY partitions") {
    val rng = new Random(11)
    val rows = (0 until 500).map(i => (rng.nextLong(), codesOf(rng).toSeq))
    val ref = rows.toMap
    // 64 partitions over 500 rows: hash layout leaves some partitions
    // empty — packRun emits NO run for those, so the wave fetch must
    // fill the slot with an empty run instead of a null
    val df = rows.toDF("id", "qvec16").repartition(64)
    val store = Sq16Store.buildResident(df, dim, mn = -1f, mx = 1f)
    assert(store.size == ref.size)
    ref.foreach { case (id, cs) =>
      val r = store.lookup(id)
      assert(r >= 0, s"missing $id")
      val got = (0 until dim).map(d => store.codes(r * dim + d) & 0xffff)
      assert(got == cs, s"codes mismatch at $id")
    }
    assert(store.lookup(rows.map(_._1).max + 1) == -1)
    // ids come out globally sorted (binary-search contract)
    assert(store.ids.toSeq == store.ids.toSeq.sorted)
  }

  test("merge keeps the FIRST occurrence of a duplicate surrogate (runs ordered, then id)") {
    def run(entries: (Long, Int)*): Sq16Store.Run =
      Sq16Store.packRun(
        entries.iterator.map { case (id, v) => (id, Array.fill(dim)(v)) },
        dim).next()
    val a = run(1L -> 10, 5L -> 11)
    val b = run(5L -> 99, 7L -> 12) // 5L duplicates run a's
    val store = Sq16Store.merge(Array(a, b), dim, -1f, 1f)
    assert(store.size == 3)
    assert((store.codes(store.lookup(5L) * dim) & 0xffff) == 11,
      "first run's row must win the duplicate-surrogate tie")
  }

  test("merge fails LOUDLY when total*dim exceeds the Int-indexed flat-array bound") {
    val ids = Array.tabulate(20000)(_.toLong)
    val codes = new Array[Short](20000 * dim)
    val run = Sq16Store.Run(ids, codes)
    // 120k real cells, but a dim claim that puts total*dim past
    // Int.MaxValue must hit the Long-sum require, not a negative or
    // wrapped allocation (the engine's residency gate is upstream of
    // direct callers like this one)
    val e = intercept[IllegalArgumentException] {
      Sq16Store.merge(Array.fill(6000)(run), 200000, -1f, 1f)
    }
    assert(e.getMessage.contains("Int-indexed"))
  }

  test("dequant is the documented affine map in double arithmetic") {
    val run = Sq16Store.packRun(
      Iterator((3L, Array(0, 1, 32768, 65535, 17, 4242))), dim).next()
    val mn = -2.5f; val mx = 3.25f
    val store = Sq16Store.merge(Array(run), dim, mn, mx)
    val delta = (mx - mn) / 65535.0
    val got = store.dequant(store.lookup(3L))
    val want = Array(0, 1, 32768, 65535, 17, 4242)
      .map(c => (mn.toDouble + c * delta).toFloat)
    assert(got.toSeq == want.toSeq)
  }
}
