package graft.operators

import scala.util.Random

import graft.SparkSpec

/** The resident uint16 rerank store behind refined PQ serving: packed
  * sorted runs, k-way merge into bounded SEGMENTS, wave-fetched build —
  * direct unit coverage for the pieces EngineSpec only exercises
  * end-to-end (segment routing, the empty-partition wave slot,
  * duplicate-surrogate resolution, dequant bit-exactness). */
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
      val got = (0 until dim).map(d => store.code(r, d))
      assert(got == cs, s"codes mismatch at $id")
    }
    assert(store.lookup(rows.map(_._1).max + 1) == -1)
    // global row order follows ascending id order (the sorted contract
    // segment routing relies on)
    val sortedIds = rows.map(_._1).sorted
    assert(sortedIds.zipWithIndex.forall { case (id, i) =>
      store.lookup(id) == i.toLong })
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
    assert(store.code(store.lookup(5L), 0) == 11,
      "first run's row must win the duplicate-surrogate tie")
  }

  test("segmented merge: tiny per-segment cap, lookups/dequant/size identical to flat") {
    val rng = new Random(23)
    val entries = (0 until 200).map(_ => (rng.nextLong(), codesOf(rng)))
      .distinctBy(_._1)
    // three runs with interleaved id ranges — the merge must weave them
    val runs = entries.grouped((entries.size + 2) / 3).map(g =>
      Sq16Store.packRun(g.iterator, dim).next()).toArray
    val flat = Sq16Store.merge(runs, dim, -2f, 2f)
    // rowsPerSeg 7 → ~29 segments, incl. a partial tail
    val segd = Sq16Store.merge(runs, dim, -2f, 2f, rowsPerSeg = 7)
    assert(segd.size == flat.size && segd.size == entries.size)
    entries.foreach { case (id, _) =>
      val rf = flat.lookup(id)
      val rs = segd.lookup(id)
      assert(rs == rf, s"global row mismatch at $id: $rs vs $rf")
      assert(segd.dequant(rs).toSeq == flat.dequant(rf).toSeq)
    }
    assert(segd.lookup(entries.map(_._1).max + 1) == -1)
    // duplicate dropping across a segment boundary: re-merge with every
    // id duplicated in a second run — size and first-win unchanged
    val dupRuns = runs ++ runs.map(r =>
      Sq16Store.Run(r.ids.clone(), r.codes.map(c => (c + 1).toShort)))
    val dd = Sq16Store.merge(dupRuns, dim, -2f, 2f, rowsPerSeg = 7)
    assert(dd.size == entries.size)
    entries.foreach { case (id, cs) =>
      assert(dd.code(dd.lookup(id), 0) == cs(0),
        s"first occurrence must win at $id")
    }
  }

  test("out-of-range rows fail loudly; byte accounting covers every segment") {
    val run = Sq16Store.packRun(
      (0L until 20L).iterator.map(i => (i, Array.fill(dim)(i.toInt))), dim)
      .next()
    val store = Sq16Store.merge(Array(run), dim, -1f, 1f, rowsPerSeg = 6)
    intercept[IllegalArgumentException](store.dequant(20L))
    intercept[IllegalArgumentException](store.dequant(-1L))
    // 4 segments (6+6+6+2): ids 8 B/row + codes 2 B/cell + 64/segment + 64
    val want = 20L * 8 + 20L * dim * 2 + 4 * 64L + 64L
    assert(store.bytes == want, s"bytes ${store.bytes} != $want")
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

  test("segment sidecar roundtrip: multi-segment store loads bit-identical") {
    val rng = new Random(29)
    val rows = (0 until 200).map(_ => (rng.nextLong(), codesOf(rng)))
      .distinctBy(_._1).sortBy(_._1)
    val run = Sq16Store.packRun(
      rows.iterator.map { case (id, cs) => (id, cs) }, dim).next()
    // decimal-unrepresentable float params: the meta stores exact bits,
    // so the loaded dequant must be bit-equal, not just close
    val store = Sq16Store.merge(Array(run), dim, -1.1f, 2.7f, rowsPerSeg = 37)
    val dir = java.nio.file.Files.createTempDirectory("sq16seg").toString
    Sq16Store.save(store, dir)
    assert(Sq16Store.sidecarExists(dir))
    assert(Sq16Store.sidecarStats(dir) == ((rows.length.toLong, dim)))
    val loaded = Sq16Store.load(dir)
    assert(loaded.size == store.size)
    assert(loaded.bytes == store.bytes)
    rows.foreach { case (id, _) =>
      val a = store.lookup(id); val b = loaded.lookup(id)
      assert(a == b, s"row index drift at $id")
      assert(loaded.dequant(b).toSeq == store.dequant(a).toSeq,
        s"dequant drift at $id")
    }
  }

  test("sidecar corruption fails loudly: truncation, reordering, version skew") {
    val run = Sq16Store.packRun(
      (0L until 30L).iterator.map(i => (i * 3, Array.fill(dim)(i.toInt))), dim)
      .next()
    val store = Sq16Store.merge(Array(run), dim, -1f, 1f, rowsPerSeg = 10)
    def freshDir(): java.nio.file.Path = {
      val d = java.nio.file.Files.createTempDirectory("sq16corrupt")
      Sq16Store.save(store, d.toString)
      d
    }
    // truncated segment file → size mismatch, named in the error
    val d1 = freshDir()
    val seg = d1.resolve("seg-00001.bin")
    val ch = java.nio.channels.FileChannel.open(seg,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(java.nio.file.Files.size(seg) - 2) finally ch.close()
    val e1 = intercept[IllegalArgumentException](Sq16Store.load(d1.toString))
    assert(e1.getMessage.contains("truncated or mismatched"), e1.getMessage)
    // byte-swapped ids → sort-order violation
    val d2 = freshDir()
    val p2 = d2.resolve("seg-00000.bin")
    val bytes = java.nio.file.Files.readAllBytes(p2)
    val tmp = bytes.take(8)
    System.arraycopy(bytes, 8, bytes, 0, 8)
    System.arraycopy(tmp.toArray, 0, bytes, 8, 8)
    java.nio.file.Files.write(p2, bytes)
    val e2 = intercept[IllegalArgumentException](Sq16Store.load(d2.toString))
    assert(e2.getMessage.contains("ascending"), e2.getMessage)
    // future meta version → refused, not misread
    val d3 = freshDir()
    val meta = d3.resolve("meta.json")
    java.nio.file.Files.writeString(meta,
      java.nio.file.Files.readString(meta)
        .replace("\"version\": 1", "\"version\": 99"))
    val e3 = intercept[IllegalArgumentException](Sq16Store.load(d3.toString))
    assert(e3.getMessage.contains("version"), e3.getMessage)
  }

  test("empty store sidecar roundtrip") {
    val store = Sq16Store.merge(Array.empty[Sq16Store.Run], dim, 0f, 1f)
    val dir = java.nio.file.Files.createTempDirectory("sq16empty").toString
    Sq16Store.save(store, dir)
    val loaded = Sq16Store.load(dir)
    assert(loaded.size == 0L)
    assert(loaded.lookup(7L) == -1L)
  }
}
