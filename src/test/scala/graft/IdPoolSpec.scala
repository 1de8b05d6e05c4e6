package graft

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The compact surrogate → id pool behind the rows serving tier: packed
  * sorted runs, k-way merge, binary-search lookup — parity with a plain
  * Map over every construction shape the engine produces. */
class IdPoolSpec extends AnyFunSuite {

  private def pool(parts: Seq[Seq[(Long, String)]]): IdPool =
    IdPool.merge(parts.flatMap(p =>
      IdPool.packRun(p.iterator.map { case (sg, s) =>
        (sg, s.getBytes(UTF_8)) })).toArray)

  test("lookup parity with Map across unsorted overlapping runs") {
    val rng = new Random(7)
    val entries = (0 until 5000).map(i => (rng.nextLong(), s"id-$i-${rng.nextInt(1000)}"))
    val ref = entries.toMap
    // partition round-robin so runs interleave surrogate ranges
    val parts = entries.zipWithIndex.groupBy(_._2 % 7).values
      .map(_.map(_._1)).toSeq
    val p = pool(parts)
    assert(p.size == ref.size)
    ref.foreach { case (sg, s) => assert(p.contains(sg) && p(sg) == s) }
    assert(!p.contains(entries.map(_._1).max + 1))
  }

  test("multibyte UTF-8 ids survive pack/merge byte-exactly") {
    val entries = Seq((5L, "héllo-wörld"), (1L, "名前-こんにちは"), (3L, "emoji-🎯-id"))
    val p = pool(Seq(entries))
    entries.foreach { case (sg, s) => assert(p(sg) == s) }
  }

  test("empty ids, empty runs, and a fully empty pool") {
    val p = pool(Seq(Seq((2L, "")), Seq.empty, Seq((9L, "x"))))
    assert(p.size == 2 && p(2L) == "" && p(9L) == "x")
    val empty = IdPool.merge(Array.empty)
    assert(empty.size == 0 && !empty.contains(0L))
  }

  test("duplicate surrogates across runs keep the first in merge order") {
    // 64-bit collisions are ~1e-6 at 10M ids; determinism still matters
    val p = pool(Seq(Seq((7L, "first"), (1L, "a")), Seq((7L, "second"))))
    assert(p.size == 2 && p(7L) == "first" && p(1L) == "a")
  }

  test("unknown surrogate lookup fails loudly; bytes accounting is sane") {
    val p = pool(Seq(Seq((4L, "abcd"))))
    assertThrows[IllegalArgumentException](p(5L))
    assert(p.bytes >= 12L + 4L) // one entry + its blob, plus overhead
  }
}
