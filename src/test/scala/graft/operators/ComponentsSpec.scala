package graft.operators

import graft.SparkSpec

/** Connected-components grouping ([[Components.connectedComponents]] /
  * [[TextDedup.keepCanonical]]): fixtures with known component structure,
  * a union-find oracle over random graphs, and the adversarial long chain
  * that defeats diameter-bound label propagation. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def groupsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components
      .connectedComponents(pairs.toDF("id1", "id2"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** Brute-force union-find oracle. */
  private def ufOracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical = min of component; union-by-min keeps roots minimal
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chained pairs collapse into one component with min canonical") {
    // 1-2, 2-3, 3-4 chain plus an isolated pair and reversed/dup noise
    val got = groupsOf(Seq((2L, 1L), (2L, 3L), (3L, 4L), (3L, 4L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("self-loops and empty input are tolerated") {
    assert(groupsOf(Seq((5L, 5L))) == Map.empty)
    assert(groupsOf(Seq.empty) == Map.empty)
  }

  test("long chain (diameter 64) converges in the round budget") {
    val chain = (0L until 64L).map(i => (i, i + 1))
    val got = groupsOf(chain)
    assert(got.size == 65 && got.values.forall(_ == 0L))
  }

  test("random graphs match the union-find oracle") {
    val rng = new scala.util.Random(42)
    (1 to 6).foreach { _ =>
      val n = 2 + rng.nextInt(40)
      val pairs = Seq.fill(1 + rng.nextInt(60))(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(groupsOf(pairs) == ufOracle(pairs))
    }
  }

  test("keepCanonical: singletons keep themselves, components keep the min") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((3L, 2L)).toDF("id1", "id2")
    val got = TextDedup.keepCanonical(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 2L, false),
      (7L, 7L, true)))
  }
}
