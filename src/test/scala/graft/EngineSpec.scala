package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end lifecycle over the user-facing engine — mirrors the
  * reference's integration tier (SURVEY §5.2) and the smoke scenario
  * (tests/smoke_test.py): add → search → upsert → delete → build →
  * fresh-head search. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def mkRecords(rows: Seq[(String, Seq[Float], String, Seq[String], Long)]): DataFrame =
    rows.toDF("id", "vector", "meta", "tags", "updated_at")
      .withColumn("tenant_id", lit("t1"))
      .withColumn("index_name", lit("idx"))
      .withColumn("deleted", lit(false))

  private def q(id: Long, v: Seq[Float], tags: Seq[String] = null): DataFrame = {
    val base = Seq((id, v)).toDF("query_id", "qvec")
    if (tags == null) base
    else base.withColumn("filter_tags", typedLit(tags))
  }

  test("full lifecycle: add, dup-reject, build, search, upsert-over-tail, tombstone, tags, meta") {
    val root = Files.createTempDirectory("engine").toString
    val eng = new GraftEngine(spark, root)

    // ADD the smoke fixture + filler (FIXTURES.md §4)
    val filler = (10 until 40).map(i =>
      (s"f$i", Seq(0.5f + i * 0.01f, 0.5f, 0.3f), null: String, Seq("filler"), 100L))
    assert(eng.add(mkRecords(Seq(
      ("doc1", Seq(1f, 0f, 0f), """{"type":"test"}""", Seq.empty[String], 100L),
      ("doc2", Seq(0f, 1f, 0f), null, Seq("tagA"), 100L)) ++ filler)) == 32)
    val e0 = eng.epoch("t1", "idx")

    // duplicate ADD rejected (VEC.ADD semantics)
    intercept[IllegalArgumentException] {
      eng.add(mkRecords(Seq(("doc1", Seq(9f, 9f, 9f), null, Seq(), 200L))))
    }

    // BUILD, then search: [0.9,0.1,0] → doc1 top-1 (smoke oracle)
    eng.build("t1", "idx", nlist = 4)
    assert(eng.epoch("t1", "idx") > e0) // build bumps epoch
    val hits = eng.search("t1", "idx", q(1L, Seq(0.9f, 0.1f, 0f)), k = 2,
      nprobe = 4, withMeta = true).collect()
    assert(hits.head.getAs[String]("id") == "doc1")
    assert(hits.head.getAs[String]("meta") == """{"type":"test"}""")

    // tag filter: [0,0.9,0] FILTER tagA → doc2 only
    val tagged = eng.search("t1", "idx",
      q(2L, Seq(0f, 0.9f, 0f), Seq("tagA")), k = 5, nprobe = 4).collect()
    assert(tagged.map(_.getAs[String]("id")).toSeq == Seq("doc2"))

    // UPSERT doc1 to a new location AFTER build → head must win over tail
    eng.upsert(mkRecords(Seq(
      ("doc1", Seq(0f, 0f, 1f), """{"v":2}""", Seq.empty[String], 300L))))
    val afterUpsert = eng.search("t1", "idx", q(3L, Seq(1f, 0f, 0f)), k = 2,
      nprobe = 4).collect()
    // doc1 moved away from [1,0,0]: it must NOT come back at its old spot
    assert(afterUpsert.head.getAs[String]("id") != "doc1")
    val nearNew = eng.search("t1", "idx", q(4L, Seq(0f, 0f, 1f)), k = 1,
      nprobe = 4).collect()
    assert(nearNew.head.getAs[String]("id") == "doc1") // found at fresh spot

    // DELETE doc2 (tombstone after build) → masked from tail results
    eng.delete("t1", "idx", Seq("doc2"), version = 400L)
    val afterDel = eng.search("t1", "idx", q(5L, Seq(0f, 0.9f, 0f)), k = 5,
      nprobe = 4).collect()
    assert(!afterDel.map(_.getAs[String]("id")).contains("doc2"))

    // no duplicate ids anywhere in results
    assert(afterDel.map(_.getAs[String]("id")).distinct.length == afterDel.length)

    // stats: every built vector assigned to a cluster
    val total = eng.stats("t1", "idx").agg(sum("n_vectors")).head.getLong(0)
    assert(total == 32)

    // audit log: append + read back (S12)
    eng.audit("admin", "index.build", "t1/idx", ts = 1000L)
    eng.audit("admin", "vector.delete", "t1/idx/doc2", ts = 2000L)
    val log = eng.auditLog().orderBy("ts").collect()
    assert(log.map(_.getAs[String]("action")).toSeq ==
      Seq("index.build", "vector.delete"))

    // rebuild compacts head into tail; doc2 stays gone, doc1 at new spot
    eng.build("t1", "idx", nlist = 4)
    val afterRebuild = eng.search("t1", "idx", q(6L, Seq(0f, 0f, 1f)), k = 1,
      nprobe = 4).collect()
    assert(afterRebuild.head.getAs[String]("id") == "doc1")
    assert(eng.currentState("t1", "idx").count() == 31) // 32 - doc2
  }

  test("maxScans caps BOTH tail and head candidate scans (budget degradation)") {
    val root = Files.createTempDirectory("engine_scans").toString
    val eng = new GraftEngine(spark, root)
    // 20 tail records, build, then 20 fresh head records
    val tail = (0 until 20).map(i =>
      (s"t$i", Seq(i.toFloat, 1f, 0f), null: String, Seq.empty[String], 100L))
    eng.add(mkRecords(tail))
    eng.build("t1", "idx", nlist = 2)
    val head = (0 until 20).map(i =>
      (s"h$i", Seq(i.toFloat, 2f, 0f), null: String, Seq.empty[String], 200L))
    eng.add(mkRecords(head))

    val query = q(1L, Seq(10f, 1f, 0f))
    // uncapped: k=40 returns all 40 candidates
    assert(eng.search("t1", "idx", query, k = 40, nprobe = 2).count() == 40)
    // capped at 3: ≤ 3 tail + ≤ 3 head candidates ever get scored
    val capped = eng.search("t1", "idx", query, k = 40, nprobe = 2, maxScans = 3)
      .collect()
    assert(capped.length <= 6, s"maxScans leak: ${capped.length} candidates")
    assert(capped.length > 0)
    val heads = capped.map(_.getAs[String]("id")).count(_.startsWith("h"))
    assert(heads <= 3, s"head scan uncapped: $heads head hits")
    // deterministic: same cap → same result set
    val again = eng.search("t1", "idx", query, k = 40, nprobe = 2, maxScans = 3)
      .collect()
    assert(capped.map(_.getAs[String]("id")).toSet ==
      again.map(_.getAs[String]("id")).toSet)
  }

  test("algo parity: FLAT and HNSW tails answer like IVF, head still wins") {
    val root = Files.createTempDirectory("engine_algo").toString
    val eng = new GraftEngine(spark, root)
    val recs = (0 until 60).map { i =>
      (s"v$i", Seq(i.toFloat, (60 - i).toFloat, 1f), null: String,
        Seq.empty[String], 100L)
    }
    eng.add(mkRecords(recs))
    val query = q(1L, Seq(30f, 30f, 1f))

    for (algo <- Seq("FLAT", "IVF_FLAT", "HNSW")) {
      eng.build("t1", "idx", nlist = 4, algo = algo)
      assert(eng.manifest("t1", "idx").algo == algo)
      val hits = eng.search("t1", "idx", query, k = 3, nprobe = 4).collect()
      assert(hits.head.getAs[String]("id") == "v30", s"algo=$algo")
    }

    // fresh head write after an HNSW build must still override the graph
    eng.upsert(mkRecords(Seq(
      ("v30", Seq(-50f, -50f, -50f), null, Seq.empty[String], 200L))))
    val afterUpsert = eng.search("t1", "idx", query, k = 3, nprobe = 4).collect()
    assert(afterUpsert.head.getAs[String]("id") != "v30")
    assert(afterUpsert.map(_.getAs[String]("id")).distinct.length == afterUpsert.length)
  }
}
