package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.lit

/** The manifest and tenant-quota parses are memoized on the file's
  * (mtime, size) so the per-call serving path pays a stat instead of a
  * read + regex parse. These tests pin the property that makes that
  * safe: a write by ANOTHER instance (different memo map, same files)
  * is visible on the very next read — freshness is anchored to the
  * filesystem, not to the writer's JVM state. */
class MemoFreshnessSpec extends SparkSpec {
  import spark.implicits._

  test("manifest memo: a second engine instance sees the first's build and epoch bumps") {
    val root = Files.createTempDirectory("memo-fresh-eng").toString
    val eng1 = new GraftEngine(spark, root)
    val eng2 = new GraftEngine(spark, root)
    def recs(ids: Range, ts: Long) = ids.map(i =>
        (s"v$i", Seq(i.toFloat, 1f, 0f), null: String, Seq.empty[String], ts))
      .toDF("id", "vector", "meta", "tags", "updated_at")
      .withColumn("tenant_id", lit("t1"))
      .withColumn("index_name", lit("idx"))
      .withColumn("deleted", lit(false))

    // Manifest is an inner case class (its equals compares the owning
    // engine instance too) — cross-instance agreement is a field matter
    def fieldsOf(e: GraftEngine) = {
      val m = e.manifest("t1", "idx")
      (m.epoch, m.buildWatermark, m.algo, m.nVectors, m.version,
        m.metric, m.headDirty)
    }
    eng1.add(recs(0 until 20, 100L))
    // warm BOTH memos on the pre-build manifest
    val pre = fieldsOf(eng1)
    assert(fieldsOf(eng2) == pre)

    eng1.build("t1", "idx", nlist = 2)
    val m1 = fieldsOf(eng1)
    assert(m1._5 > pre._5, "build must bump the version")
    // the OTHER instance's memo was warmed pre-build — it must re-read
    val m2 = fieldsOf(eng2)
    assert(m2 == m1, s"stale cross-instance manifest: $m2 != $m1")

    // epoch bump via a post-build write, again observed cross-instance
    eng1.upsert(recs(20 until 25, 200L))
    assert(fieldsOf(eng2) == fieldsOf(eng1))
    assert(fieldsOf(eng2)._1 > m1._1)
  }

  test("quota memo: a second management instance sees quota and key updates") {
    val root = Files.createTempDirectory("memo-fresh-mgmt").toString
    val m1 = new Management(spark, root)
    val m2 = new Management(spark, root)
    m1.createTenant("tq", TenantQuota(cacheMemoryMb = 64))
    // warm both memos
    assert(m1.quota("tq").cacheMemoryMb == 64)
    assert(m2.quota("tq").cacheMemoryMb == 64)

    m1.updateQuota("tq", m1.quota("tq").copy(cacheMemoryMb = 256))
    assert(m1.quota("tq").cacheMemoryMb == 256)
    assert(m2.quota("tq").cacheMemoryMb == 256,
      "cross-instance quota update must be visible on the next read")

    // unknown tenant still fails loudly through the memoized path
    val e = intercept[IllegalArgumentException](m2.quota("nope"))
    assert(e.getMessage.contains("no such tenant"))
  }
}
