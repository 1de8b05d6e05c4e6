package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("fvecs roundtrip: encode → file → read (reference FvecsReader.cs:14-58)") {
    val vecs = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(-1.5f, 0.5f, 9.0f))
    val dir = Files.createTempDirectory("fvecs")
    Files.write(dir.resolve("test.fvecs"), Fvecs.encode(vecs))
    val got = Fvecs.read(spark, dir.toString + "/test.fvecs")
      .orderBy("id").select("id", "vec")
      .as[(Long, Seq[Float])].collect()
    assert(got.toSeq == Seq((0L, vecs(0)), (1L, vecs(1))))
  }

  test("fvecs respects limit and rejects corrupt records") {
    val vecs = (0 until 5).map(i => Seq.fill(4)(i.toFloat))
    val limited = Fvecs.decode(Fvecs.encode(vecs), limit = 2).toSeq
    assert(limited.size == 2)
    val corrupt = Array[Byte](9, 0, 0, 0, 1, 2) // dim=9 but 2 bytes of data
    intercept[IllegalArgumentException] { Fvecs.decode(corrupt).toSeq }
    // a header whose dim*4 overflows Int (dim = 2^29 → dim*4 = Int.Min)
    // must hit the SAME loud guard, not attempt a 2 GB allocation
    // (review finding: the old `dim * 4` comparison was vacuously true)
    val overflow = Array[Byte](0, 0, 0, 0x20, 1, 2, 3, 4) // LE dim=0x20000000
    intercept[IllegalArgumentException] { Fvecs.decode(overflow).toSeq }
  }

  test("glove txt reader parses and skips invalid lines (GloveTxtReader.cs:13-50)") {
    val dir = Files.createTempDirectory("glove")
    Files.writeString(dir.resolve("emb.txt"),
      "hello 0.1 0.2 0.3\nshort 0.1\nbad a b c\ntoolong 1 2 3 4 5\nworld -1.0 2.0 0.5\n")
    val got = GloveTxt.read(spark, dir.toString + "/emb.txt", dim = 3)
      .orderBy("token").as[(String, Seq[Float])].collect()
    assert(got.map(_._1).toSeq == Seq("hello", "world"))
    assert(got.head._2 == Seq(0.1f, 0.2f, 0.3f))
  }

  test("glove txt: blank lines are dropped, not phantom invalid records in strict mode") {
    // split("") yields [""] (size 1), so the old post-split size filter
    // never dropped blank lines and strict mode errored on the blank
    // (review finding); the drop now happens before the split
    val dir = Files.createTempDirectory("glove_blank")
    Files.writeString(dir.resolve("emb.txt"),
      "hello 0.1 0.2 0.3\n\nworld -1.0 2.0 0.5\n   \n")
    val strict = GloveTxt.read(spark, dir.toString + "/emb.txt", dim = 3,
      skipInvalid = false).orderBy("token")
      .as[(String, Seq[Float])].collect()
    assert(strict.map(_._1).toSeq == Seq("hello", "world"))
  }

  test("vector payload: JSON, CSV, and binary decode agree (VectorParsing.cs:12-35)") {
    val df = Seq(("[1.0, 2.5, -3.0]", "1.0, 2.5, -3.0")).toDF("js", "csv")
      .withColumn("fromJson", VectorPayload.parseText(col("js")))
      .withColumn("fromCsv", VectorPayload.parseText(col("csv")))
      .withColumn("bin", VectorPayload.toBinary(col("fromJson")))
      .withColumn("fromBin", VectorPayload.parseBinary(col("bin")))
    val r = df.select("fromJson", "fromCsv", "fromBin")
      .as[(Seq[Float], Seq[Float], Seq[Float])].head()
    assert(r._1 == Seq(1.0f, 2.5f, -3.0f))
    assert(r._2 == r._1 && r._3 == r._1)
  }
}
