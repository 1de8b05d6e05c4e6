package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "image", Array.tabulate(600)(i => (i % 251).toByte)),
    (2L, "audio", Array[Byte](10, 20, 30)),
    (3L, "video", Array.empty[Byte])
  ).toDF("id", "modality", "bytes")

  test("featurize runs the mapPartitions decode path with deterministic stub features") {
    val got = Multimodal.featurize(media).orderBy("id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_bytes") == 600)
    assert(r1.getAs[Int]("head_byte") == 0)
    assert(r1.getAs[Long]("frame_count") == 3) // ceil(600/256)
    assert(r1.getAs[Long]("checksum") ==
      Array.tabulate(600)(i => (i % 251).toLong).sum)
    assert(got(2).getAs[Int]("head_byte") == -1) // empty payload
    assert(got(2).getAs[Long]("frame_count") == 0) // empty -> no frames
  }

  test("featurize twice gives identical output (stub codec is deterministic)") {
    val a = Multimodal.featurize(media, parallelism = 3).orderBy("id").collect()
    val b = Multimodal.featurize(media).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("sampleFrames slices 256-byte frames with stride") {
    val frames = Multimodal.sampleFrames(media.filter(col("id") === 1), stride = 2)
      .orderBy("frame_no").collect()
    // 600 bytes → 3 frames (0,1,2); stride 2 → frames 0 and 2
    assert(frames.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 2L))
    assert(frames(0).getAs[Array[Byte]]("frame").length == 256)
    assert(frames(1).getAs[Array[Byte]]("frame").length == 600 - 512)
  }

  test("resize: nearest-neighbor byte pick to target; short payloads pass through") {
    import spark.implicits._
    val bytes = Array.tabulate(200)(i => i.toByte)
    val media = Seq((1L, "image", bytes), (2L, "image", Array[Byte](1, 2, 3)))
      .toDF("id", "modality", "bytes")
    val got = Multimodal.resize(media, target = 50).orderBy("id").collect()
    val r1 = got(0).getAs[Array[Byte]]("resized")
    assert(r1.length == 50)
    // out(i) = bytes(i*200/50) = bytes(4i)
    (0 until 50).foreach(i => assert(r1(i) == (4 * i).toByte))
    assert(got(1).getAs[Array[Byte]]("resized").toSeq == Seq[Byte](1, 2, 3))
  }
}
