package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FAISS `.fvecs` reader: each record is int32 dim (LE) followed by dim
  * float32 (LE).
  *
  * Capability mirror of the reference's dataset reader
  * (reference: src/Pyrope.Benchmarks/Datasets/FvecsReader.cs:14-58),
  * Spark-first: `binaryFile` source + per-file decode, so a directory of
  * fvecs shards parallelizes per file. Row ids are (file-ordinal-offset +
  * in-file index) when reading a single file; for multi-file reads ids are
  * per-file indexes paired with the path.
  */
object Fvecs {

  def decode(bytes: Array[Byte], limit: Int = Int.MaxValue): Iterator[(Long, Seq[Float])] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Seq[Float])] {
      private var i = 0L
      override def hasNext: Boolean = i < limit && buf.remaining() >= 4
      override def next(): (Long, Seq[Float]) = {
        val dim = buf.getInt()
        // dim.toLong: a corrupt header near 2^29 overflows `dim * 4`
        // NEGATIVE, making the remaining() check vacuously true and the
        // guard's loud error an OOM on a 2 GB allocation instead
        require(dim > 0 && buf.remaining() >= dim.toLong * 4,
          s"corrupt fvecs record at index $i: dim=$dim remaining=${buf.remaining()}")
        val v = new Array[Float](dim)
        var j = 0
        while (j < dim) { v(j) = buf.getFloat(); j += 1 }
        val r = (i, v.toSeq)
        i += 1
        r
      }
    }
  }

  /** Read fvecs file(s) → (path, id, vec). */
  def read(spark: SparkSession, path: String, limit: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => decode(bytes, limit).map { case (i, v) => (p, i, v) } }
      .toDF("path", "id", "vec")
  }

  /** Encode float vectors to fvecs bytes (reference
    * Benchmarks/Encoding/VectorEncoding.cs:9-17 LE float layout). */
  def encode(vectors: Seq[Seq[Float]]): Array[Byte] = {
    val total = vectors.map(v => 4 + v.length * 4).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vectors.foreach { v =>
      buf.putInt(v.length)
      v.foreach(buf.putFloat)
    }
    buf.array()
  }
}
