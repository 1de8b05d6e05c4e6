package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Vector payload decoding: JSON array, CSV, or raw float32-LE binary.
  *
  * Capability mirror of the reference's wire-format sniffer
  * (reference: src/Pyrope.GarnetServer/Utils/VectorParsing.cs:12-35 — tries
  * JSON when the payload starts with '[', else CSV, else raw binary).
  */
object VectorPayload {

  /** Decode a string payload: JSON `[1.0,2.0]` or CSV `1.0,2.0`. */
  def parseText(c: Column): Column =
    when(startswith(trim(c), lit("[")),
      from_json(c, ArrayType(FloatType)))
      .otherwise(transform(split(c, ","), x => trim(x).cast("float")))

  /** Decode raw little-endian float32 bytes. */
  def parseBinary(c: Column): Column = {
    val dec = udf { (bytes: Array[Byte]) =>
      require(bytes.length % 4 == 0, s"binary vector length ${bytes.length} not multiple of 4")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = buf.getFloat(); i += 1 }
      out.toSeq
    }
    dec(c)
  }

  /** Encode to raw little-endian float32 bytes
    * (reference: Benchmarks/Encoding/VectorEncoding.cs:9-17). */
  def toBinary(c: Column): Column = {
    val enc = udf { (v: Seq[Float]) =>
      val buf = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(buf.putFloat)
      buf.array()
    }
    enc(c)
  }
}
