package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Sign-random-projection LSH (SimHash) over float vectors.
  *
  * Capability mirror of the reference's LshService
  * (reference: src/Pyrope.GarnetServer/Services/LshService.cs:21-70): 64
  * random hyperplanes, fingerprint bit b = sign(v · r_b). The reference
  * seeds .NET Random(seed+dim); bit parity with that is impossible and
  * pointless (SURVEY §7.3) — we derive Rademacher ±1 projections from
  * [[StableHash]] so the family is deterministic, seedable, and identical
  * on every executor without shipping a matrix.
  */
object VectorSimHash {

  /** fingerprint bit b = sign( Σ_i v(i) · (±1 from hash(seed,b,i)) ).
    * The input is copied to a primitive array FIRST: the Seq that Spark's
    * UDF conversion hands over can have O(n) positional access, and this
    * kernel indexes it 64×dim times — measured 3.2 ms/row through the UDF
    * vs 46 µs on an array (O(dim²) wrapper tax, not hashing cost). */
  def simhash64(v: Seq[Float], seed: Long): Long = {
    val a = graft.functions.floatArray(v)
    var fp = 0L
    var b = 0
    while (b < 64) {
      val base = StableHash.mix64(seed ^ StableHash.mix64(b.toLong))
      var s = 0.0
      var i = 0
      while (i < a.length) {
        val sign = if ((StableHash.mix64(base ^ i.toLong) & 1L) == 1L) 1.0 else -1.0
        s += sign * a(i)
        i += 1
      }
      if (s >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def simhashCol(vec: Column, seed: Long = 42L): Column =
    // null propagates as SQL NULL (a boxed-null Long return) instead of
    // NPE-ing the task — the native expressions are nullSafeEval and
    // the UDF form must match
    udf((v: Seq[Float]) =>
      if (v == null) null
      else java.lang.Long.valueOf(simhash64(v, seed))).apply(vec)

  def hamming(a: Long, b: Long): Int = StableHash.popcount(a ^ b)
}
