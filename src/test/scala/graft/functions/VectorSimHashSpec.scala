package graft.functions

import scala.util.Random

import graft.SparkSpec

class VectorSimHashSpec extends SparkSpec {

  test("deterministic and scale-invariant (angle-only)") {
    val v = Seq(0.1f, -0.4f, 0.3f, 0.9f)
    val h1 = VectorSimHash.simhash64(v, 42L)
    val h2 = VectorSimHash.simhash64(v, 42L)
    assert(h1 == h2)
    val scaled = v.map(_ * 7.5f)
    assert(VectorSimHash.simhash64(scaled, 42L) == h1)
  }

  test("different seeds give different hash families") {
    val v = Seq.fill(16)(0.5f)
    assert(VectorSimHash.simhash64(v, 1L) != VectorSimHash.simhash64(v, 2L))
  }

  test("angle preservation: near vectors collide on most bits, random don't") {
    val rng = new Random(7)
    val dim = 64
    val base = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val near = base.map(x => x + (rng.nextFloat() - 0.5f) * 0.05f)
    val far = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val hb = VectorSimHash.simhash64(base.toSeq, 42L)
    val hn = VectorSimHash.simhash64(near.toSeq, 42L)
    val hf = VectorSimHash.simhash64(far.toSeq, 42L)
    assert(VectorSimHash.hamming(hb, hn) < 10,
      s"near hamming ${VectorSimHash.hamming(hb, hn)}")
    assert(VectorSimHash.hamming(hb, hf) > 16,
      s"far hamming ${VectorSimHash.hamming(hb, hf)}")
  }
}
