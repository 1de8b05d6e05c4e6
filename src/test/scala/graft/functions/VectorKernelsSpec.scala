package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col => c}

import graft.SparkSpec

/** Kernel correctness vs hand-computed oracles — mirrors the reference's
  * VectorMathTests (tests/Pyrope.GarnetServer.Tests/Vector/VectorMathTests.cs). */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("dot product") {
    val r = df2(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(vector_dot(c("a"), c("b"))).head.getDouble(0)
    assert(math.abs(r - 32.0) < eps)
  }

  test("l2 squared") {
    val r = df2(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))
      .select(vector_l2sq(c("a"), c("b"))).head.getDouble(0)
    assert(math.abs(r - 2.0) < eps)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val same = df2(Seq(1f, 2f, 3f), Seq(2f, 4f, 6f))
      .select(vector_cosine(c("a"), c("b"))).head.getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
    val orth = df2(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))
      .select(vector_cosine(c("a"), c("b"))).head.getDouble(0)
    assert(math.abs(orth) < eps)
  }

  test("cosine guards near-zero norms (reference VectorMath.cs:102-125)") {
    val r = df2(Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))
      .select(vector_cosine(c("a"), c("b"))).head.getDouble(0)
    assert(r == 0.0)
  }

  test("norm") {
    val r = Seq(Tuple1(Seq(3f, 4f))).toDF("a")
      .select(vector_norm(c("a"))).head.getDouble(0)
    assert(math.abs(r - 5.0) < eps)
  }

  test("dimension mismatch throws (reference dim check, VectorCommandSet.cs:179-183)") {
    val ex = intercept[Exception] {
      df2(Seq(1f, 2f), Seq(1f, 2f, 3f)).select(vector_dot(c("a"), c("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("metric-aware score conventions: higher is better, L2 negated") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f)), // exact match of query
      (2L, Seq(0f, 1f, 0f))  // orthogonal
    ).toDF("id", "vec")
    val q = Seq(Tuple1(Seq(1f, 0f, 0f))).toDF("qvec")
    val scored = df.crossJoin(q)
      .select(c("id"), vector_score("L2", c("qvec"), c("vec")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) == 0.0)
    assert(scored(2L) == -2.0)
    assert(scored(1L) > scored(2L)) // higher is better
  }

  test("SQL registration works") {
    registerAll(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .head.getDouble(0)
    assert(math.abs(r - 11.0) < eps)
  }

  test("double accumulation over many elements is stable") {
    val n = 1000
    val a = (1 to n).map(_ => 0.1f)
    val expected = a.map(_.toDouble).map(x => x * x).sum
    val r = Seq((a, a)).toDF("a", "b")
      .select(vector_dot(c("a"), c("b"))).head.getDouble(0)
    assert(math.abs(r - expected) < 1e-12)
  }
}
