package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-injected SQL functions resolve and evaluate") {
    // fresh session name-space so the injection is what's under test
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT vector_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |                  array(cast(3.0 as float), cast(4.0 as float))) AS d,
          |       vector_cosine(array(cast(1.0 as float), cast(0.0 as float)),
          |                     array(cast(1.0 as float), cast(0.0 as float))) AS c,
          |       vector_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n
          |""".stripMargin).head
      assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(2) - 5.0) < 1e-9)
    } finally {
      // don't stop(): the context is shared with the other suites
    }
  }
}
