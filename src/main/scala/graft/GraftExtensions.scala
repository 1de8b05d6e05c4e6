package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{VectorCosine, VectorDot, VectorL2Sq, VectorNorm}

/** Catalyst integration point: inject the vector expression library into
  * any SparkSession via the standard extensions mechanism —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * after which `SELECT vector_cosine(a, b)` works in plain SQL and goes
  * through whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")
    e.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two float vectors"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vector_l2sq"),
      info("vector_l2sq", "vector_l2sq(a, b) - squared L2 distance"),
      (es: Seq[Expression]) => VectorL2Sq(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine similarity"),
      (es: Seq[Expression]) => VectorCosine(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vector_norm"),
      info("vector_norm", "vector_norm(a) - euclidean norm"),
      (es: Seq[Expression]) => VectorNorm(es.head)))
  }
}
