package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GloVe text-format reader: `token v1 v2 ... vN` whitespace-separated,
  * one embedding per line.
  *
  * Capability mirror of the reference's reader
  * (reference: src/Pyrope.Benchmarks/Datasets/GloveTxtReader.cs:13-50)
  * including the skip-invalid behavior: lines whose arity or floats don't
  * parse are dropped when `skipInvalid`, errored otherwise. Declarative
  * `spark.read.text` + split/cast keeps the scan parallel and pushdown-
  * friendly.
  */
object GloveTxt {

  def read(spark: SparkSession, path: String, dim: Int,
           skipInvalid: Boolean = true): DataFrame = {
    val lines = spark.read.text(path)
      // blank-line drop must happen BEFORE split: splitting "" yields
      // [""] (size 1), so a size-based filter after the split never
      // fires and a blank line reaches strict mode as a phantom
      // invalid record with an empty token
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("parts"))
    val shaped = lines
      .select(
        col("parts").getItem(0).as("token"),
        size(col("parts")).as("n_parts"),
        slice(col("parts"), 2, dim).as("raw"))
      .withColumn("vec", transform(col("raw"), x => x.try_cast("float")))
      // exact arity required: an over-long line would otherwise pass with
      // a silently truncated vector (the reference drops it)
      .withColumn("valid",
        col("n_parts") === dim + 1 && !exists(col("vec"), _.isNull))
    if (skipInvalid) shaped.filter(col("valid")).select("token", "vec")
    else {
      // strict mode: surface the first bad line as an error at action time
      shaped.select(col("token"),
        when(col("valid"), col("vec"))
          .otherwise(raise_error(concat(lit("invalid glove line for token: "),
            col("token")))).as("vec"))
    }
  }
}
