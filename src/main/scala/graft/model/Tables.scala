package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md). */
object Tables {

  /** Loads a testdata table, normalizing `events.ts` to epoch-nanos BIGINT
    * (see [[normalizeEventTs]]) so every downstream window derivation stays
    * integer arithmetic — exact, and identical to DuckDB's `epoch_ns(ts)`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // If the file is TIMESTAMP(NANOS), read it losslessly as epoch-nanos
      // long instead of truncating to micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver's testdata generator has shipped `events.ts` in two physical
    * shapes across rounds: parquet TIMESTAMP(NANOS) (read as epoch-nanos
    * BIGINT via the nanosAsLong flag) and TIMESTAMP(MICROS) (read as a
    * timestamp). Normalize both to epoch-nanos BIGINT at the load boundary
    * so query code is schema-drift-proof. Sessions here run with
    * `spark.sql.session.timeZone=UTC`, so the NTZ→instant cast matches
    * DuckDB's UTC interpretation of naive parquet timestamps. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(LongType) => df
      // anything else (int32 can't hold epoch-nanos, so it would carry
      // some OTHER unit) fails loudly — silently reinterpreting it is the
      // exact drift class this normalizer exists to prevent
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }

  /** Exact-money helper: doubles → integer cents via floor(x*100+0.5).
    * Both Spark and DuckDB evaluate this identically on the same IEEE
    * doubles, so SUMs become exact integer arithmetic instead of
    * order-dependent floating-point accumulation. */
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")

  /** Same trick at 1e-4 resolution (rates/discounts → basis points). */
  def bps(c: Column): Column = floor(c * lit(10000) + lit(0.5)).cast("long")
}
