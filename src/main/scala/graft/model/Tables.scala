package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (see TESTDATA.md). */
object Tables {

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark only reads via the
    * nanosAsLong escape hatch; downstream code treats `ts` as epoch-nanos
    * BIGINT and derives windows with integer arithmetic (exact, and
    * identical to DuckDB's `epoch_ns`). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact-money helper: doubles → integer cents via floor(x*100+0.5).
    * Both Spark and DuckDB evaluate this identically on the same IEEE
    * doubles, so SUMs become exact integer arithmetic instead of
    * order-dependent floating-point accumulation. */
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")

  /** Same trick at 1e-4 resolution (rates/discounts → basis points). */
  def bps(c: Column): Column = floor(c * lit(10000) + lit(0.5)).cast("long")
}
