package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the reference's stateful loops.
  *
  * The reference runs these as processing-time polling threads
  * (SURVEY §2.8); modeling the streams with event time + watermarks gives
  * late-data semantics the reference lacks, for free.
  */
object Streams {

  case class Interaction(ts: java.sql.Timestamp, tenant: String, cluster: Int)
  case class Transition(tenant: String, prev: Int, next: Int)

  /** St1/St2/A15/W4: per-tenant "last cluster" state emitting (prev, next)
    * transition pairs as interactions arrive
    * (reference: src/Pyrope.AISidecar/prediction_engine.py:16-48 — bounded
    * state, which maps to the state timeout here; PredictivePrefetcher.cs
    * ships the events, the sidecar keeps last-cluster per tenant:index). */
  def markovTransitions(interactions: Dataset[Interaction]): Dataset[Transition] = {
    implicit val stateEnc = Encoders.scalaInt
    implicit val outEnc = Encoders.product[Transition]
    interactions
      .groupByKey(_.tenant)(Encoders.STRING)
      .flatMapGroupsWithState[Int, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tenant: String, rows: Iterator[Interaction], state: GroupState[Int]) =>
          // order within the micro-batch by event time — the reference
          // processes its queue in arrival order. State is one Int per
          // tenant; production deployments should bound tenant cardinality
          // with a timeout (the reference prunes at max_tenants,
          // prediction_engine.py:8-48).
          val ordered = rows.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var last = state.getOption
          ordered.foreach { r =>
            last.foreach(p => out += Transition(tenant, p, r.cluster))
            last = Some(r.cluster)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Prefetch-rule extraction over accumulated transitions (batch step of
    * the 60 s training loop, prediction_engine.py:50-72): most-common next
    * per (tenant, prev), admitted at count ≥ minCount. */
  def extractRules(transitions: DataFrame, minCount: Long = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("tenant", "prev")
      .orderBy(col("cnt").desc, col("next"))
    transitions
      .groupBy("tenant", "prev", "next").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("cnt") >= minCount)
      .select("tenant", "prev", "next", "cnt")
  }

  /** A12/St7: event-time write-heat — tumbling 1-minute windows with a
    * watermark; hot when > threshold writes/min
    * (reference: SemanticClusterRegistry.cs:72-121, processing-time there). */
  def writeHeat(events: DataFrame, hotThreshold: Int = 10): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("tenant"), col("cluster"))
      .agg(count(lit(1)).as("n_writes"))
      .withColumn("hot", col("n_writes") > hotThreshold)
      .select(col("window.start").as("window_start"), col("tenant"),
        col("cluster"), col("n_writes"), col("hot"))

  case class SloSample(tenant: String, minute: Long, p99: Double)
  case class SloStatus(tenant: String, minute: Long, p99: Double, degraded: Boolean)

  /** St6: SLO guardrail state machine with hysteresis — degrade when p99 >
    * target, recover only when p99 ≤ 0.8·target
    * (reference: SloGuardrailsMonitor.cs:33-78, SloGuardrails.cs:25-56). */
  def sloMonitor(samples: Dataset[SloSample], target: Double): Dataset[SloStatus] = {
    implicit val stateEnc = Encoders.scalaBoolean
    implicit val outEnc = Encoders.product[SloStatus]
    samples
      .groupByKey(_.tenant)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, SloStatus](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tenant: String, rows: Iterator[SloSample], state: GroupState[Boolean]) =>
          var degraded = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_.minute).map { s =>
            if (!degraded && s.p99 > target) degraded = true
            else if (degraded && s.p99 <= target * 0.8) degraded = false
            SloStatus(tenant, s.minute, s.p99, degraded)
          }
          state.update(degraded)
          out.iterator
      }
  }
}
