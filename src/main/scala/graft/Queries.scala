package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.model.Tables
import graft.operators.{BruteForceKnn, TopK}

/** The operator inventory exposed through [[SparkEntry]]: each entry is a
  * named DataFrame plan over the driver testdata plus (where ANSI-SQL
  * expressible) a DuckDB oracle producing the identical result.
  *
  * Numeric-compare policy (so DuckDB hash checks are exact, not "close"):
  *   - money/rate sums go through integer cents/bp (Tables.cents/bps);
  *   - vector scores are double-accumulated in the same element order as
  *     DuckDB's list functions and rounded to 6 dp on both sides;
  *   - raw double columns are only ever *selected*, never re-accumulated.
  */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // Standard 8-query view of the embeddings table as a search workload:
  // the first 8 vectors play the query batch, everything is a candidate.
  private val NQueries = 8
  private val K = 10

  private def vectorsOf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queriesOf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  private def knnSql(scoreExpr: String, withScore: Boolean): String = {
    val scoreCol = if (withScore) ", round(score, 6) AS score" else ""
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < $NQueries
       |), s AS (
       |  SELECT q.query_id, e.vec_id AS id, $scoreExpr AS score
       |  FROM embeddings e CROSS JOIN q
       |), r AS (
       |  SELECT query_id, id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS INTEGER) AS rank
       |  FROM s
       |)
       |SELECT query_id, rank, id$scoreCol FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Vector search surface (reference: VEC.SEARCH read path, SURVEY §3.1)
  // ---------------------------------------------------------------------

  /** Brute-force top-k by inner product (reference metric InnerProduct,
    * src/Pyrope.GarnetServer/Vector/IVectorIndex.cs:5-10). */
  val knnDot: QueryFn = (s, dir) =>
    BruteForceKnn.knn(vectorsOf(s, dir), queriesOf(s, dir), "IP", K)
      .withColumn("score", round(col("score"), 6))
      .orderBy("query_id", "rank")

  val knnDotSql: String =
    knnSql("list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[])", withScore = true)

  /** Brute-force top-k by cosine similarity. */
  val knnCosine: QueryFn = (s, dir) =>
    BruteForceKnn.knn(vectorsOf(s, dir), queriesOf(s, dir), "COSINE", K)
      .withColumn("score", round(col("score"), 6))
      .orderBy("query_id", "rank")

  val knnCosineSql: String =
    knnSql("list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[])", withScore = true)

  /** Brute-force top-k by L2 (score = -distance²; rank-only output since
    * DuckDB's list_distance applies a sqrt we don't). */
  val knnL2: QueryFn = (s, dir) =>
    BruteForceKnn.knn(vectorsOf(s, dir), queriesOf(s, dir), "L2", K)
      .drop("score")
      .orderBy("query_id", "rank")

  val knnL2Sql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < $NQueries
       |), s AS (
       |  SELECT q.query_id, e.vec_id AS id,
       |         -list_distance(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) AS score
       |  FROM embeddings e CROSS JOIN q
       |), r AS (
       |  SELECT query_id, id,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS INTEGER) AS rank
       |  FROM s
       |)
       |SELECT query_id, rank, id FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // Relational / governance analytics (SURVEY §2.4)
  // ---------------------------------------------------------------------

  /** Pricing-summary style aggregation (billing-accumulation analog, A11). */
  val q1Pricing: QueryFn = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(Tables.cents(col("l_extendedprice"))).as("sum_price_cents"),
        sum(Tables.bps(col("l_discount"))).as("sum_disc_bp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
      |       CAST(sum(CAST(floor(l_discount*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Current-state view: last-write-wins per key with deterministic
    * tie-break (reference upsert semantics, VectorStore.cs:23-33 /
    * SURVEY §1.5 current-state view). */
  val currentState: QueryFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  val currentStateSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Latency histogram buckets (reference MetricsCollector 6-bucket
    * histogram, Services/MetricsCollector.cs:39-53), over events.value. */
  val latencyHistogram: QueryFn = (s, dir) =>
    t(s, dir, "events")
      .withColumn("bucket",
        when(col("value") < 1, "b0_lt1")
          .when(col("value") < 5, "b1_lt5")
          .when(col("value") < 10, "b2_lt10")
          .when(col("value") < 50, "b3_lt50")
          .when(col("value") < 100, "b4_lt100")
          .otherwise("b5_ge100"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val latencyHistogramSql: String =
    """SELECT CASE WHEN value < 1 THEN 'b0_lt1' WHEN value < 5 THEN 'b1_lt5'
      |            WHEN value < 10 THEN 'b2_lt10' WHEN value < 50 THEN 'b3_lt50'
      |            WHEN value < 100 THEN 'b4_lt100' ELSE 'b5_ge100' END AS bucket,
      |       count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-second QPS windows per event type (reference per-tenant 1 s QPS
    * window, Services/TenantQuotaEnforcer.cs:137-158). `ts` is epoch-nanos. */
  val qpsWindow: QueryFn = (s, dir) =>
    t(s, dir, "events")
      .withColumn("sec", expr("ts div 1000000000"))
      .groupBy("sec", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("sec", "event_type")

  val qpsWindowSql: String =
    """SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Markov transition counting over per-user event sequences (reference
    * prefetch transition mining, src/Pyrope.AISidecar/prediction_engine.py:16-72). */
  val markovTransitions: QueryFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("prev", "next")
  }

  val markovTransitionsSql: String =
    """SELECT prev, next, count(*) AS cnt FROM (
      |  SELECT user_id, event_type AS next,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events
      |) WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Prefetch-rule extraction: most common next-state per state, admitted
    * at count ≥ 3 (reference prediction_engine.py:60-66). */
  val markovRules: QueryFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wr = Window.partitionBy("prev").orderBy(col("cnt").desc, col("next"))
    t(s, dir, "events")
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1 && col("cnt") >= 3)
      .select("prev", "next", "cnt")
      .orderBy("prev")
  }

  val markovRulesSql: String =
    """SELECT prev, next, cnt FROM (
      |  SELECT prev, next, cnt,
      |         row_number() OVER (PARTITION BY prev ORDER BY cnt DESC, next) AS rn
      |  FROM (
      |    SELECT prev, next, count(*) AS cnt FROM (
      |      SELECT event_type AS next,
      |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |      FROM events
      |    ) WHERE prev IS NOT NULL GROUP BY 1, 2
      |  )
      |) WHERE rn = 1 AND cnt >= 3 ORDER BY prev""".stripMargin

  // ---------------------------------------------------------------------
  // Training-data pipeline: dedup + text analysis (builder-prompt surface)
  // ---------------------------------------------------------------------

  /** Exact deduplication by content hash: keep lowest doc_id per distinct
    * text (hash-groupBy dedup). */
  val dedupExact: QueryFn = (s, dir) =>
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .orderBy("keep_id")

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Whitespace token count per document. */
  val tokenCount: QueryFn = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, QueryFn] = Map(
    "knn_dot" -> knnDot,
    "knn_cosine" -> knnCosine,
    "knn_l2" -> knnL2,
    "q1_pricing" -> q1Pricing,
    "current_state" -> currentState,
    "latency_histogram" -> latencyHistogram,
    "qps_window" -> qpsWindow,
    "markov_transitions" -> markovTransitions,
    "markov_rules" -> markovRules,
    "dedup_exact" -> dedupExact,
    "token_count" -> tokenCount,
  )

  val oracles: Map[String, String] = Map(
    "knn_dot" -> knnDotSql,
    "knn_cosine" -> knnCosineSql,
    "knn_l2" -> knnL2Sql,
    "q1_pricing" -> q1PricingSql,
    "current_state" -> currentStateSql,
    "latency_histogram" -> latencyHistogramSql,
    "qps_window" -> qpsWindowSql,
    "markov_transitions" -> markovTransitionsSql,
    "markov_rules" -> markovRulesSql,
    "dedup_exact" -> dedupExactSql,
    "token_count" -> tokenCountSql,
  )
}
