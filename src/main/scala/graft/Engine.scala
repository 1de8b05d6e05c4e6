package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{BruteForceKnn, DeltaIndex, IvfFlat, TopK}

/** The user-facing engine: the reference's command surface (VEC.ADD /
  * VEC.UPSERT / VEC.DEL / VEC.SEARCH / index build / stats — SURVEY §3)
  * re-expressed as batch table operations over an append-only record log.
  *
  * Storage layout under `root`:
  *   records/tenant_id=?/index_name=?/...   append-only write log
  *   indexes/<tenant>/<index>/vectors/      built tail, partitioned by cluster_id
  *   indexes/<tenant>/<index>/centroids/
  *   indexes/<tenant>/<index>/manifest.json epoch + build watermark
  *
  * Write semantics mirror the reference: ADD rejects duplicate live ids
  * (VectorCommandSet.cs:605-615), UPSERT is last-write-wins preserving
  * created_at (VectorStore.cs:23-33), DEL appends a tombstone
  * (VectorStore.cs:41-58). Every write/build bumps the per-index epoch,
  * which invalidates cached results (VectorIndexRegistry.cs:52-68).
  *
  * Search consults the built tail (IVF, partition-pruned by nprobe) AND
  * the fresh head — records written after the build watermark — exactly
  * like the reference's Delta head/tail index (DeltaVectorIndex.cs:76-122).
  */
class GraftEngine(spark: SparkSession, root: String) {

  private def recordsPath = s"$root/records"
  private def indexPath(tenant: String, index: String) = s"$root/indexes/$tenant/$index"

  // -------------------------------------------------------------------
  // manifest (epoch + build watermark) — tiny JSON, driver-side
  // -------------------------------------------------------------------

  case class Manifest(epoch: Long, buildWatermark: Long, algo: String = "IVF_FLAT")

  private def manifestFile(tenant: String, index: String) =
    Paths.get(s"${indexPath(tenant, index)}/manifest.json")

  def manifest(tenant: String, index: String): Manifest = {
    val f = manifestFile(tenant, index)
    if (Files.exists(f)) {
      val s = Files.readString(f)
      def field(k: String): Long =
        raw""""$k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
      val algo = raw""""algo"\s*:\s*"([A-Z_]+)"""".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse("IVF_FLAT")
      Manifest(field("epoch"), field("buildWatermark"), algo)
    } else Manifest(0L, Long.MinValue, "IVF_FLAT")
  }

  private def writeManifest(tenant: String, index: String, m: Manifest): Unit = {
    val f = manifestFile(tenant, index)
    Files.createDirectories(f.getParent)
    Files.writeString(f,
      s"""{"epoch": ${m.epoch}, "buildWatermark": ${m.buildWatermark}, "algo": "${m.algo}"}""",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  def epoch(tenant: String, index: String): Long = manifest(tenant, index).epoch

  private def bumpEpoch(tenant: String, index: String): Unit = {
    val m = manifest(tenant, index)
    writeManifest(tenant, index, m.copy(epoch = m.epoch + 1))
  }

  // -------------------------------------------------------------------
  // write path (SURVEY §3.2)
  // -------------------------------------------------------------------

  /** Records: (tenant_id, index_name, id, vector ARRAY<FLOAT>, meta STRING,
    * tags ARRAY<STRING>, updated_at BIGINT, deleted BOOLEAN). `updated_at`
    * is a caller-supplied monotonic version (epoch-micros in practice). */
  private def appendLog(records: DataFrame): Unit =
    records
      .select("tenant_id", "index_name", "id", "vector", "meta", "tags",
        "updated_at", "deleted")
      .write.mode("append")
      .partitionBy("tenant_id", "index_name")
      .parquet(recordsPath)

  private def recordsLogExists: Boolean =
    Files.exists(Paths.get(recordsPath))

  /** VEC.ADD: reject ids that already exist live (`ERR Vector already
    * exists`, VectorCommandSet.cs:605-615). Returns the number added.
    * Only the genuinely-missing-log case skips the duplicate check — any
    * other read failure must propagate, not silently disable the
    * invariant. */
  def add(records: DataFrame): Long = {
    val existing =
      if (!recordsLogExists) null
      else currentStateAll().select("tenant_id", "index_name", "id")
    val fresh = if (existing == null) records
      else records.join(existing, Seq("tenant_id", "index_name", "id"), "left_anti")
    val n = fresh.count()
    val total = records.count()
    require(n == total, s"Vector already exists: ${total - n} duplicate id(s)")
    appendLog(fresh.withColumn("deleted", lit(false)))
    touched(records).foreach { case (t, i) => bumpEpoch(t, i) }
    n
  }

  /** VEC.UPSERT: last-write-wins append. */
  def upsert(records: DataFrame): Long = {
    val n = records.count()
    appendLog(records.withColumn("deleted", lit(false)))
    touched(records).foreach { case (t, i) => bumpEpoch(t, i) }
    n
  }

  /** VEC.DEL: append tombstones (soft delete, VectorStore.cs:41-58). */
  def delete(tenant: String, index: String, ids: Seq[String], version: Long): Unit = {
    import spark.implicits._
    val tombs = ids.toDF("id")
      .withColumn("tenant_id", lit(tenant))
      .withColumn("index_name", lit(index))
      .withColumn("vector", lit(null).cast("array<float>"))
      .withColumn("meta", lit(null).cast("string"))
      .withColumn("tags", lit(null).cast("array<string>"))
      .withColumn("updated_at", lit(version))
      .withColumn("deleted", lit(true))
    appendLog(tombs.select("tenant_id", "index_name", "id", "vector", "meta",
      "tags", "updated_at", "deleted"))
    bumpEpoch(tenant, index)
  }

  private def touched(records: DataFrame): Array[(String, String)] =
    records.select("tenant_id", "index_name").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))

  // -------------------------------------------------------------------
  // current state (upsert/tombstone resolution — SURVEY §1.5)
  // -------------------------------------------------------------------

  private def currentStateAll(): DataFrame = {
    val w = Window.partitionBy("tenant_id", "index_name", "id")
      .orderBy(col("updated_at").desc)
    spark.read.parquet(recordsPath)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("deleted"))
      .drop("rn")
  }

  def currentState(tenant: String, index: String): DataFrame =
    currentStateAll()
      .filter(col("tenant_id") === tenant && col("index_name") === index)

  // -------------------------------------------------------------------
  // build (SURVEY §3.3) — compaction into a cluster-partitioned tail
  // -------------------------------------------------------------------

  /** `algo` mirrors IndexConfig.algo (reference: Model/IndexConfig.cs:7-33;
    * defaults VectorIndexRegistry.cs:87): IVF_FLAT (default), FLAT (exact —
    * a single inverted list, i.e. nlist=1), HNSW (per-partition graphs). */
  def build(tenant: String, index: String, nlist: Int, metric: String = "L2",
            seed: Long = 42L, algo: String = "IVF_FLAT"): Unit = {
    val state = currentState(tenant, index)
    val vecs = state.select(col("id"), col("vector").as("vec"))
    val wmRow = state.agg(max("updated_at")).head
    require(!wmRow.isNullAt(0),
      s"cannot build $tenant/$index: current state is empty (all records tombstoned?)")
    val watermark = wmRow.getLong(0)
    val keyed = vecs.withColumn("id_str", col("id"))
      .select(xxhash64(col("id")).as("id"), col("vec"), col("id_str"))
    val algoU = algo.toUpperCase
    algoU match {
      case "IVF_FLAT" | "FLAT" =>
        val idx = IvfFlat.build(keyed, if (algoU == "FLAT") 1 else nlist, metric, seed)
        // keep the string id alongside the numeric surrogate used by the plans
        idx.assigned.write.mode("overwrite").partitionBy("cluster_id")
          .parquet(s"${indexPath(tenant, index)}/vectors")
        idx.centroids.write.mode("overwrite")
          .parquet(s"${indexPath(tenant, index)}/centroids")
      case "HNSW" =>
        val graphs = graft.operators.Hnsw.build(keyed.select("id", "vec"), metric,
          numPartitions = math.max(1, nlist))
        graft.operators.Hnsw.save(graphs, s"${indexPath(tenant, index)}/hnsw")
        // surrogate→string map for hit resolution
        keyed.select("id", "id_str").write.mode("overwrite")
          .parquet(s"${indexPath(tenant, index)}/idmap")
      case other => throw new IllegalArgumentException(s"unknown algo: $other")
    }
    // meta/tags snapshot for hydration without re-reading the whole log
    state.select(col("id").as("id_str"), col("meta"), col("tags"))
      .write.mode("overwrite").parquet(s"${indexPath(tenant, index)}/records")
    val m = manifest(tenant, index)
    writeManifest(tenant, index, Manifest(m.epoch + 1, watermark, algoU))
  }

  // -------------------------------------------------------------------
  // read path (SURVEY §3.1 steps 10-12)
  // -------------------------------------------------------------------

  /** Batch search. queries: (query_id BIGINT, qvec ARRAY<FLOAT>,
    * filter_tags ARRAY<STRING> optional). Returns (query_id, rank, id,
    * score[, meta]) — id is the user-facing string id.
    *
    * Plan: tail = built IVF snapshot (nprobe pruning over the
    * cluster-partitioned table) and head = log records fresher than the
    * build watermark (exact scan). Head ids mask tail rows (anti-join), so
    * the two candidate streams are disjoint and one bounded top-k covers
    * the merge. The tag filter runs BEFORE top-k (better recall than the
    * reference's post-filter — deliberate, documented divergence:
    * SURVEY §4.1); hydration joins the ≤k hit ids back to the record
    * snapshot (reference steps 10-12, VectorCommandSet.cs:457-480). */
  /** `maxScans` > 0 caps the number of scored tail candidates per query —
    * the reference's cost-ceiling / budget-degradation knob (F6,
    * BruteForceVectorIndex.cs:288-344; budget halving
    * VectorCommandSet.cs:436-456). The reference truncates its
    * insertion-order scan; a distributed table has no insertion order, so
    * the deterministic analog keeps the `maxScans` hash-smallest candidate
    * ids per query (documented divergence, COVERAGE.md). */
  /** Deterministic scan cap: keep the `maxScans` hash-smallest candidate
    * ids per query (see maxScans doc above). Applied uniformly to tail AND
    * head candidate streams. */
  private def capScans(candidates: DataFrame, maxScans: Int): DataFrame =
    if (maxScans <= 0) candidates
    else {
      val wScan = Window.partitionBy("query_id").orderBy(xxhash64(col("id_str")))
      candidates.withColumn("scan_rn", row_number().over(wScan))
        .filter(col("scan_rn") <= maxScans).drop("scan_rn")
    }

  def search(tenant: String, index: String, queries: DataFrame, k: Int,
             metric: String = "L2", nprobe: Int = 4,
             withMeta: Boolean = false, maxScans: Int = 0): DataFrame = {
    val m = manifest(tenant, index)
    val snapshot = spark.read.parquet(s"${indexPath(tenant, index)}/records")

    // head: anything written after the build watermark (fresh adds,
    // upserts AND tombstones — the latter must mask tail hits)
    val headLog = spark.read.parquet(recordsPath)
      .filter(col("tenant_id") === tenant && col("index_name") === index &&
        col("updated_at") > m.buildWatermark)
    val wHead = Window.partitionBy("id").orderBy(col("updated_at").desc)
    val headState = headLog.withColumn("rn", row_number().over(wHead))
      .filter(col("rn") === 1)
    val headIds = headState.select(col("id").as("id_str")).distinct()
    val headLive = headState.filter(!col("deleted"))
      .select(col("id").as("id_str"), col("vector").as("vec"),
        coalesce(col("tags"), array().cast("array<string>")).as("tags"),
        col("meta"))

    val baseQueries = queries.select("query_id", "qvec")

    val tagFilter = queries.columns.contains("filter_tags")

    // tail candidates per the built algo, minus ids re-written in head
    val tailScored = m.algo match {
      case "HNSW" =>
        // graphs return ranked hits already; over-fetch when a tag filter
        // will prune afterwards, the final top-k re-trims
        val graphs = graft.operators.Hnsw.load(spark, s"${indexPath(tenant, index)}/hnsw")
        val idmap = spark.read.parquet(s"${indexPath(tenant, index)}/idmap")
        val kFetch = if (tagFilter) k * 10 else k
        val hnswHits = graft.operators.Hnsw.search(graphs, baseQueries, kFetch)
          .select(col("query_id"), col("id"), col("score"))
        idmap.join(broadcast(hnswHits), Seq("id"))
          .join(broadcast(headIds.withColumn("masked", lit(true))), Seq("id_str"), "left")
          .filter(col("masked").isNull)
          .select("query_id", "id_str", "score")
      case _ => // IVF_FLAT / FLAT share the inverted-list layout
        val tailIdx = IvfFlat.Index(
          spark.read.parquet(s"${indexPath(tenant, index)}/vectors"),
          spark.read.parquet(s"${indexPath(tenant, index)}/centroids"))
        val probeSet = IvfFlat.probes(tailIdx, baseQueries, metric, nprobe)
        val tailCandidates = tailIdx.assigned
          .join(broadcast(probeSet), Seq("cluster_id"))
          .join(broadcast(headIds.withColumn("masked", lit(true))), Seq("id_str"), "left")
          .filter(col("masked").isNull)
        capScans(tailCandidates, maxScans)
          .select(col("query_id"), col("id_str"),
            graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
    }

    // head candidates: exact brute-force scan of the fresh records — capped
    // by the same deterministic maxScans budget as the tail (the reference
    // caps EVERY scan, BruteForceVectorIndex.cs:288-344, including the
    // delta head; uncapped heads would let budget degradation leak)
    val headScored = capScans(
      headLive.crossJoin(broadcast(baseQueries)), maxScans)
      .select(col("query_id"), col("id_str"),
        graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))

    val candidates = tailScored.unionByName(headScored)

    // conjunctive tag filter BEFORE ranking (F1 semantics)
    val filtered =
      if (!queries.columns.contains("filter_tags")) candidates
      else {
        val tagsOf = headLive.select(col("id_str"), col("tags"))
          .unionByName(snapshot.select(col("id_str"), col("tags"))
            .join(headIds, Seq("id_str"), "left_anti")
            .select(col("id_str"),
              coalesce(col("tags"), array().cast("array<string>")).as("tags")))
        candidates
          .join(broadcast(queries.select("query_id", "filter_tags")), "query_id")
          .join(tagsOf, Seq("id_str"), "left")
          .filter(coalesce(size(col("filter_tags")), lit(0)) === 0 ||
            forall(col("filter_tags"),
              t => array_contains(coalesce(col("tags"),
                array().cast("array<string>")), t)))
          .select("query_id", "id_str", "score")
      }

    // bounded top-k on a numeric surrogate, then map back to string ids.
    // The tiny side is always the hit list (≤ k·nq rows): restrict the
    // corpus-sized maps with a broadcast semi-join on it FIRST, then
    // broadcast the now-tiny slice — never broadcast the full id universe.
    val hits = TopK.perGroup(
      filtered.select(col("query_id"), xxhash64(col("id_str")).as("id"), col("score")),
      Seq("query_id"), k)
    val hitIds = hits.select("id").distinct()
    val idMap = snapshot.select("id_str").unionByName(headLive.select("id_str"))
      .distinct().withColumn("id", xxhash64(col("id_str")))
      .join(broadcast(hitIds), Seq("id"), "left_semi")
    val withIds = hits.join(broadcast(idMap), Seq("id"))
      .select(col("query_id"), col("rank"), col("id_str").as("id"), col("score"))
    if (!withMeta) withIds.orderBy("query_id", "rank")
    else {
      // hydration: head meta wins over snapshot meta (F4/F5)
      val metaOf = headLive.select(col("id_str"), col("meta"))
        .unionByName(snapshot.select(col("id_str"), col("meta"))
          .join(headIds, Seq("id_str"), "left_anti"))
        .join(broadcast(idMap.select("id_str")), Seq("id_str"), "left_semi")
      withIds.join(broadcast(metaOf), withIds("id") === metaOf("id_str"), "left")
        .drop("id_str").orderBy("query_id", "rank")
    }
  }

  /** VEC.STATS analog: per-index record/cluster counts. */
  def stats(tenant: String, index: String): DataFrame = {
    val assigned = spark.read.parquet(s"${indexPath(tenant, index)}/vectors")
    assigned.groupBy("cluster_id").agg(count(lit(1)).as("n_vectors"))
      .orderBy("cluster_id")
  }

  // -------------------------------------------------------------------
  // audit log (S12 — reference: Services/AuditLogger.cs, append-only)
  // -------------------------------------------------------------------

  /** Append one audit event. `ts` is caller-supplied epoch-millis so
    * replays stay deterministic. */
  def audit(actor: String, action: String, resource: String, ts: Long): Unit = {
    import spark.implicits._
    Seq((ts, actor, action, resource))
      .toDF("ts", "actor", "action", "resource")
      .write.mode("append").parquet(s"$root/audit")
  }

  def auditLog(): DataFrame = spark.read.parquet(s"$root/audit")
}
