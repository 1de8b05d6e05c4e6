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
  *   records/tenant_id=?/index_name=?/...    append-only write log
  *   indexes/<tenant>/<index>/manifest.json  epoch + watermark + version (commit point)
  *   indexes/<tenant>/<index>/v<N>/...       immutable build snapshot N:
  *     vectors/ (cluster-partitioned tail) + centroids/ + records/
  *     [hnsw/ + idmap/ | ivfpq/{codes,centroids,codebooks}] per algo
  *   cache/<tenant>/<index>/entries|aliases  result-cache tables
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
/** Per-call observability record for the rows-serving entries — the
  * reference attaches TRACE JSON fields to each reply
  * (VectorCommandSet.cs:849-912); this is the library-call analog.
  * `path`: which serving tier answered ("head+tail" zero-job,
  * "plan-fallback" DataFrame plan, or "cache-hit"/"cache-miss").
  * `cacheLayer`: the cascade layer that hit (L0/L0.5/L1/L2), if any.
  * `probedLayers`: cache layers probed in order, cached calls only.
  * `headLive`/`headMasked`/`tailRows`: serving-state counts scanned by
  * the call (−1 = not applicable on this path).
  * `totalMicros`: call wall time. */
case class SearchTrace(path: String, cacheLayer: Option[String],
                       probedLayers: Seq[String], headLive: Int,
                       headMasked: Int, tailRows: Int, totalMicros: Long)

object GraftEngine {
  /** Per-index manifest monitors, JVM-global (keyed by root so two engine
    * instances over the same layout share one): every manifest
    * read-modify-write serializes on this, closing the TOCTOU window where
    * a concurrent writer (e.g. an upsertStream micro-batch on another
    * thread) bumps the epoch between a commit's re-read and its rename —
    * which would let build commit headDirty=0 and hide the fresh rows. */
  private val manifestLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(root: String, tenant: String, index: String): Object =
    manifestLocks.getOrElseUpdate(s"$root#$tenant/$index", new Object)

  /** Default per-snapshot residency bound for the rows tier's [[IdPool]]
    * (compact surrogate → id map): 512 MB covers ~25M ids at typical id
    * lengths — the same ceiling class as the packed-codes/graph tiers. */
  val IdPoolMaxBytesDefault: Long = 512L << 20

  /** JVM-wide ceiling across ALL resident id pools; engines share it the
    * way resident PQ codes share [[graft.operators.IvfPq.PackedCodesGlobalMaxBytes]].
    * WEAK-keyed by the pool itself (same accounting as the PQ registry):
    * handle eviction removes a pool's share explicitly, and an engine
    * instance dropped without eviction returns its share on GC — a plain
    * counter would leak those bytes for the JVM's lifetime and starve
    * later pools. */
  val IdPoolGlobalMaxBytes: Long = 1024L << 20
  private val idPoolRegistry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, java.lang.Long]())

  /** Per-index ceiling for the resident SQ16 rerank store (2·dim bytes/
    * vec over the RAW vectors — 10M×128 ≈ 2.6 GB, 20M ≈ 5.3 GB, still
    * half the floats): its OWN budget line, deliberately not the id-pool
    * budget — a refine store drawing on the pool budget would starve
    * pools/tag indexes (the r7 ADVICE hazard class). uint16 rather than
    * uint8 because the refine step's whole purpose is near-exact
    * answers: uint8's error measurably reorders near-equidistant top-k
    * boundaries (gauge recall 0.980 vs 0.995 exact); uint16's is 256×
    * smaller and prices at exact.
    *
    * DERIVED from the running JVM's heap, not a constant: 1/4 of
    * `Runtime.maxMemory`, capped at 8 GiB. On the repo's 32 GiB serving
    * JVM (build.sbt's default -Xmx) that is the same 8 GiB the refine
    * tier was sized for (reaching the ~20M×128 corpora the rows gate
    * admits); an embedded deployment on a 4 GiB heap that forgets to
    * pass `sq16MaxBytes` now defaults to 1 GiB and takes the plan
    * fallback instead of OOMing on a budget sized for someone else's
    * heap (ADVICE r9). The store is segmented, so the budget is the
    * ONLY ceiling; deployments override per engine via `sq16MaxBytes`. */
  val Sq16MaxBytesDefault: Long =
    math.min(8192L << 20, Runtime.getRuntime.maxMemory / 4)

  /** JVM-wide ceiling across ALL resident SQ16 stores — weak-keyed like
    * the other residency registries (eviction returns a share explicitly;
    * a dropped engine returns it on GC). 1.5× the per-index default
    * (heap-derived like it: 3/8 of max heap, capped at 12 GiB — ~37% of
    * the default 32 GiB heap): one full-size store plus change, the
    * aggregate stop that keeps N engines from each admitting a
    * budget-legal store into one JVM. Overridable for deployments whose
    * heap headroom differs from the default fraction via
    * `-Dgraft.sq16.globalMaxBytes=<bytes>` (read once at class init —
    * the registry's ceiling must not move while stores are resident). */
  val Sq16GlobalMaxBytes: Long =
    sys.props.get("graft.sq16.globalMaxBytes").map { s =>
      // named error: a bad value would otherwise surface as an opaque
      // ExceptionInInitializerError from this object's static init
      val v =
        try s.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"-Dgraft.sq16.globalMaxBytes must be a plain byte count, got '$s'")
        }
      // a zero/negative ceiling would silently deny every refine store
      // (used + est <= 0 never holds) instead of failing at init like
      // the NumberFormat case (ADVICE r10)
      if (v <= 0) throw new IllegalArgumentException(
        s"-Dgraft.sq16.globalMaxBytes must be positive, got '$s'")
      v
    }.getOrElse(
      math.min(12288L << 20, Runtime.getRuntime.maxMemory * 3 / 8))
  private val sq16Registry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, java.lang.Long]())
  private[graft] def sq16BytesUsed: Long = {
    val it = sq16Registry.synchronized {
      new java.util.ArrayList(sq16Registry.values())
    }
    var s = 0L
    it.forEach(v => s += v.longValue())
    s
  }
  private[graft] def registerSq16(h: AnyRef, bytes: Long): Unit =
    sq16Registry.put(h, java.lang.Long.valueOf(bytes))
  private[graft] def unregisterSq16(h: AnyRef): Unit =
    sq16Registry.remove(h)
  /** Atomic check-and-reserve against the global refine-store line:
    * returns a placeholder token holding `bytes` when headroom exists,
    * None otherwise. Callers build under the reservation and swap to the
    * real store (register store, unregister token) — closing the TOCTOU
    * where two concurrent admissions both pass the same `sq16BytesUsed`
    * pre-check and overshoot the ceiling together (ADVICE r10). The
    * whole check+put runs under the registry's own monitor (the
    * synchronizedMap wrapper — reentrant with [[sq16BytesUsed]]). */
  private[graft] def tryReserveSq16(bytes: Long): Option[AnyRef] =
    sq16Registry.synchronized {
      if (sq16BytesUsed + bytes <= Sq16GlobalMaxBytes) {
        val token = new Object
        sq16Registry.put(token, java.lang.Long.valueOf(bytes))
        Some(token)
      } else None
    }

  /** Per-part AND of two aligned row-position bitmap sets (the
    * multi-tag conjunction on the resident tier). */
  private[graft] def andBits(a: Array[Array[Long]],
                             b: Array[Array[Long]]): Array[Array[Long]] = {
    require(a.length == b.length, "bitmap part count mismatch")
    Array.tabulate(a.length) { p =>
      val x = a(p); val y = b(p)
      require(x.length == y.length, "bitmap word count mismatch")
      val out = new Array[Long](x.length)
      var i = 0
      while (i < x.length) { out(i) = x(i) & y(i); i += 1 }
      out
    }
  }
  private[graft] def idPoolBytesUsed: Long = {
    val it = idPoolRegistry.synchronized {
      new java.util.ArrayList(idPoolRegistry.values())
    }
    var s = 0L
    it.forEach(v => s += v.longValue())
    s
  }
  private[graft] def registerResident(h: AnyRef, bytes: Long): Unit =
    idPoolRegistry.put(h, java.lang.Long.valueOf(bytes))
  private[graft] def unregisterResident(h: AnyRef): Unit =
    idPoolRegistry.remove(h)
}

/** `refineU8Fallback` (OPT-IN, default off): when the sq16 refine
  * store is budget-denied but a HALF-SIZE uint8 copy fits, serve
  * refined rows from the u8 store instead of dropping to the
  * distributed plan — the degraded tier trades measured recall
  * (~0.980 vs 0.995 on the bench gauge) for three orders of latency.
  * Off by default because served scores then differ from the plan's
  * sq16 rerank; the serving trace announces the tier
  * ("head+pqtail-refined-u8"). */
class GraftEngine(spark: SparkSession, root: String,
                  idPoolMaxBytes: Long = GraftEngine.IdPoolMaxBytesDefault,
                  hashAllowedMinEntries: Int = 1 << 17,
                  pqServeMaxLookupsMT: Long =
                    graft.operators.IvfPq.PqServeMaxLookupsMT,
                  sq16MaxBytes: Long = GraftEngine.Sq16MaxBytesDefault,
                  refineU8Fallback: Boolean = false,
                  sq16IgnoreSidecar: Boolean = false) {
  // sq16IgnoreSidecar: serve the refine store via the wave-fetch build
  // even when the snapshot carries the binary segment sidecar — an
  // attribution/ops escape hatch (A/B the two load paths on one
  // corpus, or serve a snapshot whose sidecar is suspected corrupt
  // without deleting it). Content is bit-identical either way
  // (Sq16StoreSpec pins the roundtrip); only load cost differs.

  private def withManifestLock[T](tenant: String, index: String)(f: => T): T =
    GraftEngine.lockFor(root, tenant, index).synchronized(f)

  private def recordsPath = s"$root/records"
  private def indexPath(tenant: String, index: String) = s"$root/indexes/$tenant/$index"

  /** Declared log schema: reads never infer from a sampled footer, so a
    * log mixing pre-`numeric_fields` files with new ones stays
    * deterministic (absent columns read as null) without mergeSchema's
    * all-footers cost. */
  private val recordSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType)),
      StructField("meta", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("numeric_fields", MapType(StringType, DoubleType)),
      StructField("updated_at", LongType),
      StructField("deleted", BooleanType),
      StructField("tenant_id", StringType),
      StructField("index_name", StringType)))
  }

  private def readLog(): DataFrame =
    spark.read.schema(recordSchema).parquet(recordsPath)

  // -------------------------------------------------------------------
  // manifest (epoch + build watermark) — tiny JSON, driver-side
  // -------------------------------------------------------------------

  /** `version` points at the snapshot directory (`v<version>/`) holding
    * this build's artifacts: readers resolve paths THROUGH the manifest, so
    * a build writes its whole snapshot into a fresh versioned dir and the
    * single manifest write is the atomic commit point — the snapshot-
    * isolation form of the reference's temp-dir-rename atomic snapshot
    * (DeltaVectorIndex.cs:160-212). version 0 = never built. */
  /** `headDirty` = 1 when the record log may hold rows newer than the
    * build watermark (any write since the last build/compaction); 0 right
    * after a build. Lets the search plan skip the whole fresh-head subtree
    * (log scan, LWW window, mask anti-joins) when the tail is known
    * current — the overwhelmingly common read regime of a serving index. */
  case class Manifest(epoch: Long, buildWatermark: Long, algo: String = "IVF_FLAT",
                      nVectors: Long = 0L, version: Long = 0L, metric: String = "L2",
                      headDirty: Int = 1)

  private def manifestFile(tenant: String, index: String) =
    Paths.get(s"${indexPath(tenant, index)}/manifest.json")

  /** Current snapshot dir for reads (requires a completed build). */
  private def snapDir(tenant: String, index: String, m: Manifest): String = {
    require(m.version > 0, s"$tenant/$index has no built snapshot")
    s"${indexPath(tenant, index)}/v${m.version}"
  }

  /** Parsed-manifest memo keyed by the file's (mtime, size): the wire
    * serving path reads the manifest on EVERY call, and a steady-state
    * search was paying a full read + ~10 regex scans per query — with
    * per-call disk reads also riding this host's external IO storms
    * straight into serving tails. Freshness stays anchored to the
    * filesystem (the atomic-rename commit bumps mtime, so ANY writer —
    * this JVM or another process — invalidates the memo on its next
    * stat); same-JVM writers additionally drop the entry synchronously
    * in [[writeManifest]], so only a cross-process write landing within
    * one mtime tick AND at identical byte size could alias (epoch and
    * version both monotonically widen, so sizes collide only between
    * same-width stamps). */
  private val manifestMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (java.nio.file.attribute.FileTime, Long, Manifest)]()

  def manifest(tenant: String, index: String): Manifest = {
    val f = manifestFile(tenant, index)
    val attrs =
      try Some(Files.readAttributes(
        f, classOf[java.nio.file.attribute.BasicFileAttributes]))
      catch {
        // ONLY absence means "never built" — mapping a transient I/O or
        // permission error to the never-built manifest would serve
        // index-not-found for a live index mid-storm; propagate those
        case _: java.nio.file.NoSuchFileException => None
      }
    attrs match {
      case None =>
        // metric = "" (unknown), NOT the case-class "L2" default: a
        // never-built index has recorded no metric, so validation must
        // be skipped — the same convention as an absent field below
        Manifest(0L, Long.MinValue, "IVF_FLAT", metric = "")
      case Some(a) =>
        val key = f.toString
        val hit = manifestMemo.get(key)
        if (hit != null && hit._1 == a.lastModifiedTime && hit._2 == a.size)
          hit._3
        else {
          val s = Files.readString(f)
          def field(k: String): Long =
            raw""""$k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
          val algo = raw""""algo"\s*:\s*"([A-Z_]+)"""".r.findFirstMatchIn(s)
            .map(_.group(1)).getOrElse("IVF_FLAT")
          // absent field (pre-upgrade manifest) → UNKNOWN, not L2:
          // defaulting to a concrete metric would reject the index's true
          // metric and accept the wrong one; unknown skips validation.
          // [A-Za-z0-9_]: "L2" has a digit — a letters-only class silently
          // parsed every L2-built manifest as unknown-metric, wiping the
          // cross-metric gate for the most common build
          val metric = raw""""metric"\s*:\s*"([A-Za-z0-9_]+)"""".r.findFirstMatchIn(s)
            .map(_.group(1)).getOrElse("")
          // absent field (older manifest) → assume dirty: correctness over speed
          val headDirty = raw""""headDirty"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
            .map(_.group(1).toInt).getOrElse(1)
          val m = Manifest(field("epoch"), field("buildWatermark"), algo,
            field("nVectors"), field("version"), metric, headDirty)
          manifestMemo.put(key, (a.lastModifiedTime, a.size, m))
          m
        }
    }
  }

  private def writeManifest(tenant: String, index: String, m: Manifest): Unit = {
    val f = manifestFile(tenant, index)
    Files.createDirectories(f.getParent)
    // write-then-atomic-rename: the manifest swap IS the commit
    val tmp = Paths.get(f.toString + ".tmp")
    Files.writeString(tmp,
      s"""{"epoch": ${m.epoch}, "buildWatermark": ${m.buildWatermark}, "algo": "${m.algo}", "nVectors": ${m.nVectors}, "version": ${m.version}, "metric": "${m.metric}", "headDirty": ${m.headDirty}}""",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    Files.move(tmp, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // a same-JVM writer must never serve even one stale read off the memo
    manifestMemo.remove(f.toString)
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => Files.deleteIfExists(q))
    }

  /** Best-effort GC of superseded snapshot dirs (single-writer model). */
  private def gcOldSnapshots(tenant: String, index: String, keep: Long): Unit = {
    val base = Paths.get(indexPath(tenant, index))
    if (Files.isDirectory(base)) {
      Files.list(base).forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name.drop(1).forall(_.isDigit) &&
            name.drop(1).toLong < keep) {
          try deleteTree(p)
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  def epoch(tenant: String, index: String): Long = manifest(tenant, index).epoch

  private def bumpEpoch(tenant: String, index: String): Unit =
    withManifestLock(tenant, index) {
      val m = manifest(tenant, index)
      writeManifest(tenant, index, m.copy(epoch = m.epoch + 1, headDirty = 1))
    }

  // -------------------------------------------------------------------
  // write path (SURVEY §3.2)
  // -------------------------------------------------------------------

  /** Records: (tenant_id, index_name, id, vector ARRAY<FLOAT>, meta STRING,
    * tags ARRAY<STRING>, numeric_fields MAP<STRING,DOUBLE>, updated_at
    * BIGINT, deleted BOOLEAN). `updated_at` is a caller-supplied monotonic
    * version (epoch-micros in practice). `numeric_fields` mirrors the
    * reference's stored-but-never-searched numeric map
    * (Model/VectorRecord.cs:38; parsed at VectorCommandParser.cs:391-395)
    * and is optional on input — absent columns land as null. */
  private def appendLog(records: DataFrame): Unit = {
    val withNum =
      if (records.columns.contains("numeric_fields")) records
      else records.withColumn("numeric_fields",
        lit(null).cast("map<string,double>"))
    withNum
      .select("tenant_id", "index_name", "id", "vector", "meta", "tags",
        "numeric_fields", "updated_at", "deleted")
      .write.mode("append")
      .partitionBy("tenant_id", "index_name")
      .parquet(recordsPath)
  }

  private def recordsLogExists: Boolean =
    Files.exists(Paths.get(recordsPath))

  /** VEC.ADD: reject ids that already exist live (`ERR Vector already
    * exists`, VectorCommandSet.cs:605-615). Returns the number added.
    * Only the genuinely-missing-log case skips the duplicate check — any
    * other read failure must propagate, not silently disable the
    * invariant. */
  def add(records: DataFrame): Long = {
    // one aggregation decides both the dup check and the count (no second
    // full pass); on success the whole batch is fresh, so the append can
    // write `records` directly without re-running the anti-join
    val n =
      if (!recordsLogExists) records.count()
      else {
        val existing = currentStateAll()
          .select("tenant_id", "index_name", "id")
          .withColumn("dup", lit(true))
        val r = records
          .join(existing, Seq("tenant_id", "index_name", "id"), "left")
          .agg(count(lit(1)).as("total"), count(col("dup")).as("dups")).head
        require(r.getLong(1) == 0L,
          s"Vector already exists: ${r.getLong(1)} duplicate id(s)")
        r.getLong(0)
      }
    appendLog(records.withColumn("deleted", lit(false)))
    touched(records).foreach { case (t, i) => bumpEpoch(t, i) }
    n
  }

  /** VEC.UPSERT: last-write-wins append. One aggregation pass yields
    * both the row count and the touched (tenant, index) set — the naive
    * count() + distinct() shape costs a third job per call, which is
    * pure fixed overhead on the streaming path where this runs once per
    * micro-batch. */
  def upsert(records: DataFrame): Long = {
    val touchedCounts = records.groupBy("tenant_id", "index_name")
      .agg(count(lit(1))).collect()
    val n = touchedCounts.map(_.getLong(2)).sum
    appendLog(records.withColumn("deleted", lit(false)))
    touchedCounts.foreach(r => bumpEpoch(r.getString(0), r.getString(1)))
    n
  }

  /** Streaming ingestion (St1 write side): every micro-batch of the
    * record stream lands through the same [[upsert]] path — last-write-
    * wins semantics, epoch bumps (cache invalidation) per batch. The
    * reference's continuous RESP write stream, as Structured Streaming.
    * Stream schema = the record schema minus `deleted`. */
  def upsertStream(records: DataFrame,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { upsert(batch); () }
      }
      .start()

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
    readLog()
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
    * registry dispatch incl. IVF_PQ VectorIndexRegistry.cs:96; defaults
    * :87): IVF_FLAT (default), FLAT (exact — a single inverted list, i.e.
    * nlist=1), HNSW (per-partition graphs), IVF_PQ (coarse lists +
    * product-quantized residual codes). */
  def build(tenant: String, index: String, nlist: Int, metric: String = "L2",
            seed: Long = 42L, algo: String = "IVF_FLAT",
            pqM: Int = 8, pqK: Int = 256): Unit = {
    // The LWW state resolve is a full-log window sort (payload-wide
    // exchange + sort). Every downstream consumer — watermark agg, the
    // coarse/PQ build, the sq16 param train + codes write, the records
    // snapshot — is an independent action, so an unpersisted plan re-runs
    // that window once PER ACTION (measured 5× at the 10M rung, the
    // dominant share of a 296 s engine build). One materialization, many
    // cache scans; released in the finally.
    val state = currentState(tenant, index)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val vecs = state.select(col("id"), col("vector").as("vec"))
    val wmRow = state.agg(max("updated_at"), count(lit(1))).head
    require(!wmRow.isNullAt(0),
      s"cannot build $tenant/$index: current state is empty (all records tombstoned?)")
    val watermark = wmRow.getLong(0)
    val nVectors = wmRow.getLong(1)
    val keyed = vecs.withColumn("id_str", col("id"))
      .select(xxhash64(col("id")).as("id"), col("vec"), col("id_str"))
    val algoU = algo.toUpperCase(java.util.Locale.ROOT)
    val m0 = manifest(tenant, index)
    // whole snapshot lands in a fresh versioned dir; nothing below is
    // visible to readers until the manifest swap at the end
    val newVersion = m0.version + 1
    val dir = s"${indexPath(tenant, index)}/v$newVersion"
    algoU match {
      case "IVF_FLAT" | "FLAT" =>
        val idx = IvfFlat.build(keyed, if (algoU == "FLAT") 1 else nlist, metric, seed)
        // keep the string id alongside the numeric surrogate used by the plans
        idx.assigned.write.mode("overwrite").partitionBy("cluster_id")
          .parquet(s"$dir/vectors")
        idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
      case "HNSW" =>
        val graphs = graft.operators.Hnsw.build(keyed.select("id", "vec"), metric,
          numPartitions = math.max(1, nlist))
        graft.operators.Hnsw.save(graphs, s"$dir/hnsw")
        // surrogate→string map for hit resolution
        keyed.select("id", "id_str").write.mode("overwrite")
          .parquet(s"$dir/idmap")
      case "IVF_PQ" =>
        // PQ codes are L2-trained like the reference (IvfPqVectorIndex.cs:
        // 55-116). COSINE rides the normalization identity: on unit vectors
        // ‖a−b‖² = 2 − 2·cos(a,b), so L2-training + ADC over unit-normalized
        // copies ranks exactly like cosine — the rank-correct form of the
        // reference's raw L2-proxy-for-any-metric (IvfPqVectorIndex.cs:
        // 163-199 comments). Only the coded tail is normalized; `records`
        // keeps raw vectors (hydration/export and the exact rerank, which
        // scores cosine directly — normalization-invariant).
        val metricU = metric.toUpperCase(java.util.Locale.ROOT)
        require(metricU == "L2" || metricU == "COSINE" || metricU == "IP",
          s"IVF_PQ tails are L2-trained (COSINE via unit normalization, " +
            s"IP via MIPS augmentation); cannot build with metric=$metric")
        // IP rides the MIPS→L2 reduction (see functions.vector_mips_augment):
        // codes are trained over [x, sqrt(M²−‖x‖²), 0…] — zero-padded to
        // the next multiple of M for PQ subspace divisibility — so L2
        // geometry ranks by inner product. M² is persisted next to the
        // codebooks; search folds ADC distances back onto the dot scale.
        val (mipsMaxSq, mipsDim) =
          if (metricU == "IP") {
            val r = keyed.agg(
              max(graft.functions.vector_dot(col("vec"), col("vec"))),
              max(size(col("vec"))), min(size(col("vec")))).head
            val rawDim = r.getInt(1)
            // mixed dims would land the augmentation coordinate at a
            // different subspace position per row — silently wrong IP
            // ranks, so fail loudly (L2/COSINE paths fail in kernel
            // alignment instead; IP would not)
            require(rawDim == r.getInt(2),
              s"IP IVF_PQ build needs uniform vector dims, " +
                s"got ${r.getInt(2)}..$rawDim")
            (r.getDouble(0), ((rawDim + 1 + pqM - 1) / pqM) * pqM)
          } else (0.0, 0)
        val forPq = metricU match {
          case "COSINE" =>
            keyed.withColumn("vec", graft.functions.vector_unit(col("vec")))
          case "IP" =>
            keyed.withColumn("vec",
              graft.functions.vector_mips_augment(col("vec"), lit(mipsMaxSq),
                lit(mipsDim)))
          case _ => keyed
        }
        val cached = forPq.cache()
        // Coarse build and PQ layer split (same composition IvfPq.build
        // performs) so the coarse assignment can be persisted between
        // them: Pq.train's sample collect and Pq.encode's codes pass are
        // separate actions over `assigned`, and an unpersisted assignment
        // re-runs the 512-centroid KMeans transform over the full corpus
        // once per action (~nlist×dim FLOPs per row per pass at 10M).
        val coarse = IvfFlat.build(
          cached.select("id", "vec"), nlist, "L2", seed)
        coarse.assigned.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idx = graft.operators.IvfPq.buildFrom(
          coarse, m = pqM, k = math.min(pqK, 256), seed = seed)
        val withStr = idx.assigned.join(cached.select("id", "id_str"), Seq("id"))
        withStr.write.mode("overwrite").partitionBy("cluster_id")
          .parquet(s"$dir/ivfpq/codes")
        idx.centroids.write.mode("overwrite").parquet(s"$dir/ivfpq/centroids")
        graft.operators.Pq.saveCodebook(idx.cb, spark, s"$dir/ivfpq/codebooks")
        if (metricU == "IP") {
          import spark.implicits._
          Seq(mipsMaxSq).toDF("max_sq")
            .write.mode("overwrite").parquet(s"$dir/ivfpq/mips")
        }
        // SQ16 sidecar over the RAW vectors (2× compression): the
        // refined rows tier reranks ADC candidates against these
        // driver-side — raw floats are past any residency budget exactly
        // when PQ is the right algo; uint16 is the rung between codes
        // (M bytes) and floats whose error prices at exact (uint8's does
        // not on near-equidistant data — the bench gauge measures it).
        // Params are ScalarQuant's global min/max; the encode expression
        // keeps its portable float-then-double choreography (FLOAT
        // subtraction, DOUBLE scale, floor(x+0.5), clamp) at 65535
        // levels, so a SQL oracle reproduces the codes bit-exactly. The
        // rerank scores the TRUE metric on dequantized vectors, so one
        // raw-space store serves L2/COSINE/IP alike.
        val p16 = graft.operators.ScalarQuant.train(
          state.select(col("vector").as("vec")))
        graft.operators.ScalarQuant.saveParams(
          p16, s"$dir/sq16/params.json")
        val scale16 =
          if (p16.max > p16.min) 65535.0 / (p16.max - p16.min) else 0.0
        state.select(xxhash64(col("id")).as("id"),
            transform(col("vector"), x =>
              greatest(lit(0.0), least(lit(65535.0),
                floor((x - lit(p16.min)) * lit(scale16) + lit(0.5))))
                .cast("int")).as("qvec16"))
          .write.mode("overwrite").parquet(s"$dir/sq16/codes")
        // binary SEGMENT sidecar over the codes just written: the merged
        // resident store persisted as raw sorted arrays, so a restarted
        // engine (warmServing, or the first refined call after boot)
        // loads the rerank store by sequential file read (~disk
        // bandwidth) instead of re-running the parquet scan + encode +
        // k-way merge every boot (measured ~27 s at the 10M rung —
        // the r9 warm-boot regression). Build-time cost is two extra
        // reads of the codes table (the sizing aggregation + the
        // wave-fetch). Gated: written when the full store fits THIS
        // engine's per-store budget (past it, serving would deny
        // residency and the transient merge buys nothing), OR — for a
        // u8-opted-in engine — when the HALF-SIZE store fits (the u8
        // tier streams this sidecar; without it a budget-tight builder
        // would strand its own serving on the plan fallback, the exact
        // cliff the tier removes; the build then transiently holds the
        // full-precision store it persists). The transient merge is
        // additionally fenced on global-registry headroom and counted
        // against it while alive, so a build inside a loaded serving
        // JVM cannot stack an unaccounted multi-GB store on top of a
        // near-ceiling registry. Reading BACK the parquet (rather than
        // re-encoding from `state`) keeps the sidecar bit-identical to
        // what a segment-less engine would build from the same
        // snapshot, duplicate-surrogate resolution included (same
        // files, same partition order).
        locally {
          val codesDf = spark.read.parquet(s"$dir/sq16/codes")
          val st = codesDf.agg(count(lit(1)), min(size(col("qvec16"))),
            max(size(col("qvec16")))).head
          val n16 = st.getLong(0)
          if (n16 > 0 && !st.isNullAt(1) && st.getInt(1) == st.getInt(2)) {
            val d16 = st.getInt(1)
            val est = graft.operators.Sq16Store.estimateBytes(n16, d16)
            val wanted = est <= sq16MaxBytes ||
              (refineU8Fallback &&
                graft.operators.Sq8Store.estimateBytes(n16, d16) <= sq16MaxBytes)
            if (wanted) GraftEngine.tryReserveSq16(est).foreach { token =>
              // the reservation covers the multi-second wave-fetch +
              // merge itself, not just the finished store — two
              // concurrent builds can no longer both pass the same
              // headroom pre-check and overshoot together (ADVICE r10)
              try {
                val store = graft.operators.Sq16Store.buildResident(
                  codesDf, d16, p16.min, p16.max, estBytes = est)
                GraftEngine.registerSq16(store, store.bytes)
                GraftEngine.unregisterSq16(token) // swap reserve → real
                try graft.operators.Sq16Store.save(store, s"$dir/sq16/segments")
                finally GraftEngine.unregisterSq16(store)
              } finally GraftEngine.unregisterSq16(token) // no-op if swapped
            }
          }
        }
        // centroids also at the IVF location so the cache's L2 layer can
        // probe them without knowing the algo
        idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
        coarse.assigned.unpersist()
        cached.unpersist()
      case other => throw new IllegalArgumentException(s"unknown algo: $other")
    }
    // meta/tags snapshot for hydration without re-reading the whole log.
    // IVF_PQ additionally retains the RAW vectors here (the reference
    // keeps an ID → raw-vector map alongside the codes,
    // IvfPqVectorIndex.cs:18-19): codes alone can't serve the exact
    // rerank path, and the inverted lists hold only quantized codes.
    val recCols = Seq(col("id").as("id_str"), col("meta"), col("tags")) ++
      (if (algoU == "IVF_PQ") Seq(col("vector").as("vec")) else Nil)
    state.select(recCols: _*)
      .write.mode("overwrite").parquet(s"$dir/records")
    // concurrent-writer guard (e.g. an upsertStream micro-batch landing
    // between the state read and this commit): any write bumps the epoch,
    // so an epoch moved since m0 means the log holds rows this snapshot
    // never saw — the head must stay dirty or they'd be invisible. The
    // re-read and the rename sit under the per-index manifest lock, so a
    // writer can't slip its bump between them (it either lands before the
    // re-read — seen in mNow — or after the rename, where bumpEpoch itself
    // re-sets headDirty=1).
    withManifestLock(tenant, index) {
      val mNow = manifest(tenant, index)
      writeManifest(tenant, index,
        Manifest(mNow.epoch + 1, watermark, algoU, nVectors, newVersion,
          metric.toUpperCase(java.util.Locale.ROOT),
          headDirty = if (mNow.epoch != m0.epoch) 1 else 0))
    }
    // keep the previous snapshot too: lazy frames returned by search()
    // before this build may still resolve into it
    gcOldSnapshots(tenant, index, keep = newVersion - 1)
    evictStaleHandles(tenant, index, keep = newVersion - 1)
    } finally state.unpersist()
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

  /** `refine` > 0 (IVF_PQ only) re-scores the top `k·refine` ADC
    * candidates per query against the raw vectors retained in the build
    * snapshot — the classic PQ refine step. ADC ranks are approximate;
    * the rerank makes the served top-k exact whenever the true top-k
    * survives the ADC cut (guaranteed at refine·k ≥ candidates), and also
    * removes the approximate-tail/exact-head score asymmetry of the delta
    * merge. 0 = raw ADC scores (the reference's serving behavior). */
  /** `refineStore` picks the rerank vectors when `refine` > 0: "exact"
    * (default) re-scores against the snapshot's retained raw vectors;
    * "sq16" against the SQ16 sidecar's dequantized vectors — the SAME
    * floats the resident rows tier reranks with, so the two tiers give
    * one refined answer (uint16 error is below the gauge's neighbor
    * margins: wire recall == exact rerank's on the bench gauge). */
  def search(tenant: String, index: String, queries: DataFrame, k: Int,
             metric: String = "L2", nprobe: Int = 4,
             withMeta: Boolean = false, maxScans: Int = 0,
             refine: Int = 0, refineStore: String = "exact"): DataFrame =
    searchImpl(tenant, index, queries, k, metric, nprobe, withMeta, maxScans,
      refine, refineStore)
      .orderBy("query_id", "rank")

  /** Low-latency serving entry: driver-local query batch in, answer rows
    * out — (query_id, rank, id, score), the reference's RESP reply shape
    * (VectorCommandSet.cs:457-480) without per-call DataFrame planning.
    *
    * Routes per the manifest: a clean head serves straight off the packed
    * tail (IvfFlat.searchLocalRows, which itself dispatches small-work
    * calls to the zero-job driver-resident tier); a dirty head inside
    * [[HeadServeMaxRows]] serves the delta merge driver-side — epoch-
    * memoized LWW head state, exact head scan, tail over-fetch + mask,
    * one bounded merge (the reference's Head+Tail serving shape,
    * DeltaVectorIndex.cs:76-122). IVF_PQ tails serve from resident
    * packed byte codes and HNSW tails from resident graphs (same head
    * merge, plan-exact folds/cuts); oversized corpora or heads, non-
    * resident indexes, and big batches fall back to the full [[search]]
    * plan and collect it — always correct, just not always zero-job.
    * Meta hydration stays on the DataFrame API; tag filters serve
    * rows-native for inverted-list and PQ tails (searchRowsFilteredTraced). */
  def searchRows(tenant: String, index: String,
                 queries: Array[(Long, Array[Float])], k: Int,
                 metric: String = "L2", nprobe: Int = 4,
                 refine: Int = 0): Array[(Long, Int, String, Double)] =
    searchRowsTraced(tenant, index, queries, k, metric, nprobe, refine)._1

  /** [[searchRows]] plus a per-call observability record — the
    * reference's per-reply TRACE fields (VectorCommandSet.cs:849-912)
    * as a typed struct instead of protocol text: which serving path
    * ran, the fresh-head state scanned, tail candidates fetched, and
    * call wall time. Zero extra work on the serving path (every field
    * is a count the call already computed). */
  def searchRowsTraced(tenant: String, index: String,
                       queries: Array[(Long, Array[Float])], k: Int,
                       metric: String = "L2", nprobe: Int = 4,
                       refine: Int = 0)
      : (Array[(Long, Int, String, Double)], SearchTrace) = {
    val tTrace0 = System.nanoTime()
    require(queries.map(_._1).distinct.length == queries.length,
      "searchRows batch contains duplicate query_ids")
    val m = manifest(tenant, index)
    val metricU = metric.toUpperCase(java.util.Locale.ROOT)
    // `refine` is an IVF_PQ semantic (the plan ignores it elsewhere —
    // other algos' tails already score exactly); the refined rows tier
    // additionally needs the resident SQ16 rerank store
    val wantRefine = refine > 0 && m.algo == "IVF_PQ"
    // cheap manifest gates FIRST: a dirty-head HNSW/oversized index must
    // not pay the bounded head-read job just to fall back
    val algoFlat = (m.algo == "IVF_FLAT" || m.algo == "FLAT") &&
      m.nVectors <= RowsServeMaxRows
    // IVF_PQ rows tier: codes are M bytes/vec (32× under raw floats at
    // dim 128 / M 8), so the driver-RESIDENT tier reaches corpora whose
    // float vectors never could (10M codes ≈ 240 MB packed). Gated on
    // ACTUAL residency — memoized per snapshot version; a too-big codes
    // table memoizes None once and every later call short-circuits here.
    val algoPqBase = m.algo == "IVF_PQ" && m.nVectors <= RowsServeMaxRows &&
      pqIndexOf(tenant, index, m).packedDriver.isDefined
    // HNSW rows tier: graphs hold their full vectors, so residency
    // economics match IvfFlat's (bound checked before collect, memoized
    // per snapshot version — a too-big graph set memoizes None once)
    val hnswGraphs: Option[Array[(Int, graft.operators.Hnsw.Graph)]] =
      if (m.algo == "HNSW" && m.nVectors <= RowsServeMaxRows)
        hnswGraphsOf(tenant, index, m)
      else None
    val algoHnsw = hnswGraphs.isDefined
    // the rows tier resolves result surrogates through the resident
    // [[IdPool]] — a pool past its measured-byte budgets memoizes None
    // and the call keeps the DataFrame plan (broadcast-join id resolve)
    val poolOpt: Option[IdPool] =
      if (algoFlat || algoPqBase || algoHnsw) idPoolOf(tenant, index, m)
      else None
    // the sq16 store collect is multi-GB at 10M+, so it is the LAST
    // residency decision — only after the packed codes AND the pool's
    // cheap byte estimate have admitted. Building it earlier could
    // strand gigabytes in a registered store no call would ever use
    // when the pool then denies (pool and store admissions are
    // independent budget lines: long user ids can deny a pool whose
    // corpus the store budget happily admits). When the sq16 store is
    // budget-denied and the deployment opted into the degraded tier,
    // the half-size u8 store is tried against the same budget line.
    val refineStoreOpt: Option[graft.operators.RefineStore] =
      if (wantRefine && algoPqBase && poolOpt.isDefined)
        sq16StoreOf(tenant, index, m).orElse(
          if (refineU8Fallback) sq8StoreOf(tenant, index, m) else None)
      else None
    val algoPq = algoPqBase &&
      (!wantRefine || refineStoreOpt.isDefined) // refined serving needs the store
    val algoOk = (algoFlat || algoPq || algoHnsw) && poolOpt.isDefined
    // the head path below is exact-scan; the reference's RESP serving has
    // the same shape (fresh delta head scanned per query,
    // DeltaVectorIndex.cs:76-122)
    val headState: Option[HeadServeState] =
      if (!algoOk) None
      else if (m.headDirty == 0) Some(HeadServeState.empty)
      else headStateOf(tenant, index, m)
    val dim = queries.headOption.map(_._2.length).getOrElse(0)
    // scan-work gate counts the FULL head (tombstone-only heads still
    // mask-scan), and the over-fetch k is bounded below before sizing
    val headWork = headState.map(hs =>
      queries.length.toLong * hs.maskSurrogates.size * dim)
      .getOrElse(Long.MaxValue)
    // only ids that exist in the TAIL can mask tail rows — fresh adds
    // never do, so they must not inflate the per-query over-fetch
    val kTail = headState.map(k + _.maskInTail).getOrElse(k)
    // refined calls over-fetch the plan's ADC cut (k·refine post-mask, so
    // + maskInTail pre-mask) — the top-k buffer budget prices that fetch
    val tailFetch =
      if (wantRefine)
        k.toLong * refine + headState.map(_.maskInTail).getOrElse(0)
      else kTail.toLong
    val servable = algoOk && headState.isDefined &&
      headWork <= IvfFlat.DriverServeMaxScanElems &&
      queries.length.toLong * tailFetch <= 4_000_000L // top-k buffer budget
    if (!servable) {
      import spark.implicits._
      val qDf = queries.toSeq
        .map { case (qid, qv) => (qid, qv.toSeq) }.toDF("query_id", "qvec")
      // refined fallback reranks in sq16 mode when the snapshot carries
      // the sidecar, so plan and rows tiers give the SAME refined answer
      // regardless of which served; pre-sidecar snapshots rerank exact
      val store16 =
        if (refine > 0 && m.algo == "IVF_PQ" &&
            sq16TableExists(tenant, index, m)) "sq16"
        else "exact"
      val rows = search(tenant, index, qDf, k, metric, nprobe,
          refine = refine, refineStore = store16).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      (rows, SearchTrace("plan-fallback", None, Nil,
        headLive = -1, headMasked = -1, tailRows = -1,
        totalMicros = (System.nanoTime() - tTrace0) / 1000L))
    } else {
      // same metric gate as searchImpl (FLAT tails are metric-agnostic)
      require(m.algo == "FLAT" || m.metric.isEmpty ||
          metric.equalsIgnoreCase(m.metric),
        s"index built with metric=${m.metric}; cannot search with metric=$metric")
      val hs = headState.get
      val idMap = poolOpt.get
      // over-fetch from the tail so masking re-written/tombstoned ids
      // can't leave a query short (≤ maskInTail tail rows can be masked)
      val tailRows =
        if (algoPq && wantRefine)
          // ADC cut (plan-identical: mask, then top k·refine by raw ADC
          // order) reranked EXACTLY against the resident SQ16 store —
          // rows return already masked, true-metric scored, cut at k
          pqTailRowsRefined(tenant, index, m, queries, metricU, k, refine,
            nprobe, hs, refineStoreOpt.get)
        else if (algoPq) pqTailRows(tenant, index, m, queries, metricU, kTail, nprobe)
        else if (algoHnsw)
          // per-graph fetch AND global cut at kTail = k + maskInTail —
          // exactly the plan's kFetch over-fetch, so masking backfills
          // identically on both tiers
          graft.operators.Hnsw.searchLocalRows(hnswGraphs.get, queries, kTail)
        else IvfFlat.searchLocalRows(
          tailIndexOf(tenant, index, m), queries, metric, kTail, nprobe, spark)
      val byQuery = tailRows.groupBy(_._1)
      val rows = queries.flatMap { case (qid, qv) =>
        val tailCands = byQuery.getOrElse(qid, Array.empty)
          .filter(r => !hs.maskSurrogates.contains(r._3))
          .map(r => (r._3, r._4)) // (surrogate, score)
        // exact head scan — the same kernel both tiers score with
        val headCands = Array.tabulate(hs.liveVecs.length) { i =>
          (hs.liveSurrogates(i),
            IvfFlat.candidateScore(metricU, qv, hs.liveVecs(i)))
        }
        // merged bounded top-k, same (score desc, surrogate asc) order as
        // the DataFrame plan's TopKHits — exact-tie parity included
        (tailCands ++ headCands)
          .sortBy { case (surr, s) => (-s, surr) }.take(k).zipWithIndex
          .map { case ((surr, s), r) =>
            (qid, r + 1, hs.liveIdOf.getOrElse(surr, idMap(surr)), s)
          }
      }
      (rows, SearchTrace(
        if (algoPq && wantRefine)
          refineStoreOpt.get.kind match {
            case "u8" => "head+pqtail-refined-u8"
            case _ => "head+pqtail-refined"
          }
        else if (algoPq) "head+pqtail"
        else if (algoHnsw) "head+hnswtail"
        else "head+tail", None, Nil,
        headLive = hs.liveVecs.length, headMasked = hs.maskSurrogates.size,
        tailRows = tailRows.length,
        totalMicros = (System.nanoTime() - tTrace0) / 1000L))
    }
  }

  /** PQ tail for the rows serving tier: zero-job ADC scan over the
    * resident packed codes, scores folded onto the SAME scale the batch
    * plan merges on (COSINE: unit-normalized query, fold 1 + s/2; IP:
    * MIPS zero-padded query, fold (s + ‖q‖² + M²)/2; L2: raw −ADC
    * distance² — the head's exact scores merge against it with the same
    * asymmetry as the plan, DeltaVectorIndex.cs:76-122). Every float/
    * double op mirrors the plan's kernels exactly (vector_unit UDF,
    * concat-pad, vector_dot accumulation), so tier parity is bit-level —
    * spec-pinned including exact ties. Folds are strictly monotone per
    * query, so folding AFTER the local top-k preserves ranks/ties. */
  private def pqTailRows(tenant: String, index: String, m: Manifest,
                         queries: Array[(Long, Array[Float])],
                         metricU: String, kTail: Int,
                         nprobe: Int): Array[(Long, Int, Long, Double)] = {
    val pqIdx = pqIndexOf(tenant, index, m)
    val (tq, fold) = pqFoldedQueries(tenant, index, m, pqIdx, queries, metricU)
    // the engine's constructor bound, not the compiled-in default — the
    // same knob must govern all three PQ rows paths (unfiltered here,
    // refined, filtered); an over-bound batch takes the distributed ADC
    // plan, which is always legal unfiltered
    graft.operators.IvfPq.searchLocalRowsPath(pqIdx, tq, kTail, nprobe,
        spark, mtBound = pqServeMaxLookupsMT)
      .map { case (qid, rank, surr, s) => (qid, rank, surr, fold(qid, s)) }
  }

  /** Refined PQ tail for the rows tier — the zero-job twin of the plan's
    * refine branch (searchImpl's IVF_PQ refine): take the plan's ADC cut
    * (post-mask top k·refine by ADC order, reproduced here as a pre-mask
    * over-fetch of k·refine + maskInTail, mask, truncate), then re-score
    * each candidate's TRUE metric against the resident SQ16 store's
    * dequantized vector. The dequantization is the plan-side sq16 decode
    * expression's bit-exact driver twin and the scoring kernel is the
    * head-parity [[IvfFlat.candidateScore]], so rows == plan("sq16") is
    * exact, spec-pinned, ties included. Scores come out on the true
    * metric scale — no ADC fold — so the head merge compares exact with
    * exact (the refine rationale: the delta merge's score asymmetry is
    * gone). Returns the per-query top k, already masked. */
  /** k·refine rerank cut size, computed in Long: the wire caps REFINE at
    * 10k but the engine API takes any Int, and an Int product overflows
    * NEGATIVE — max(1, negative) would silently degrade the ADC cut to 1
    * candidate per query instead of failing. */
  private def refineCutSize(k: Int, refine: Int): Int = {
    val c = math.max(1L, k.toLong * refine.toLong)
    require(c <= Int.MaxValue, s"k*refine overflows Int: $k * $refine")
    c.toInt
  }

  private def pqTailRowsRefined(tenant: String, index: String, m: Manifest,
                                queries: Array[(Long, Array[Float])],
                                metricU: String, k: Int, refine: Int,
                                nprobe: Int, hs: HeadServeState,
                                store: graft.operators.RefineStore): Array[(Long, Int, Long, Double)] = {
    val pqIdx = pqIndexOf(tenant, index, m)
    val (tq, _) = pqFoldedQueries(tenant, index, m, pqIdx, queries, metricU)
    // the cut is Long-guarded, but + maskInTail can still wrap a cut
    // near Int.MaxValue back negative — keep the whole sum guarded
    val kAdcL = refineCutSize(k, refine).toLong + hs.maskInTail
    require(kAdcL <= Int.MaxValue,
      s"k*refine + head mask overflows Int: $k * $refine + ${hs.maskInTail}")
    val kAdc = kAdcL.toInt
    val adc = graft.operators.IvfPq.searchLocalRowsPath(pqIdx, tq, kAdc,
      nprobe, spark, mtBound = pqServeMaxLookupsMT)
    val byQuery = adc.groupBy(_._1)
    // one scratch vector for the whole call's reranks (queries are
    // processed sequentially here): k·refine fresh dequant arrays per
    // call were ~256 KB of young-gen garbage each, measured as the
    // refined row's p99 tail
    val scratch = new Array[Float](store.dim)
    queries.indices.flatMap { qi =>
      val (qid, qvRaw) = queries(qi)
      // rows arrive rank-ordered (raw ADC desc, surrogate asc — the same
      // total order the plan's TopK cut uses; the metric folds are
      // strictly monotone so cutting on raw ADC = cutting on folded)
      val cut = byQuery.getOrElse(qid, Array.empty)
        .sortBy(_._2) // rank asc
        .iterator
        .filter(r => !hs.maskSurrogates.contains(r._3))
        .take(refineCutSize(k, refine))
      val reranked = cut.map { case (_, _, surr, _) =>
        val row = store.lookup(surr)
        require(row >= 0,
          s"${store.kind} store missing surrogate $surr — snapshot/store version skew")
        store.dequantInto(row, scratch)
        (surr, IvfFlat.candidateScore(metricU, qvRaw, scratch))
      }.toArray
      reranked.sortBy { case (surr, s) => (-s, surr) }.take(k).zipWithIndex
        .map { case ((surr, s), r) => (qid, r + 1, surr, s) }
    }.toArray
  }

  /** Filtered variant of [[pqTailRows]]: the distributed ADC plan has no
    * filter hook, so this serves ONLY from the resident byte-code tier —
    * None (over-budget batch or non-resident codes) tells the caller to
    * keep the distributed filtered plan instead of throwing at serve
    * time (the r7 ADVICE failure: a filtered batch past
    * PqServeMaxLookupsMT hit the unfiltered fallback's require). */
  private def pqTailRowsFiltered(tenant: String, index: String, m: Manifest,
                                 queries: Array[(Long, Array[Float])],
                                 metricU: String, kTail: Int, nprobe: Int,
                                 allowedSorted: Array[Long],
                                 allowedHash: graft.operators.LongHashSet,
                                 allowedBits: Array[Array[Long]]): Option[Array[(Long, Int, Long, Double)]] = {
    val pqIdx = pqIndexOf(tenant, index, m)
    val (tq, fold) = pqFoldedQueries(tenant, index, m, pqIdx, queries, metricU)
    graft.operators.IvfPq.searchResidentRows(pqIdx, tq, kTail, nprobe,
        mtBound = pqServeMaxLookupsMT,
        allowedSorted = allowedSorted, allowedHash = allowedHash,
        allowedBits = allowedBits)
      .map(_.map { case (qid, rank, surr, s) => (qid, rank, surr, fold(qid, s)) })
  }

  /** Metric transform + score fold shared by the PQ rows tiers: COSINE
    * unit-normalizes queries (bit-matching the plan's `vector_unit`) and
    * folds 1 + s/2; IP zero-pads to codebook dim and folds the MIPS
    * (s + ‖q‖² + M²)/2; L2 passes through. Folds are strictly monotone
    * per query, so folding after the local top-k preserves ranks/ties. */
  private def pqFoldedQueries(tenant: String, index: String, m: Manifest,
                              pqIdx: graft.operators.IvfPq.Index,
                              queries: Array[(Long, Array[Float])],
                              metricU: String): (Array[(Long, Array[Float])], (Long, Double) => Double) =
    metricU match {
      case "COSINE" =>
        (queries.map { case (qid, qv) => (qid, unitLocal(qv)) },
          (_, s) => 1.0 + s / 2)
      case "IP" =>
        val cbDim = pqIdx.cb.m * pqIdx.cb.dsub
        val maxSq = mipsMaxSqOf(tenant, index, m)
        val qn2 = queries.map { case (qid, qv) =>
          var s = 0.0; var i = 0
          while (i < qv.length) { s += qv(i).toDouble * qv(i).toDouble; i += 1 }
          qid -> s
        }.toMap
        (queries.map { case (qid, qv) =>
          (qid, java.util.Arrays.copyOf(qv, cbDim)) },
          (qid, s) => (s + qn2(qid) + maxSq) / 2)
      case _ => (queries, (_, s) => s)
    }

  /** Bit-exact local mirror of the `vector_unit` UDF (same norm
    * accumulation, same Float division) — the COSINE PQ tail transforms
    * queries with it so resident and plan tiers see identical floats. */
  private def unitLocal(a: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i); i += 1 }
    if (s == 0) a
    else {
      val n = math.sqrt(s)
      val out = new Array[Float](a.length)
      i = 0
      while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Tag-filtered zero-job serving: [[searchRowsTraced]] with the F1
    * conjunctive tag filter applied DURING the scan, not by delegating to
    * the batch cascade — the reference filters in-process inside its scan
    * loop at ~no extra cost (VectorCommandSet.cs:461-480), and before this
    * path a FILTER wire miss paid the ~20-action batch plan, an invisible
    * latency cliff next to the ~5 ms unfiltered miss.
    *
    * Parity with the batch plan's filter-then-top-k (spec-pinned): the
    * filter tags resolve to a sorted surrogate set from the snapshot's own
    * tag table (intersection for the conjunction), the packed scan skips
    * non-members before scoring, head candidates check their OWN head tags
    * (head wins over snapshot for re-written ids, exactly the batch
    * `tagsOf` union), and masking/tie-breaks are unchanged. IVF_PQ
    * indexes serve through the resident byte-code tier (same allowed-set
    * kernel hook, plan-exact metric folds). Returns None when the
    * index/batch is outside the rows-tier gates (HNSW, non-resident PQ,
    * oversized corpus or head, top-k budget) — the caller keeps the
    * always-correct distributed filtered plan. */
  /** `hnswBeam = true` opts a FILTERED call on an HNSW index into the
    * FILTER-DURING-BEAM semantics ([[graft.operators.Hnsw.searchLocalRowsFiltered]])
    * — a NEW capability flag, not reference parity: the default keeps
    * the batch plan's fetch-k×10-then-filter (which the reference's
    * post-filter shape demands and the F1 parity spec pins). Beam mode
    * is resident-only; outside the rows gates the call falls back to
    * the plan's post-filter semantics (callers see that in the trace). */
  private[graft] def searchRowsFilteredTraced(
      tenant: String, index: String,
      queries: Array[(Long, Array[Float])], k: Int,
      metric: String, nprobe: Int, tags: Seq[String],
      hnswBeam: Boolean = false)
      : Option[(Array[(Long, Int, String, Double)], SearchTrace)] = {
    if (tags.isEmpty)
      return Some(searchRowsTraced(tenant, index, queries, k, metric, nprobe))
    val tTrace0 = System.nanoTime()
    require(queries.map(_._1).distinct.length == queries.length,
      "searchRows batch contains duplicate query_ids")
    val m = manifest(tenant, index)
    val metricU = metric.toUpperCase(java.util.Locale.ROOT)
    val algoFlat = (m.algo == "IVF_FLAT" || m.algo == "FLAT") &&
      m.nVectors <= RowsServeMaxRows
    // filtered PQ serving piggybacks the resident byte-code tier (the
    // scan kernel takes the same sorted allowed set)
    val algoPq = m.algo == "IVF_PQ" && m.nVectors <= RowsServeMaxRows &&
      pqIndexOf(tenant, index, m).packedDriver.isDefined
    // beam-filtered HNSW: resident graphs + the same tag index
    val hnswGraphsB: Option[Array[(Int, graft.operators.Hnsw.Graph)]] =
      if (hnswBeam && m.algo == "HNSW" && m.nVectors <= RowsServeMaxRows)
        hnswGraphsOf(tenant, index, m)
      else None
    val algoHnswBeam = hnswGraphsB.isDefined
    val poolOpt: Option[IdPool] =
      if (algoFlat || algoPq || algoHnswBeam) idPoolOf(tenant, index, m)
      else None
    // the resident tag index shares the id pool's budgets; denial keeps
    // the distributed filtered plan
    val tagIdxOpt: Option[Map[String, Array[Long]]] =
      if ((algoFlat || algoPq || algoHnswBeam) && poolOpt.isDefined)
        tagSurrogatesOf(tenant, index, m)
      else None
    val algoOk = (algoFlat || algoPq || algoHnswBeam) && poolOpt.isDefined &&
      tagIdxOpt.isDefined
    val headState: Option[HeadServeState] =
      if (!algoOk) None
      else if (m.headDirty == 0) Some(HeadServeState.empty)
      else headStateOf(tenant, index, m)
    val dim = queries.headOption.map(_._2.length).getOrElse(0)
    val headWork = headState.map(hs =>
      queries.length.toLong * hs.maskSurrogates.size * dim)
      .getOrElse(Long.MaxValue)
    val kTail = headState.map(k + _.maskInTail).getOrElse(k)
    val servable = algoOk && headState.isDefined &&
      headWork <= IvfFlat.DriverServeMaxScanElems &&
      queries.length.toLong * kTail <= 4_000_000L
    if (!servable) None
    else {
      require(m.algo == "FLAT" || m.metric.isEmpty ||
          metric.equalsIgnoreCase(m.metric),
        s"index built with metric=${m.metric}; cannot search with metric=$metric")
      val hs = headState.get
      val tagIdx = tagIdxOpt.get
      val lists = tags.map(t => tagIdx.getOrElse(t, Array.empty[Long]))
      // conjunctive allowed set: intersect per-tag lists, smallest first —
      // cost |smallest| × (T-1) binary searches, driver-local. The
      // single-tag case (the common wire shape) serves the MEMOIZED
      // array directly: a per-call copy of a half-corpus tag list is
      // milliseconds at 10M, pure waste when there is nothing to
      // intersect (callers never mutate the allowed set).
      // lazy: the multi-large-tag bitmap path below must not pay this
      // intersection at all — that is the point of the bitmaps
      lazy val allowed: Array[Long] =
        if (lists.exists(_.isEmpty)) Array.empty[Long]
        else if (lists.lengthCompare(1) == 0) lists.head
        else {
          val sorted = lists.sortBy(_.length)
          val rest = sorted.tail
          sorted.head.filter(sg => rest.forall(arr =>
            java.util.Arrays.binarySearch(arr, sg) >= 0))
        }
      val idMap = poolOpt.get
      // Multi-LARGE-tag fast path: a per-call intersection of T sorted
      // arrays costs |smallest| × (T−1) binary searches — ~10⁸ probes
      // per call for two half-corpus tags at 10M rows. When every tag
      // is large and the tail is resident, AND the MEMOIZED per-tag
      // row-position bitmaps instead: one pass over nRows/64 longs per
      // extra tag (~160k word-ANDs at 10M), per call, zero allocation
      // beyond the combined bitmap. Budget denial of any per-tag
      // structure, a non-resident tail, or an over-work batch falls
      // back to the array path below — spec-pinned result-identical.
      val multiBitsOpt: Option[Array[Array[Long]]] =
        if (tags.lengthCompare(1) > 0 && !algoHnswBeam &&
            lists.forall(_.length >= HashAllowedMinEntries)) {
          val partsIdsOpt: Option[Array[Array[Long]]] =
            if (algoPq)
              pqIndexOf(tenant, index, m).packedDriver.map(_.map(_.ids))
            else tailIndexOf(tenant, index, m).packedDriver.map(_.map(_.ids))
          partsIdsOpt.flatMap { partsIds =>
            val per = tags.zip(lists).map { case (t, arr) =>
              // a hash set speeds the ONE-TIME bitmap construction but
              // is never probed again on this path — building (and
              // permanently registering ~16 B/entry against the shared
              // id-pool budget) one per conjunction tag would retain
              // hundreds of MB at 10M just to save a single build pass.
              // Reuse a set a single-tag call already memoized; else the
              // construction binary-searches the sorted array
              val hs = tagHashSetCache
                .get(s"$tenant/$index/v${m.version}#$t").flatten.orNull
              tagRowBitsOf(tenant, index, m, t, partsIds, hs, sorted = arr)
            }
            if (per.exists(_ == null)) None
            else Some(per.reduce(GraftEngine.andBits))
          }
        } else None
      val tailRowsViaBits: Option[Array[(Long, Int, Long, Double)]] =
        multiBitsOpt.flatMap { bits =>
          if (!bits.exists(part => part.exists(_ != 0L)))
            Some(Array.empty[(Long, Int, Long, Double)])
          else if (algoPq)
            pqTailRowsFiltered(tenant, index, m, queries, metricU, kTail,
              nprobe, allowedSorted = null, allowedHash = null,
              allowedBits = bits)
          else IvfFlat.searchResidentRows(tailIndexOf(tenant, index, m),
            queries, metric, kTail, nprobe, spark, allowedBits = bits)
        }
      val tailRowsOpt: Option[Array[(Long, Int, Long, Double)]] =
        tailRowsViaBits.map(Option(_)).getOrElse {
        // large single-tag allowed sets get a memoized open-addressing
        // membership set: the sorted array costs ~5-7 cache-missing tree
        // levels PER PROBED ROW at half-corpus sizes, the probe chain 1-2.
        // Small multi-tag intersections are per-call arrays — building a
        // set per call would cost more than it saves, so they stay on
        // binary search.
        val allowedHash: graft.operators.LongHashSet =
          if (tags.lengthCompare(1) == 0 &&
              allowed.length >= HashAllowedMinEntries)
            tagHashSetOf(tenant, index, m, tags.head, allowed)
          else null
        // same gate again, one level better: when the tail is RESIDENT,
        // pre-resolve the membership into per-part row bitmaps once per
        // (snapshot, tag) — the scan then tests a sequential bit instead
        // of probing any table at all. Gated on the tag SIZE, not on the
        // hash set having been admitted: a budget-denied set falls back
        // to sorted-array construction inside tagRowBitsOf, and the
        // bitmap still serves (it is ~100× smaller than the set)
        val allowedBits: Array[Array[Long]] =
          if (algoHnswBeam || tags.lengthCompare(1) != 0 ||
              allowed.length < HashAllowedMinEntries) null // graphs: no parts
          else if (algoPq)
            tagRowBitsOf(tenant, index, m, tags.head,
              pqIndexOf(tenant, index, m).packedDriver.get.map(_.ids),
              allowedHash, sorted = allowed)
          else tailIndexOf(tenant, index, m).packedDriver match {
            case Some(parts) =>
              tagRowBitsOf(tenant, index, m, tags.head, parts.map(_.ids),
                allowedHash, sorted = allowed)
            case None => null // non-resident floats: distributed scan path
          }
        if (allowed.isEmpty) Some(Array.empty[(Long, Int, Long, Double)])
        else if (algoHnswBeam)
          // beam-filtered semantics: members-only beam over the resident
          // graphs — k members come back whenever reachable, where the
          // parity post-filter keeps at most the members surviving the
          // unfiltered k×10 cut
          Some(graft.operators.Hnsw.searchLocalRowsFiltered(
            hnswGraphsB.get, queries, kTail, efSearch = 50,
            allowedSorted = allowed, allowedHash = allowedHash))
        else if (algoPq)
          // resident-only: None (probed work past the scan bounds) falls
          // back to the distributed filtered plan via the early return —
          // the PQ distributed plan has no filter hook, so over-budget
          // filtered batches MUST NOT reach its unfiltered fallback
          pqTailRowsFiltered(tenant, index, m, queries, metricU, kTail,
            nprobe, allowedSorted = allowed, allowedHash = allowedHash,
            allowedBits = allowedBits)
        else Some(IvfFlat.searchLocalRows(tailIndexOf(tenant, index, m),
          queries, metric, kTail, nprobe, spark, allowedSorted = allowed,
          allowedHash = allowedHash, allowedBits = allowedBits))
      }
      if (tailRowsOpt.isEmpty) return None
      val tailRows = tailRowsOpt.get
      val byQuery = tailRows.groupBy(_._1)
      val rows = queries.flatMap { case (qid, qv) =>
        val tailCands = byQuery.getOrElse(qid, Array.empty)
          .filter(r => !hs.maskSurrogates.contains(r._3))
          .map(r => (r._3, r._4))
        val headCands = Array.range(0, hs.liveVecs.length).iterator
          .filter { i =>
            val ht = hs.liveTags(i); tags.forall(t => ht.contains(t))
          }
          .map(i => (hs.liveSurrogates(i),
            IvfFlat.candidateScore(metricU, qv, hs.liveVecs(i))))
          .toArray
        (tailCands ++ headCands)
          .sortBy { case (surr, s) => (-s, surr) }.take(k).zipWithIndex
          .map { case ((surr, s), r) =>
            (qid, r + 1, hs.liveIdOf.getOrElse(surr, idMap(surr)), s)
          }
      }
      Some((rows, SearchTrace(
        if (algoHnswBeam) "head+hnswtail-filtered-beam"
        else if (algoPq) "head+pqtail-filtered"
        else "head+tail-filtered", None, Nil,
        headLive = hs.liveVecs.length, headMasked = hs.maskSurrogates.size,
        tailRows = tailRows.length,
        totalMicros = (System.nanoTime() - tTrace0) / 1000L)))
    }
  }

  /** Driver-resident fresh-head state for [[searchRows]]: the post-
    * watermark log reduced to LWW per id — mask surrogates (every
    * re-written or tombstoned id) plus live vectors. Memoized per epoch:
    * every write bumps the epoch, so a cached copy is provably current;
    * re-read cost after a write burst is one bounded job on next read. */
  private case class HeadServeState(
      maskSurrogates: java.util.HashSet[java.lang.Long],
      liveSurrogates: Array[Long],
      liveVecs: Array[Array[Float]],
      liveIdOf: Map[Long, String],
      maskInTail: Int, // head ids that exist in the tail (only those mask)
      liveTags: Array[Array[String]]) // per live row, for filtered serving
  private object HeadServeState {
    val empty: HeadServeState = HeadServeState(
      new java.util.HashSet[java.lang.Long](),
      Array.empty, Array.empty, Map.empty, 0, Array.empty)
  }

  /** Head rows ceiling for the driver-served path: bigger fresh heads
    * fall back to the DataFrame plan (and should be compacted anyway). */
  private val HeadServeMaxRows = 10000

  private val headStateCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, HeadServeState)]

  private def headStateOf(tenant: String, index: String,
                          m: Manifest): Option[HeadServeState] = {
    val key = s"$tenant/$index"
    headStateCache.get(key).filter(_._1 == m.epoch).map(_._2).orElse {
      if (!recordsLogExists) Some(HeadServeState.empty)
      else {
        val rows = readLog()
          .filter(col("tenant_id") === tenant && col("index_name") === index &&
            col("updated_at") > m.buildWatermark)
          .select(col("id"), col("vector"), col("deleted"), col("updated_at"),
            col("tags"))
          .limit(HeadServeMaxRows + 1).collect()
        if (rows.length > HeadServeMaxRows) None
        else {
          // LWW reduce (same outcome as searchImpl's row_number window;
          // duplicate (id, updated_at) pairs are LWW-ambiguous in both)
          val latest = scala.collection.mutable.HashMap
            .empty[String, (Long, Boolean, Array[Float], Array[String])]
          rows.foreach { r =>
            val id = r.getString(0); val ts = r.getLong(3)
            if (latest.get(id).forall(_._1 < ts))
              latest(id) = (ts, r.getBoolean(2),
                if (r.isNullAt(1)) Array.empty[Float]
                else graft.functions.floatArray(r.getSeq[Float](1)),
                if (r.isNullAt(4)) Array.empty[String]
                else r.getSeq[String](4).toArray)
          }
          // tail-mask pricing needs the resident id pool; a pool past
          // its byte budgets means no rows tier for this index anyway,
          // so the head state has no consumer — fall back
          idPoolOf(tenant, index, m) match {
            case None => None
            case Some(tailIds) =>
              def surr(s: String): Long =
                org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
                  org.apache.spark.unsafe.types.UTF8String.fromString(s),
                  org.apache.spark.sql.types.StringType, 42L)
              val mask = new java.util.HashSet[java.lang.Long]()
              val live = scala.collection.mutable.ArrayBuffer
                .empty[(Long, Array[Float], String, Array[String])]
              var maskInTail = 0
              latest.foreach { case (id, (_, deleted, vec, tags)) =>
                val sg = surr(id)
                mask.add(sg)
                if (tailIds.contains(sg)) maskInTail += 1
                if (!deleted) live += ((sg, vec, id, tags))
              }
              val hs = HeadServeState(mask,
                live.map(_._1).toArray, live.map(_._2).toArray,
                live.map(l => l._1 -> l._3).toMap, maskInTail,
                live.map(_._4).toArray)
              headStateCache.put(key, (m.epoch, hs))
              Some(hs)
          }
        }
      }
    }
  }

  /** [[search]] without the final cosmetic sort — internal callers
    * (the cached cascade) re-order once at their own output, and the
    * range-sort costs a sampling pass per call. */
  private def searchImpl(tenant: String, index: String, queries: DataFrame, k: Int,
                         metric: String, nprobe: Int,
                         withMeta: Boolean = false, maxScans: Int = 0,
                         refine: Int = 0,
                         refineStore: String = "exact"): DataFrame = {
    val m = manifest(tenant, index)
    // the tail's geometry (KMeans clusters, HNSW links, PQ codebooks) is
    // trained for the build metric — scoring probes with a different one
    // silently degrades recall, so reject the mismatch. FLAT tails are a
    // single exact-scanned list: metric-agnostic by construction.
    require(m.algo == "FLAT" || m.metric.isEmpty ||
        metric.equalsIgnoreCase(m.metric),
      s"index built with metric=${m.metric}; cannot search with metric=$metric")
    val snap = snapDir(tenant, index, m)
    val snapshot = spark.read.parquet(s"$snap/records")

    // head: anything written after the build watermark (fresh adds,
    // upserts AND tombstones — the latter must mask tail hits). Skipped
    // wholesale when the manifest proves the log has no post-watermark
    // rows (headDirty == 0) — the steady serving state after a build.
    val headOpt: Option[(DataFrame, DataFrame)] =
      if (m.headDirty == 0 || !recordsLogExists) None
      else {
        val headLog = readLog()
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
        Some((headIds, headLive))
      }

    // drop tail candidates whose id was re-written (or tombstoned) in head
    def maskHead(cands: DataFrame): DataFrame = headOpt match {
      case None => cands
      case Some((headIds, _)) =>
        cands
          .join(broadcast(headIds.withColumn("masked", lit(true))), Seq("id_str"), "left")
          .filter(col("masked").isNull)
    }

    val baseQueries = queries.select("query_id", "qvec")

    val tagFilter = queries.columns.contains("filter_tags")

    // tail candidates per the built algo, minus ids re-written in head
    val tailScored = m.algo match {
      case "HNSW" =>
        // graphs return ranked hits already; over-fetch when a tag filter
        // will prune afterwards, the final top-k re-trims.
        // ALSO over-fetch by the head's tail-mask count: the per-graph cut
        // happens BEFORE maskHead, so without it a masked row's slot is
        // lost and the final top-k comes up short (the reference's own
        // delta shortfall, DeltaVectorIndex.cs:76-122) — maskInTail more
        // rows guarantees backfill. The count is the epoch-memoized LWW
        // head state (driver-bounded); corpora past the id-map gate or
        // heads past the serve bound keep the shortfall (and should
        // compact).
        val graphs = graft.operators.Hnsw.load(spark, s"$snap/hnsw")
        val idmap = spark.read.parquet(s"$snap/idmap")
        val maskExtra =
          if (m.headDirty == 0 || m.nVectors > RowsServeMaxRows) 0
          else headStateOf(tenant, index, m).map(_.maskInTail).getOrElse(0)
        val kFetch = (if (tagFilter) k * 10 else k) + maskExtra
        val hnswHits = graft.operators.Hnsw.search(graphs, baseQueries, kFetch)
          .select(col("query_id"), col("id"), col("score"))
        maskHead(idmap.join(broadcast(hnswHits), Seq("id")))
          .select("query_id", "id_str", "score")
      case "IVF_PQ" =>
        // ADC-scored candidates from the probed inverted lists (approximate
        // scores vs the head's exact ones — the reference's delta merge has
        // the same asymmetry, DeltaVectorIndex.cs:76-122). The codes are
        // L2-scored by construction; COSINE tails were built over unit
        // vectors (see build), so the ADC score is −‖q̂−v̂‖² and folds onto
        // the cosine scale as 1 + score/2 = cos(q,v) — the head's exact
        // cosine rows then merge on one comparable scale (the conversion
        // the reference derives but skips, IvfPqVectorIndex.cs:178-195).
        val cosinePq = metric.equalsIgnoreCase("COSINE")
        // no INNERPRODUCT alias here: the manifest stores "IP", so the
        // generic metric-match check above already rejects any other
        // spelling before this branch is reached
        val ipPq = metric.equalsIgnoreCase("IP")
        require(metric.equalsIgnoreCase("L2") || cosinePq || ipPq,
          s"IVF_PQ index serves L2, COSINE or IP; cannot search with metric=$metric")
        // the general metric-match check above skips unknown ("") manifest
        // metrics; a COSINE fold over codes NOT built normalized (or an IP
        // fold over codes NOT built augmented) would be meaningless, so pin
        // each to an explicitly matching build metric
        require(!cosinePq || m.metric.equalsIgnoreCase("COSINE"),
          s"COSINE IVF_PQ search needs a COSINE-built tail (normalized " +
            s"codes); this index's build metric is '${m.metric}'")
        require(!ipPq || m.metric.equalsIgnoreCase("IP"),
          s"IP IVF_PQ search needs an IP-built tail (MIPS-augmented " +
            s"codes); this index's build metric is '${m.metric}'")
        val pqIdx = graft.operators.IvfPq.load(
          spark, s"$snap/ivfpq")
        val pqQueries =
          if (cosinePq)
            baseQueries.withColumn("qvec", graft.functions.vector_unit(col("qvec")))
          else if (ipPq) {
            // query side of the MIPS reduction: q' = [q, 0…] zero-padded to
            // the codebook's trained dim — the appended coordinates add
            // nothing to ‖q'−x'‖² beyond the constant M² (folded back below)
            val cbDim = pqIdx.cb.m * pqIdx.cb.dsub
            baseQueries.withColumn("qvec",
              concat(col("qvec"),
                array_repeat(lit(0.0f), lit(cbDim) - size(col("qvec")))))
          } else baseQueries
        val strMap = pqIdx.assigned.select("id", "id_str")
        // Edge: a ZERO corpus vector passes vector_unit unchanged, so its
        // ADC distance to a unit query is ≈1 and the fold scores it ≈0.5
        // where exact cosine says 0 — a bounded mid-scale misplacement in
        // ADC-only serving only (the head path and the refine rerank both
        // score true cosine 0; the reference's raw any-metric proxy is
        // wronger for every row, IvfPqVectorIndex.cs:163-199).
        val adcScore =
          if (cosinePq) (lit(1.0) + col("score") / 2).as("score") else col("score")
        val adcRaw = capScans(
          maskHead(
            graft.operators.IvfPq
              .scoredCandidates(
                graft.operators.IvfPq.Index(
                  pqIdx.assigned.select("id", "cluster_id", "codes"),
                  pqIdx.centroids, pqIdx.cb),
                pqQueries, nprobe)
              .join(strMap, Seq("id")))
            .select(col("query_id"), col("id_str"), adcScore),
          maxScans)
        val adcCands =
          if (!ipPq) adcRaw
          else {
            // fold the augmented-space ADC distance back onto the dot
            // scale: score = −‖q'−x'‖² = −(‖q‖² + M² − 2⟨q,x⟩) ⇒
            // ⟨q,x⟩ = (score + ‖q‖² + M²)/2. ‖q‖² is per-query (tiny
            // broadcast join); M² was persisted at build (memoized per
            // snapshot — constant, keep the read job off the hot path).
            // The head's exact dot rows then merge on the same scale.
            val maxSq = mipsMaxSqOf(tenant, index, m)
            val qn = baseQueries.select(col("query_id"),
              graft.functions.vector_dot(col("qvec"), col("qvec")).as("qn2"))
            adcRaw.join(broadcast(qn), Seq("query_id"))
              .select(col("query_id"), col("id_str"),
                ((col("score") + col("qn2") + lit(maxSq)) / 2).as("score"))
          }
        if (refine <= 0) adcCands
        else {
          // F1 semantics: the conjunctive tag filter applies BEFORE any
          // ranking cut, so the k·refine ADC cut below must select from
          // MEMBER candidates only — cutting unfiltered candidates would
          // starve the rerank under a selective filter (the k·refine
          // nearest unfiltered rows may contain no member at all) and
          // return short/empty where the same query unrefined answers
          // fully. Tail candidates are head-masked, so the snapshot's
          // tags are authoritative here; head rows join exact-scored
          // after this branch and the downstream filter handles them.
          val adcEligible =
            if (!tagFilter) adcCands
            else adcCands
              .join(broadcast(queries.select("query_id", "filter_tags")),
                "query_id")
              .join(snapshot.select(col("id_str"),
                coalesce(col("tags"), array().cast("array<string>"))
                  .as("tags")), Seq("id_str"), "left")
              .filter(coalesce(size(col("filter_tags")), lit(0)) === 0 ||
                forall(col("filter_tags"),
                  t => array_contains(coalesce(col("tags"),
                    array().cast("array<string>")), t)))
              .select("query_id", "id_str", "score")
          // bounded ADC cut (≤ k·refine rows per query), shared by both
          // rerank stores
          val cut = TopK.perGroup(
              adcEligible.select(col("query_id"),
                xxhash64(col("id_str")).as("id"), col("score")),
              Seq("query_id"), refineCutSize(k, refine))
            .select("query_id", "id")
          if (refineStore == "sq16") {
            // rerank against the SQ16 sidecar's DEQUANTIZED vectors — the
            // same floats the resident rows tier scores (this decode
            // expression is the bit-exact twin of Sq16Store.dequant), so
            // rows == plan holds for refined serving exactly like the
            // unrefined tiers
            // the IN-SCOPE manifest m: a second manifest read here could
            // disagree with the snapshot dir derived from m under a
            // concurrent rebuild (check v+1, read v)
            require(sq16TableExists(tenant, index, m),
              s"$tenant/$index snapshot has no sq16 sidecar; " +
                "rebuild the index or use refineStore=exact")
            val p16 = graft.operators.ScalarQuant.loadParams(
              s"$snap/sq16/params.json")
            val delta16 =
              if (p16.max > p16.min) (p16.max - p16.min) / 65535.0 else 0.0
            val codes16 = spark.read.parquet(s"$snap/sq16/codes")
            strMap.join(broadcast(codes16.join(broadcast(cut), Seq("id"))),
                Seq("id"))
              .join(broadcast(baseQueries), Seq("query_id"))
              .select(col("query_id"), col("id_str"),
                graft.functions.vector_score(metric, col("qvec"),
                  transform(col("qvec16"), c =>
                    (lit(p16.min.toDouble) + c * lit(delta16)).cast("float")))
                  .as("score"))
          } else {
            // raw vectors are only retained in refine-era snapshots; an
            // older snapshot must fail with the remedy, not an unresolved-
            // column error
            require(snapshot.columns.contains("vec"),
              s"$tenant/$index snapshot predates raw-vector retention; " +
                "rebuild the index to enable refine")
            // exact rerank: broadcast the tiny cut into the snapshot's
            // raw-vector table → exact score. Same small-side-always-
            // broadcast shape as hit hydration; the corpus-sized snapshot
            // is never shuffled.
            val snapVecs = snapshot.select(col("id_str"), col("vec"))
              .withColumn("id", xxhash64(col("id_str")))
            // raw qvec + raw snapshot vec: cosine is normalization-
            // invariant, so the rerank scores the TRUE metric exactly
            snapVecs.join(broadcast(cut), Seq("id"))
              .join(broadcast(baseQueries), Seq("query_id"))
              .select(col("query_id"), col("id_str"),
                graft.functions.vector_score(metric, col("qvec"), col("vec"))
                  .as("score"))
          }
        }
      case _ => // IVF_FLAT / FLAT share the inverted-list layout
        val tailIdx = tailIndexOf(tenant, index, m)
        val probeSet = IvfFlat.probes(tailIdx, baseQueries, metric, nprobe)
        val tailCandidates = maskHead(
          tailIdx.assigned.join(broadcast(probeSet), Seq("cluster_id")))
        capScans(tailCandidates, maxScans)
          .select(col("query_id"), col("id_str"),
            graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
    }

    // head candidates: exact brute-force scan of the fresh records — capped
    // by the same deterministic maxScans budget as the tail (the reference
    // caps EVERY scan, BruteForceVectorIndex.cs:288-344, including the
    // delta head; uncapped heads would let budget degradation leak)
    val candidates = headOpt match {
      case None => tailScored
      case Some((_, headLive)) =>
        val headScored = capScans(
          headLive.crossJoin(broadcast(baseQueries)), maxScans)
          .select(col("query_id"), col("id_str"),
            graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
        tailScored.unionByName(headScored)
    }

    // conjunctive tag filter BEFORE ranking (F1 semantics)
    val filtered =
      if (!tagFilter) candidates
      else {
        val snapTags = snapshot.select(col("id_str"),
          coalesce(col("tags"), array().cast("array<string>")).as("tags"))
        val tagsOf = headOpt match {
          case None => snapTags
          case Some((headIds, headLive)) =>
            headLive.select(col("id_str"), col("tags"))
              .unionByName(snapTags.join(headIds, Seq("id_str"), "left_anti"))
        }
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
    // snapshot ids are unique by construction; the union+distinct is only
    // needed when a fresh head can re-introduce ids
    val allIds = headOpt match {
      case None => snapshot.select("id_str")
      case Some((_, headLive)) =>
        snapshot.select("id_str").unionByName(headLive.select("id_str")).distinct()
    }
    val idMap = allIds.withColumn("id", xxhash64(col("id_str")))
      .join(broadcast(hitIds), Seq("id"), "left_semi")
    val withIds = hits.join(broadcast(idMap), Seq("id"))
      .select(col("query_id"), col("rank"), col("id_str").as("id"), col("score"))
    if (!withMeta) withIds
    else {
      // hydration: head meta wins over snapshot meta (F4/F5)
      val snapMeta = snapshot.select(col("id_str"), col("meta"))
      val metaOf = (headOpt match {
        case None => snapMeta
        case Some((headIds, headLive)) =>
          headLive.select(col("id_str"), col("meta"))
            .unionByName(snapMeta.join(headIds, Seq("id_str"), "left_anti"))
      }).join(broadcast(idMap.select("id_str")), Seq("id_str"), "left_semi")
      withIds.join(broadcast(metaOf), withIds("id") === metaOf("id_str"), "left")
        .drop("id_str")
    }
  }

  // memoized per-snapshot read handles: the tail Index (lazy driver-side
  // centroid snapshot + packed serving RDD) and the raw centroid table —
  // immutable once written, so safe to cache for the engine's lifetime
  private val tailIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, IvfFlat.Index]
  private def tailIndexOf(tenant: String, index: String, m: Manifest): IvfFlat.Index =
    tailIndexCache.getOrElseUpdate(s"$tenant/$index/v${m.version}", {
      val snap = snapDir(tenant, index, m)
      IvfFlat.Index(
        spark.read.parquet(s"$snap/vectors"),
        spark.read.parquet(s"$snap/centroids"))
    })

  // memoized IVF_PQ handle for the rows serving tier — same immutable-
  // per-version rationale as tailIndexOf; the handle's packedDriver
  // (resident byte codes) and codebook load lazily on first use
  private val pqIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfPq.Index]
  private def pqIndexOf(tenant: String, index: String,
                        m: Manifest): graft.operators.IvfPq.Index =
    pqIndexCache.getOrElseUpdate(s"$tenant/$index/v${m.version}", {
      val snap = snapDir(tenant, index, m)
      graft.operators.IvfPq.Index(
        spark.read.parquet(s"$snap/ivfpq/codes")
          .select("id", "cluster_id", "codes"),
        spark.read.parquet(s"$snap/ivfpq/centroids"),
        graft.operators.Pq.loadCodebook(spark, s"$snap/ivfpq/codebooks"))
    })

  // memoized driver-resident HNSW graphs for the rows serving tier —
  // None (over the residency bound) memoizes too, so oversized graph
  // sets pay the meta read once and every later call short-circuits
  private val hnswGraphsCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Array[(Int, graft.operators.Hnsw.Graph)]]]
  private def hnswGraphsOf(tenant: String, index: String,
                           m: Manifest): Option[Array[(Int, graft.operators.Hnsw.Graph)]] =
    hnswGraphsCache.getOrElseUpdate(s"$tenant/$index/v${m.version}",
      graft.operators.Hnsw.loadResident(
        spark, s"${snapDir(tenant, index, m)}/hnsw"))

  // MIPS fold constant M² for IP-built IVF_PQ snapshots — immutable per
  // version like the handles above; reading it per search call would put
  // a parquet-listing + head job on the serving hot path
  private val mipsMaxSqCache =
    scala.collection.concurrent.TrieMap.empty[String, Double]
  private def mipsMaxSqOf(tenant: String, index: String, m: Manifest): Double =
    mipsMaxSqCache.getOrElseUpdate(s"$tenant/$index/v${m.version}",
      spark.read.parquet(s"${snapDir(tenant, index, m)}/ivfpq/mips")
        .head.getDouble(0))

  /** Memoize built handles and PERMANENT denials (per-version
    * properties: missing table, per-handle over-budget — these never
    * change for the snapshot's lifetime); re-evaluate TRANSIENT denials
    * (JVM-global budget contention) on every call. Memoizing a
    * contention denial would make it permanent: a fresh engine instance
    * on a root whose previous instance still held the global budget at
    * first touch would refuse the handle FOREVER, long after the old
    * instance (and its share, weak-registry accounted) was GC'd. The
    * measured byte ESTIMATES are memoized separately below so a
    * contention retry never re-runs the measuring Spark job. Build races
    * self-heal: the putIfAbsent loser's handle is dropped and its
    * registry share evaporates with it (weak keys). */
  private def residentMemo[T](
      cache: scala.collection.concurrent.TrieMap[String, Option[T]],
      key: String)(build: => (Option[T], Boolean)): Option[T] =
    cache.get(key).getOrElse {
      val (v, memoize) = build
      if (memoize) cache.putIfAbsent(key, v).getOrElse(v) else v
    }

  // measured-bytes estimates per snapshot version (the one Spark agg a
  // residency decision costs) — memoized apart from the handles so a
  // transient global-budget denial retries against the registries only
  private val residentEstCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  // surrogate → user-facing string id for the rows serving entry — a
  // compact [[IdPool]], immutable per snapshot. Residency is decided by
  // EXACT measured bytes (one bounded agg) BEFORE any collect, against a
  // per-pool and a JVM-global budget; per-handle denial memoizes None
  // and the rows tier falls back to the plan. The pool itself is built
  // from executor-side pre-sorted packed runs (never n boxed driver rows).
  private val idPoolCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[IdPool]]
  private def idPoolOf(tenant: String, index: String,
                       m: Manifest): Option[IdPool] =
    residentMemo(idPoolCache, s"$tenant/$index/v${m.version}") {
      // inverted-list snapshots keep (id, id_str) in vectors/; IVF_PQ
      // snapshots alongside the codes; HNSW in its idmap table
      val sub = m.algo match {
        case "IVF_PQ" => "ivfpq/codes"
        case "HNSW" => "idmap"
        case _ => "vectors"
      }
      lazy val df = spark.read.parquet(s"${snapDir(tenant, index, m)}/$sub")
        .select(col("id"), col("id_str"))
      val est = residentEstCache.getOrElseUpdate(
        s"pool:$tenant/$index/v${m.version}", {
          val stats = df.agg(count(lit(1)),
            sum(octet_length(col("id_str")))).head
          val n = stats.getLong(0)
          val strBytes = if (stats.isNullAt(1)) 0L else stats.getLong(1)
          n * 12L + strBytes + 32L
        })
      if (est > idPoolMaxBytes) (None, true)
      else if (GraftEngine.idPoolBytesUsed + est >
          GraftEngine.IdPoolGlobalMaxBytes) (None, false)
      else {
        val runs = df.queryExecution.toRdd.mapPartitions { it =>
          // toString materializes an owned copy — UnsafeRow buffers are
          // reused across next() calls, so the bytes must not alias them
          IdPool.packRun(it.map(r => (r.getLong(0),
            r.getUTF8String(1).toString
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        }.collect()
        val pool = IdPool.merge(runs)
        GraftEngine.registerResident(pool, pool.bytes)
        (Some(pool), true)
      }
    }

  /** Resident SQ16 rerank store per snapshot version, or None when the
    * snapshot predates the sq16 sidecar, the vectors have mixed dims (no
    * flat layout), or the measured bytes exceed the store's OWN budgets
    * ([[GraftEngine.Sq16MaxBytesDefault]] / Sq16GlobalMaxBytes — separate
    * from the id-pool line so refine residency can't starve pools).
    * Permanent denial memoizes; refined calls then keep the plan
    * fallback. Global-budget contention retries (see [[residentMemo]]). */
  private val sq16StoreCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[graft.operators.Sq16Store]]
  // (n, dim) per version; None = permanently ineligible (no sidecar,
  // empty, or mixed dims)
  private val sq16StatsCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[(Long, Int)]]
  private def sq16StoreOf(tenant: String, index: String,
                          m: Manifest): Option[graft.operators.Sq16Store] =
    residentMemo(sq16StoreCache, s"$tenant/$index/v${m.version}") {
      val segDir = s"${snapDir(tenant, index, m)}/sq16/segments"
      val useSidecar = !sq16IgnoreSidecar &&
        graft.operators.Sq16Store.sidecarExists(segDir)
      val ndOpt = sq16StatsCache.getOrElseUpdate(
        s"$tenant/$index/v${m.version}", {
          if (useSidecar) {
            // segment sidecar: rows/dim from its meta — no Spark job
            // (the parquet aggregation below scans the full array
            // column just to size it)
            val (n, d) = graft.operators.Sq16Store.sidecarStats(segDir)
            if (n == 0) None else Some((n, d))
          } else if (!sq16TableExists(tenant, index, m)) None
          else {
            val codes = spark.read.parquet(
              s"${snapDir(tenant, index, m)}/sq16/codes")
            val stats = codes.agg(count(lit(1)),
              min(size(col("qvec16"))),
              max(size(col("qvec16")))).head
            val n = stats.getLong(0)
            if (n == 0 || stats.isNullAt(1) ||
                stats.getInt(1) != stats.getInt(2)) None
            else Some((n, stats.getInt(1)))
          }
        })
      ndOpt match {
        case None => (None, true)
        case Some((n, dim)) =>
          // shared estimator — includes per-segment headers, so the
          // admitted estimate can never undercount what the built store
          // registers (ADVICE r9)
          val est = graft.operators.Sq16Store.estimateBytes(n, dim)
          // byte budgets are the ONLY capacity gate: the store is
          // segmented (Sq16Store.SegMaxCodes), so no Int-indexed-array
          // ceiling exists to deny around
          if (est > sq16MaxBytes)
            (None, true)
          else GraftEngine.tryReserveSq16(est) match {
            case None => (None, false)
            case Some(token) =>
              // the reservation covers the load/build window, so two
              // snapshots admitting concurrently can't both pass one
              // headroom read and overshoot the ceiling (ADVICE r10)
              try {
                // segment sidecar when the snapshot carries it
                // (sequential file read, no Spark jobs); wave-fetch
                // build for pre-sidecar snapshots (or when the
                // deployment opts out via sq16IgnoreSidecar)
                val store =
                  if (useSidecar)
                    graft.operators.Sq16Store.load(segDir)
                  else {
                    val codes = spark.read.parquet(
                      s"${snapDir(tenant, index, m)}/sq16/codes")
                    val p = graft.operators.ScalarQuant.loadParams(
                      s"${snapDir(tenant, index, m)}/sq16/params.json")
                    graft.operators.Sq16Store.buildResident(
                      codes, dim, p.min, p.max, estBytes = est)
                  }
                GraftEngine.registerSq16(store, store.bytes)
                // upgrade path (ADVICE r10): a u8 store admitted while
                // sq16 was globally denied would otherwise stay
                // registered against the refine line for the snapshot's
                // lifetime while never served again (the serve path's
                // orElse short-circuits once this store exists) — evict
                // its memo and return its share
                sq8StoreCache.remove(s"$tenant/$index/v${m.version}")
                  .foreach(_.foreach(GraftEngine.unregisterSq16))
                (Some(store), true)
              } finally GraftEngine.unregisterSq16(token)
          }
      }
    }

  /** Degraded-tier u8 store (see `refineU8Fallback`): derived by
    * streaming the sq16 SEGMENT sidecar at half size, against the SAME
    * budget line as the sq16 store (it is the refine-store budget;
    * the whole point is fitting where the full-precision copy did not).
    * Snapshots without a segment sidecar memoize None — the degraded
    * tier exists for budget-tight serving, which reads sidecars written
    * at build time. */
  private val sq8StoreCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[graft.operators.Sq8Store]]
  private def sq8StoreOf(tenant: String, index: String,
                         m: Manifest): Option[graft.operators.Sq8Store] =
    residentMemo(sq8StoreCache, s"$tenant/$index/v${m.version}") {
      val segDir = s"${snapDir(tenant, index, m)}/sq16/segments"
      if (!graft.operators.Sq16Store.sidecarExists(segDir)) (None, true)
      else {
        val (n, dim) = graft.operators.Sq16Store.sidecarStats(segDir)
        if (n == 0) (None, true)
        else {
          val est = graft.operators.Sq8Store.estimateBytes(n, dim)
          if (est > sq16MaxBytes) (None, true)
          else GraftEngine.tryReserveSq16(est) match {
            case None => (None, false)
            case Some(token) =>
              try {
                val store = graft.operators.Sq16Store.loadAsU8(segDir)
                GraftEngine.registerSq16(store, store.bytes)
                (Some(store), true)
              } finally GraftEngine.unregisterSq16(token)
          }
        }
      }
    }

  private def sq16TableExists(tenant: String, index: String,
                              m: Manifest): Boolean =
    Files.isDirectory(
      Paths.get(s"${snapDir(tenant, index, m)}/sq16/codes"))

  /** Refine-store choice for PLAN-path refined calls (the wire's
    * WITH_META branch and any other direct [[search]] caller that wants
    * tier parity): "sq16" when the snapshot carries the sidecar — the
    * same dequantized floats the rows tier reranks with — else "exact"
    * (pre-sidecar snapshots). Mirrors [[searchRowsTraced]]'s fallback. */
  private[graft] def refineStoreFor(tenant: String, index: String): String = {
    val m = manifest(tenant, index)
    if (m.algo == "IVF_PQ" && sq16TableExists(tenant, index, m)) "sq16"
    else "exact"
  }

  // tag → sorted surrogate-id array for the FILTERED rows serving tier
  // (the reference keeps per-record tags in the same process heap it
  // scans, VectorCommandSet.cs:461-480). Immutable per snapshot version;
  // sorted arrays (not hash sets) so the scan kernel's membership test
  // is one allocation-free binary search. Built like [[IdPool]]: each
  // partition groups its (tag, surrogate) pairs into per-tag arrays on
  // the EXECUTORS, the driver concatenates + sorts per tag — transient
  // driver footprint = the final index, never one boxed row per
  // (record, tag). Residency by exact measured bytes (one bounded agg)
  // against the same per-index bound and JVM-global registry as the id
  // pool; denial memoizes None and filtered calls keep the distributed
  // filtered plan.
  private val tagSurrogatesCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Map[String, Array[Long]]]]
  private def tagSurrogatesOf(tenant: String, index: String,
                              m: Manifest): Option[Map[String, Array[Long]]] =
    residentMemo(tagSurrogatesCache, s"$tenant/$index/v${m.version}") {
      val recs = spark.read.parquet(s"${snapDir(tenant, index, m)}/records")
      val tagsCol = coalesce(col("tags"), array().cast("array<string>"))
      // size() yields -1 for null arrays under legacy configs; coalesce
      // makes it 0. Bytes ≈ 8 per (record, tag) entry — the per-DISTINCT-
      // tag key strings are noise next to the long arrays.
      val est = residentEstCache.getOrElseUpdate(
        s"tags:$tenant/$index/v${m.version}", {
          val stats = recs.agg(sum(size(tagsCol))).head
          val entries = if (stats.isNullAt(0)) 0L else stats.getLong(0)
          entries * 8L + 64L
        })
      if (est > idPoolMaxBytes) (None, true)
      else if (GraftEngine.idPoolBytesUsed + est >
          GraftEngine.IdPoolGlobalMaxBytes) (None, false)
      else {
        val parts = recs
          .select(xxhash64(col("id_str")).as("sg"),
            explode(tagsCol).as("tag"))
          .queryExecution.toRdd.mapPartitions { it =>
            val local = scala.collection.mutable.HashMap
              .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
            while (it.hasNext) {
              val r = it.next()
              // toString: an owned copy, never the reused UnsafeRow buffer
              local.getOrElseUpdate(r.getUTF8String(1).toString,
                scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(0)
            }
            local.iterator.map { case (t, buf) => (t, buf.toArray) }
          }.collect()
        val idx = parts.groupBy(_._1).map { case (t, runs) =>
          val total = runs.map(_._2.length).sum
          val a = new Array[Long](total)
          var o = 0
          runs.foreach { case (_, run) =>
            System.arraycopy(run, 0, a, o, run.length); o += run.length
          }
          java.util.Arrays.sort(a)
          t -> a
        }
        GraftEngine.registerResident(idx, est)
        (Some(idx), true)
      }
    }

  /** Allowed-set size from which the filtered scan kernels test a
    * [[graft.operators.LongHashSet]] / row bitmap instead of
    * binary-searching the sorted array: below ~131k entries (~1 MB) the
    * array is cache-resident and the tree walk is cheap; above it each
    * probed row pays ~5-7 cache-missing levels. Constructor-tunable so
    * specs can force the hash/bitmap wiring on small fixtures. */
  private val HashAllowedMinEntries = hashAllowedMinEntries

  // memoized per-(snapshot, tag) hash membership for large single-tag
  // filters — same residency registry as the pools/tag arrays (the set
  // is ~2× the array's bytes; only tags that actually serve large
  // filtered calls pay it)
  // private[graft]: specs assert budget-denial memoization directly
  private[graft] val tagHashSetCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[graft.operators.LongHashSet]]
  private def tagHashSetOf(tenant: String, index: String, m: Manifest,
                           tag: String,
                           sorted: Array[Long]): graft.operators.LongHashSet =
    residentMemo(tagHashSetCache, s"$tenant/$index/v${m.version}#$tag") {
      // budget BEFORE building: a half-corpus tag's set is ~128 MB at
      // 10M rows (capacity = next pow2 ≥ 2n, 8 B/slot) and memoizes per
      // (version, tag) — many large tags could otherwise grow driver
      // heap unboundedly and starve future id pools. Per-handle denial
      // memoizes None (null to the kernels) and the scan keeps the
      // sorted-array binary search — slower, never wrong.
      // shared estimator: a hand-copied capacity formula here would
      // silently diverge from the bytes the built set registers if the
      // set's load factor or header ever changed
      val est = graft.operators.LongHashSet.estimateBytes(sorted.length)
      if (est > idPoolMaxBytes) (None, true)
      else if (GraftEngine.idPoolBytesUsed + est >
          GraftEngine.IdPoolGlobalMaxBytes) (None, false)
      else {
        val set = graft.operators.LongHashSet.from(sorted)
        GraftEngine.registerResident(set, set.bytes)
        (Some(set), true)
      }
    }.orNull

  // per-(snapshot, tag) ROW-POSITION bitmaps aligned with the resident
  // tier's parts array: filtered membership becomes a sequential bit
  // test in scan order — no per-row probe into any large table (the
  // allowed-set endgame; ~nRows/8 bytes per tag, registered like the
  // rest). Alignment is sound because parts arrays are lazy vals on the
  // per-version memoized handles, so their identity and row order are
  // fixed for the snapshot's lifetime.
  // private[graft]: specs assert bits survive hash-set budget denial
  private[graft] val tagBitsCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Array[Array[Long]]]]
  private def tagRowBitsOf(tenant: String, index: String, m: Manifest,
                           tag: String, idsPerPart: Array[Array[Long]],
                           member: graft.operators.LongHashSet,
                           sorted: Array[Long] = null): Array[Array[Long]] =
    residentMemo(tagBitsCache, s"$tenant/$index/v${m.version}#$tag") {
      // same budget gate as the hash set (est BEFORE building, permanent
      // denial memoized): bitmaps are small (~nRows/8 bytes per tag) but
      // per-(version, tag) residents all draw from one pool
      val est = idsPerPart.iterator
        .map(ids => ((ids.length + 63) >>> 6).toLong * 8L).sum + 64L
      if (est > idPoolMaxBytes) (None, true)
      else if (GraftEngine.idPoolBytesUsed + est >
          GraftEngine.IdPoolGlobalMaxBytes) (None, false)
      else {
        // membership via the probe set when one exists; a BUDGET-DENIED
        // hash set must not take the bitmap down with it — the one-time
        // construction pass binary-searches the sorted array instead
        // (~nRows·log|tag| comparisons, memoized per (version, tag)),
        // and the bitmap itself is ~100× smaller than the set it
        // replaces (nRows/8 bytes vs 16 B/entry), so at 10M rows the
        // exact corpora whose hash sets blow the budget are the ones
        // that most need this path
        val bits = idsPerPart.map { ids =>
          val b = new Array[Long]((ids.length + 63) >>> 6)
          var r = 0
          while (r < ids.length) {
            val in =
              if (member != null) member.contains(ids(r))
              else java.util.Arrays.binarySearch(sorted, ids(r)) >= 0
            if (in) b(r >>> 6) |= 1L << (r & 63)
            r += 1
          }
          b
        }
        GraftEngine.registerResident(bits,
          bits.map(_.length.toLong * 8L).sum + 64L)
        (Some(bits), true)
      }
    }.orNull

  // Deliberately separate from tailIndexOf's Index.centroidsLocal: the
  // centroid table exists for EVERY algo (IVF_PQ writes it for the cache
  // layer), while constructing an IvfFlat.Index eagerly resolves the
  // $snap/vectors path, which HNSW/IVF_PQ snapshots don't have.
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[(Int, Array[Float])]]
  private def centroidsLocalOf(tenant: String, index: String,
                               m: Manifest): Array[(Int, Array[Float])] =
    centroidCache.getOrElseUpdate(s"$tenant/$index/v${m.version}",
      spark.read.parquet(s"${snapDir(tenant, index, m)}/centroids")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1))

  /** Pre-materialize every built index's resident serving handles
    * (packed floats / byte codes / graphs, plus the id pool) so the
    * FIRST wire call after a process restart serves at steady-state
    * latency instead of paying the one-time pack + pool build (~20-40 s
    * at the 10M rung). The reference is effectively warm at boot — its
    * vectors re-enter process memory during AOF replay before the
    * socket opens; this is the bounded analog, run from ServerMain on a
    * background thread so the planes open immediately. Residency
    * budgets still decide: an over-budget index memoizes its denial
    * here exactly as it would on first call. Per-index failures log and
    * skip — warming is an optimization, never a correctness gate.
    * Returns (warmed, skipped). */
  def warmServing(): (Int, Int) = {
    val base = Paths.get(s"$root/indexes")
    if (!Files.isDirectory(base)) return (0, 0)
    var ok = 0
    var skipped = 0
    import scala.jdk.CollectionConverters._
    def subdirs(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val l = Files.list(p)
      try l.iterator().asScala.toSeq.filter(Files.isDirectory(_))
      finally l.close()
    }
    for (tDir <- subdirs(base); iDir <- subdirs(tDir)) {
      val tenant = tDir.getFileName.toString
      val index = iDir.getFileName.toString
      try {
        val m = manifest(tenant, index)
        if (m.version > 0) {
          // force EVERY lazy the first serving call would pay, not just
          // the big packed collects: clusterCounts is a corpus-wide
          // groupBy job (~2.4 s at the 10M rung — measured as exactly
          // the residue the r8 warm-boot bench row exposed when warm
          // only touched packedDriver), centroidsLocal a small collect.
          // The id pool warms AFTER the algo-specific residency checks,
          // mirroring the serving path's codes → pool → store gate order
          // (searchRowsTraced): a codes-denied PQ index or a graph-denied
          // HNSW index can never serve rows-native, so warming its pool
          // would strand bytes against IdPoolGlobalMaxBytes for a tier
          // that will never run (ADVICE r9)
          val rowsSized = m.nVectors <= RowsServeMaxRows
          m.algo match {
            case "IVF_PQ" =>
              val pq = pqIndexOf(tenant, index, m)
              pq.packedDriver
              pq.centroidsLocal
              pq.clusterCounts
              pq.sizeStats
              // refined-serving store — warmed under the SAME gates the
              // serving path applies (store build is the last residency
              // decision, after codes and pool admit): a pool-denied
              // index can never serve rows-native, so warming its store
              // would strand the bytes against the global sq16 line
              if (rowsSized && pq.packedDriver.isDefined &&
                  idPoolOf(tenant, index, m).isDefined) {
                if (sq16StoreOf(tenant, index, m).isEmpty && refineU8Fallback)
                  sq8StoreOf(tenant, index, m)
              }
            case "HNSW" =>
              // serving computes graphs only for rows-sized corpora; the
              // same gate here keeps warm from paying a graph collect an
              // oversized index would re-deny at serve time
              if (rowsSized && hnswGraphsOf(tenant, index, m).isDefined)
                idPoolOf(tenant, index, m)
            case _ =>
              val tail = tailIndexOf(tenant, index, m)
              tail.packedDriver
              tail.centroidsLocal
              tail.clusterCounts
              tail.sizeStats
              if (rowsSized) idPoolOf(tenant, index, m)
          }
          ok += 1
        } else skipped += 1
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[warm] $tenant/$index skipped: ${e.getMessage}")
          skipped += 1
      }
    }
    (ok, skipped)
  }

  /** Drop memoized read handles (and their cached packed RDD blocks) for
    * snapshot versions older than `keep` — mirrors [[gcOldSnapshots]]'s
    * retention window, so repeated builds/compactions don't accumulate
    * stale Index handles and pinned storage for the engine's lifetime. */
  private def evictStaleHandles(tenant: String, index: String, keep: Long): Unit = {
    val prefix = s"$tenant/$index/v"
    def versionOf(k: String): Option[Long] = {
      val v = k.stripPrefix(prefix)
      if (k.startsWith(prefix) && v.forall(_.isDigit)) Some(v.toLong) else None
    }
    tailIndexCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep))
        // packedIfBuilt, NOT packed: forcing the lazy here would launch
        // the pack job against the snapshot files this GC just deleted
        tailIndexCache.remove(k)
          .foreach(_.packedIfBuilt.foreach(_.unpersist(blocking = false)))
    }
    centroidCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep)) centroidCache.remove(k)
    }
    mipsMaxSqCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep)) mipsMaxSqCache.remove(k)
    }
    idPoolCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep))
        idPoolCache.remove(k).foreach(_.foreach(GraftEngine.unregisterResident))
    }
    tagSurrogatesCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep))
        tagSurrogatesCache.remove(k).foreach(_.foreach(GraftEngine.unregisterResident))
    }
    tagHashSetCache.keys.toSeq.foreach { k =>
      // keys carry a "#tag" suffix after the version
      if (versionOf(k.takeWhile(_ != '#')).exists(_ < keep))
        tagHashSetCache.remove(k).foreach(_.foreach(GraftEngine.unregisterResident))
    }
    tagBitsCache.keys.toSeq.foreach { k =>
      if (versionOf(k.takeWhile(_ != '#')).exists(_ < keep))
        tagBitsCache.remove(k).foreach(_.foreach(GraftEngine.unregisterResident))
    }
    // resident-tier handles: dropping the map entry releases the packed
    // byte codes / graphs to GC, which also frees their share of the
    // weak-keyed global residency budgets — without this, every rebuild
    // leaks its predecessor's resident arrays for the engine's lifetime
    // and the budget eventually denies residency to LIVE versions
    pqIndexCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep)) pqIndexCache.remove(k)
    }
    hnswGraphsCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep)) hnswGraphsCache.remove(k)
    }
    sq16StoreCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep))
        sq16StoreCache.remove(k).foreach(_.foreach(GraftEngine.unregisterSq16))
    }
    sq8StoreCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep))
        sq8StoreCache.remove(k).foreach(_.foreach(GraftEngine.unregisterSq16))
    }
    // measurement memos (bytes, not handles) for evicted versions
    sq16StatsCache.keys.toSeq.foreach { k =>
      if (versionOf(k).exists(_ < keep)) sq16StatsCache.remove(k)
    }
    residentEstCache.keys.toSeq.foreach { k =>
      // keys carry a "pool:"/"tags:" prefix before tenant/index/vN
      if (versionOf(k.dropWhile(_ != ':').drop(1)).exists(_ < keep))
        residentEstCache.remove(k)
    }
  }

  // -------------------------------------------------------------------
  // semantic-cluster override for the L2 cache layer (reference:
  // SemanticClusterRegistry fed by POST centroids, IndexController.cs:251-292
  // + sidecar semantic_model.py:30-53 — the cache clustering is allowed to
  // come from an externally trained model, independent of the index tail)
  // -------------------------------------------------------------------

  private def cacheCentroidsPath(tenant: String, index: String) =
    s"$root/cache/$tenant/$index/centroids"

  private val cacheCentroidMemo =
    scala.collection.concurrent.TrieMap.empty[String, Option[Array[(Int, Array[Float])]]]

  private def cacheCentroidOverride(tenant: String,
                                    index: String): Option[Array[(Int, Array[Float])]] =
    cacheCentroidMemo.getOrElseUpdate(s"$tenant/$index", {
      val p = cacheCentroidsPath(tenant, index)
      if (!Files.exists(Paths.get(p))) None
      else Some(spark.read.parquet(p)
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1))
    })

  /** Centroids driving the L2 semantic-cache layer: the pushed override
    * when present, the index tail's own centroids otherwise. */
  private def l2CentroidsLocal(tenant: String, index: String,
                               m: Manifest): Array[(Int, Array[Float])] =
    cacheCentroidOverride(tenant, index).getOrElse {
      // HNSW snapshots have no centroid table (graphs carry no coarse
      // clustering) — the L2 cache layer simply contributes no probe
      // keys there; L0/L0.5/L1 still serve. A pushed semantic-cluster
      // model (the override above) re-enables L2 for any algo.
      if (m.algo == "HNSW") Array.empty
      else centroidsLocalOf(tenant, index, m)
    }

  /** Install an externally trained semantic-cluster model for the L2 cache
    * layer (reference: POST /v1/indexes/{t}/{i}/centroids). Changing the
    * clustering re-keys the L2 layer, so the epoch is bumped — old entries
    * (keyed by the previous cluster ids) become stale, exactly like the
    * reference's UpdateCentroids epoch bump (IndexController.cs:277).
    * centroids: (cluster_id INT, centroid ARRAY<FLOAT>). */
  def setCacheCentroids(tenant: String, index: String, centroids: DataFrame): Unit = {
    centroids.select(col("cluster_id").cast("int").as("cluster_id"),
        col("centroid"))
      .write.mode("overwrite").parquet(cacheCentroidsPath(tenant, index))
    cacheCentroidMemo.remove(s"$tenant/$index")
    invalidateCache(tenant, index)
  }

  // -------------------------------------------------------------------
  // snapshot export / import (reference: POST {t}/{i}/snapshot + /load,
  // IndexController.cs:125-228 — index state moves as files; the record
  // store stays where it is)
  // -------------------------------------------------------------------

  private def copyTree(src: java.nio.file.Path, dest: java.nio.file.Path): Unit = {
    Files.walk(src).forEach { p =>
      val target = dest.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** Export the current built snapshot (tail artifacts + manifest) to an
    * external directory. Requires a completed build. */
  def exportSnapshot(tenant: String, index: String, dest: String): Unit = {
    val m = manifest(tenant, index)
    require(m.version > 0,
      s"cannot export $tenant/$index: no built snapshot (build first)")
    val snap = snapDir(tenant, index, m)
    copyTree(Paths.get(snap), Paths.get(s"$dest/snapshot"))
    Files.createDirectories(Paths.get(dest))
    Files.writeString(Paths.get(s"$dest/manifest.json"),
      s"""{"epoch": ${m.epoch}, "buildWatermark": ${m.buildWatermark}, "algo": "${m.algo}", "nVectors": ${m.nVectors}, "version": ${m.version}, "metric": "${m.metric}", "headDirty": ${m.headDirty}}""")
  }

  /** Import an exported snapshot as this index's next version: the tail
    * serves the imported artifacts; local log rows newer than the imported
    * build watermark surface through the delta head as usual. */
  def importSnapshot(tenant: String, index: String, src: String): Unit = {
    val s = Files.readString(Paths.get(s"$src/manifest.json"))
    def field(k: String): Long =
      raw""""$k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    val algo = raw""""algo"\s*:\s*"([A-Z_]+)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("IVF_FLAT")
    val metric = raw""""metric"\s*:\s*"([A-Za-z_]+)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("L2")
    val m0 = manifest(tenant, index)
    val newVersion = m0.version + 1
    copyTree(Paths.get(s"$src/snapshot"),
      Paths.get(s"${indexPath(tenant, index)}/v$newVersion"))
    // headDirty stays 1: the local log's relation to the imported
    // watermark is unknown, so the head path must stay on
    withManifestLock(tenant, index) {
      val mNow = manifest(tenant, index)
      writeManifest(tenant, index,
        Manifest(mNow.epoch + 1, field("buildWatermark"), algo, field("nVectors"),
          newVersion, metric, headDirty = 1))
    }
    gcOldSnapshots(tenant, index, keep = newVersion - 1)
    evictStaleHandles(tenant, index, keep = newVersion - 1)
  }

  /** Incremental compaction: fold the current state into a fresh tail
    * snapshot WITHOUT retraining the coarse codebook — every live record
    * is assigned to its nearest EXISTING centroid in one pass
    * (reference: IVF adds land in inverted lists without retrain,
    * IvfFlatVectorIndex.cs:39-54; a full [[build]] is the retrain).
    * At scale this is the routine compaction: KMeans retraining is the
    * expensive step and cluster geometry drifts slowly, so retrain on a
    * cadence and fold incrementally in between. IVF_FLAT/FLAT only. */
  def compactIncremental(tenant: String, index: String): Unit = {
    val m0 = manifest(tenant, index)
    require(m0.algo == "IVF_FLAT" || m0.algo == "FLAT",
      s"incremental compaction needs an inverted-list tail, got ${m0.algo}")
    val snap0 = snapDir(tenant, index, m0)
    val centroids = spark.read.parquet(s"$snap0/centroids")
    val state = currentState(tenant, index)
    val wmRow = state.agg(max("updated_at"), count(lit(1))).head
    require(!wmRow.isNullAt(0),
      s"cannot compact $tenant/$index: current state is empty")
    val keyed = state.select(col("id").as("id_str"),
        col("vector").as("vec"), col("meta"), col("tags"))
      .withColumn("id", xxhash64(col("id_str")))
    val newVersion = m0.version + 1
    val dir = s"${indexPath(tenant, index)}/v$newVersion"
    val idx0 = IvfFlat.Index(spark.emptyDataFrame, centroids)
    // assignment MUST reproduce build()'s geometry: COSINE tails are
    // cosine-trained (cosine argmax), everything else euclidean-trained —
    // an L2 re-assignment of a cosine tail would silently reshape the
    // lists away from the probe ranking later cosine searches use
    val assignMetric = if (m0.metric.equalsIgnoreCase("COSINE")) "COSINE" else "L2"
    IvfFlat.assign(keyed.select("id", "vec", "id_str"), idx0, assignMetric)
      .write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$dir/vectors")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    keyed.select("id_str", "meta", "tags")
      .write.mode("overwrite").parquet(s"$dir/records")
    // same concurrent-writer guard as build(), same lock discipline
    withManifestLock(tenant, index) {
      val mNow = manifest(tenant, index)
      writeManifest(tenant, index, Manifest(mNow.epoch + 1, wmRow.getLong(0),
        m0.algo, wmRow.getLong(1), newVersion, m0.metric,
        headDirty = if (mNow.epoch != m0.epoch) 1 else 0))
    }
    gcOldSnapshots(tenant, index, keep = newVersion - 1)
    evictStaleHandles(tenant, index, keep = newVersion - 1)
  }

  // -------------------------------------------------------------------
  // cached search (SURVEY §3.1 steps 6-13 assembled)
  // -------------------------------------------------------------------

  /** Parquet part-file ceiling for the entry table before an inline
    * compaction pass: the per-call validity probe scans every entry file,
    * so unbounded appends would grow per-call cost with serving duration. */
  private val CacheGcFileThreshold = 64L

  /** Row ceiling for the rows serving tier's manifest gate — a cheap
    * PRE-gate, not the admission decision: every rows-tier serve needs
    * the resident [[IdPool]] (sorted longs + one UTF-8 blob, ≥ 12 bytes
    * per entry before the id text), so `idPoolMaxBytes / 12` is the row
    * count past which NO pool could be admitted even with zero-length
    * ids — the gate skips the residency-estimate jobs for corpora the
    * byte budgets could never accept, and everything under it is decided
    * by exact measured bytes in [[idPoolOf]] / [[sq16StoreOf]] /
    * packedDriver (per-structure + JVM-global budgets). Corpora past any
    * budget fall back to the DataFrame plan, which resolves ids with a
    * broadcast semi-join instead of a resident map. Floored at 16M so
    * deliberately tiny test budgets still exercise the measured-byte
    * denial paths rather than this gate. At the 512 MB default the gate
    * sits at ~44.7M rows; a 20M×dim128 IVF_PQ corpus (packed codes
    * ~480 MB at 24 B/vec — the BINDING line on the plain path, denying
    * at ~22.4M of its 512 MB budget; pool ~420 MB of 512 MB; segmented
    * sq16 refine store 5.3 GB under its 8 GiB line) now serves RESIDENT
    * on the plain, refined, AND filtered paths (Engine10mServeMain
    * 20000000 measures exactly that).
    * (Was a scalar 16M; before that 1M when the resolver was a boxed
    * Map — the compact pool is what lets the wire serve 10M+ rungs
    * driver-side.) */
  private val RowsServeMaxRows =
    math.max(16000000L, idPoolMaxBytes / 12L)

  /** Miss-batch bound for [[searchCached]]'s zero-job serving shortcut:
    * batches at most this size collect their miss queries (≤1024 × dim
    * floats — single-digit MB) and serve through [[searchRows]]; larger
    * batches stay on the distributed search plan. [[searchRows]]'s own
    * internal fallback (full plan + collect) stays bounded by the same
    * cap: worst case ≤1024 × k result rows come back to the driver. */
  private val CachedMissLocalMaxQueries = 1024L

  private def cacheEntriesPath(tenant: String, index: String) =
    s"$root/cache/$tenant/$index/entries"
  private def cacheAliasPath(tenant: String, index: String) =
    s"$root/cache/$tenant/$index/aliases"

  /** Cache invalidation (reference: CacheController invalidate + the epoch
    * machinery, VectorIndexRegistry.cs:52-68): bumping the epoch makes
    * every cached entry stale at probe time without touching the files. */
  def invalidateCache(tenant: String, index: String): Unit =
    withManifestLock(tenant, index) {
      // epoch-only bump: no data changed, so head-dirtiness is untouched
      val m = manifest(tenant, index)
      writeManifest(tenant, index, m.copy(epoch = m.epoch + 1))
    }

  /** Cache flush (reference: CacheController flush endpoint) — removes all
    * entries and aliases for the index, including rows-path inserts still
    * pending their durable append (a later flush must not resurrect an
    * explicitly flushed entry). Runs under the per-index lock so an
    * in-flight [[flushCachePending]] cannot drain-then-write around the
    * delete, and drops the resident maps outright: they must not outlive
    * the entries they cache, and the missing-dir fingerprint (0) would
    * otherwise collide with the pre-first-write stamp and let flushed
    * in-heap entries keep serving. */
  def flushCache(tenant: String, index: String): Unit =
    withManifestLock(tenant, index) {
      val key = s"$tenant/$index"
      pendingEntryRows.remove(key)
      pendingEntryCounts.remove(key)
      pendingEntrySince.remove(key)
      residentL0Cache.remove(key)
      residentAliasCache.remove(key)
      Seq(cacheEntriesPath(tenant, index), cacheAliasPath(tenant, index))
        .foreach(d => deleteTree(Paths.get(d)))
    }

  /** Register canonical-alias mappings for the L0.5 layer
    * (reference: DataModel/CanonicalKeyMap.cs:18-44). aliases:
    * (source_key LONG, canonical_key LONG, confidence DOUBLE). */
  def putAliases(tenant: String, index: String, aliases: DataFrame): Unit =
    aliases.select("source_key", "canonical_key", "confidence")
      .write.mode("append").parquet(cacheAliasPath(tenant, index))

  /** Raw cache-entry table (for tests / stats): one row per populated
    * (cache_key, layer). */
  def cacheEntries(tenant: String, index: String): DataFrame =
    spark.read.parquet(cacheEntriesPath(tenant, index))

  // separate tree from metrics/: billingUsage enumerates metrics/<tenant>/*
  // as per-index hit/miss logs and must not pick this up
  private def evictionsPath(tenant: String, index: String) =
    s"$root/metrics_gc/$tenant/$index"

  // (entries bytes, now) at the last quota sweep that freed nothing —
  // see the populate path's rate-limit note
  private val fruitlessSweepMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  private def dirBytes(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }

  private def dirFileCount(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }

  /** Entry-table GC (reference: lazy expiry eviction + bounded cache,
    * MemoryCacheStorage.cs:20-86): rewrite the entry table keeping only
    * LIVE entries — current epoch, unexpired at `now`, newest per
    * cache_key (the same validity rule [[searchCached]] probes with) —
    * and count everything dropped as evictions (VEC.STATS
    * `cache_eviction_total`). Without this the table grows one file set
    * per miss batch forever and the per-call validity window scans the
    * whole history — the 100×-serving-duration scale killer. Returns the
    * number of evicted entries.
    *
    * Cache WRITE paths (populate, this compaction, the metrics fold) all
    * serialize on the per-index manifest lock, so an appending thread
    * can't slip a file set between the read and the swap. Concurrent
    * READERS of the entry table during a swap are the caller's contract:
    * searchCached materializes (localCheckpoint) everything it keeps, so
    * engine calls are safe; external readers holding lazy plans over
    * [[cacheEntries]] across a GC are not. */
  def compactCacheEntries(tenant: String, index: String, now: Long): Long = {
    val p = cacheEntriesPath(tenant, index)
    if (!Files.exists(Paths.get(p))) 0L
    else withManifestLock(tenant, index) {
      val m = manifest(tenant, index)
      // live rows sort first, so vrn==1 ∧ live picks the newest LIVE entry
      // per key — identical to the entry searchCached's probe would serve
      // (its validity filter runs before its ranking window)
      val wNewest = Window.partitionBy("cache_key")
        .orderBy(col("live").desc, col("written_at").desc,
          xxhash64(to_json(col("hits"))))
      val counted = cacheEntries(tenant, index)
        .withColumn("live",
          col("epoch") === m.epoch && col("expires_at") > now)
        .withColumn("vrn",
          row_number().over(wNewest))
        .withColumn("keep", col("live") && col("vrn") === 1)
        .cache()
      val agg = counted.agg(count(lit(1)), count(when(col("keep"), 1))).head
      val (total, kept) = (agg.getLong(0), agg.getLong(1))
      val evicted = total - kept
      // rewrite also when the FILE count (not just the row count) is what
      // triggered us: 65 one-row appends of live entries evict nothing but
      // still need coalescing, or the per-call probe scan keeps growing
      if (evicted > 0 || dirFileCount(p) > CacheGcFileThreshold) {
        counted.filter(col("keep"))
          .drop("live", "vrn", "keep")
          .write.mode("overwrite").parquet(tmpPath(s"entries/$tenant/$index"))
        counted.unpersist()
        swapInto(tmpPath(s"entries/$tenant/$index"), Paths.get(p))
        if (evicted > 0) {
          import spark.implicits._
          Seq((now, evicted)).toDF("ts", "evicted")
            .write.mode("append").parquet(evictionsPath(tenant, index))
        }
      } else counted.unpersist()
      evicted
    }
  }

  /** Scratch dir OUTSIDE every enumerated tree (billingUsage lists the
    * children of metrics/<tenant>; cache/<t>/<i> holds the live tables) —
    * a crashed compaction must not leave a half-written sibling that a
    * consumer would pick up as data. */
  private def tmpPath(sub: String): String = s"$root/tmp/$sub"

  private def swapInto(tmp: String, target: java.nio.file.Path): Unit = {
    deleteTree(target)
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(tmp), target)
  }

  /** Resolved plan-time search parameters — VEC.SEARCH steps 8-9
    * (reference: VectorCommandSet.cs:423-456 + SloGuardrails.cs:58-87).
    * `maxScans` 0 = uncapped; `cacheOnly` sheds cache misses.
    * `cacheMemoryMb` is the tenant's result-cache quota (reference:
    * TenantConfig.CacheMemoryMb enforced at MemoryCacheStorage.cs:59-71):
    * populate writes are rejected once the entry table reaches it. */
  case class SearchOptions(maxScans: Int = 0, cacheOnly: Boolean = false,
                           budgetAdjusted: Boolean = false,
                           cacheMemoryMb: Int = Int.MaxValue)

  /** SLO shed + budget degradation, resolved deterministically from the
    * tenant's state (the serving side evaluates this per request; batch
    * side resolves it once per plan):
    *  - cache-only when CACHE_HINT force, or degraded guardrails and a
    *    low-priority tenant (priority ≥ 2) — misses are shed;
    *  - degraded guardrails cap scans for priority ≥ 1 tenants
    *    (high-priority 0 is protected, SloGuardrails.cs:62-66);
    *  - over-budget tenants get maxScans halved, or the default ceiling
    *    min(1000, n/2), floor 1 (VectorCommandSet.cs:446-455). */
  def resolveSearchOptions(tenant: String, index: String,
                           degraded: Boolean = false, priority: Int = 1,
                           overBudget: Boolean = false,
                           cacheHintForce: Boolean = false,
                           degradedMaxScans: Int = 1000,
                           cacheMemoryMb: Int = Int.MaxValue): SearchOptions = {
    val n = manifest(tenant, index).nVectors
    val cacheOnly = cacheHintForce || (degraded && priority >= 2)
    var maxScans = if (degraded && priority >= 1) degradedMaxScans else 0
    var adjusted = false
    if (overBudget) {
      maxScans =
        if (maxScans > 0) math.max(1, maxScans / 2)
        else math.max(1, math.min(1000L, n / 2).toInt)
      adjusted = true
    }
    SearchOptions(maxScans, cacheOnly, adjusted, cacheMemoryMb)
  }

  /** The assembled cached-search pipeline — the reference's VEC.SEARCH
    * steps 6-13 as ONE call (VectorCommandSet.cs:206-537): derive the
    * layered cache keys, probe L0 exact → L0.5 canonical alias → L1
    * SimHash → L2 semantic cluster (epoch- and TTL-checked), run the real
    * [[search]] only for the misses, then populate L0/L1/L2 entries with
    * the policy TTL — the L2 entry's TTL shortened to 10% (floor 1 s) when
    * its cluster is write-hot (SemanticClusterRegistry.cs:95-121).
    *
    * `now` is caller-supplied epoch-seconds so runs are deterministic and
    * replayable (same reason every write takes an `updated_at`).
    * `hotClusters`: optional (cluster_id INT, hot BOOLEAN).
    *
    * Returns (query_id, rank, id, score, cache_hit, layer) — layer is
    * "L0" | "L0.5" | "L1" | "L2" on hits, null on misses. Requires a built
    * index (centroids drive the L2 layer).
    *
    * Scale shape: keys are column expressions; the probe is an equi-join
    * of the (small) request batch against the keyed entry table; only
    * misses reach the index scan. No driver-side per-query loop. */
  /** `options` carries the step-8/9 resolution ([[resolveSearchOptions]]):
    * `cacheOnly` sheds each missing query as one (rank 0, null id,
    * layer "SHED") row — the batch analog of the reference's
    * `VEC_ERR_BUSY "SLO mode: cache-only."` per-request error — and
    * `maxScans` caps the miss-path scan budget. */
  def searchCached(tenant: String, index: String, queries0: DataFrame, k: Int,
                   metric: String = "L2", nprobe: Int = 4, now: Long = 0L,
                   ttlSeconds: Int = 60,
                   hotClusters: Option[DataFrame] = None,
                   options: SearchOptions = SearchOptions()): DataFrame = {
    import graft.operators.Caching
    val m = manifest(tenant, index)
    require(m.algo == "FLAT" || m.metric.isEmpty ||
        metric.equalsIgnoreCase(m.metric),
      s"index built with metric=${m.metric}; cannot search with metric=$metric")

    // one key set per DISTINCT query id: duplicates would defeat the
    // fully-warm fast path (row counts vs per-query hit rows), bill
    // phantom misses, and double-write entries (the old crossJoin+window
    // key derivation deduplicated as a side effect). Dedup on the FULL
    // payload, not query_id alone — a query_id reused with a different
    // vector/filter would otherwise keep an arbitrary row and make
    // results nondeterministic; the uniqueness check below fails fast on
    // that instead. Tags dedup on the NORMALIZED (sorted, null=empty)
    // form — the same normalization the cache keys use — so tag order
    // never makes two identical requests look conflicting.
    val queries = {
      if (!queries0.columns.contains("filter_tags"))
        queries0.dropDuplicates(Seq("query_id", "qvec"))
      else
        queries0
          .withColumn("_tags_norm", sort_array(
            coalesce(col("filter_tags"), array().cast("array<string>"))))
          .dropDuplicates(Seq("query_id", "qvec", "_tags_norm"))
          .drop("_tags_norm")
    }

    val tagsNorm =
      if (queries.columns.contains("filter_tags"))
        sort_array(coalesce(col("filter_tags"), array().cast("array<string>")))
      else array().cast("array<string>")

    // E10 cost proxy over the indexed collection; relaxes L2 admission
    val cost = lit(m.nVectors / 10000.0) * (size(col("qvec")) / 128.0)

    // nearest centroid + admission (L2 layer key): the centroid table is
    // driver-sized (nlist rows) — one narrow UDF pass beats a
    // crossJoin×centroids + per-query window (which shuffles nq×nlist
    // rows). Tie-break identical: highest score, then lowest cluster_id
    // (centroids iterate in ascending-cid order).
    val bcCents = spark.sparkContext.broadcast(l2CentroidsLocal(tenant, index, m))
    val metricU = metric.toUpperCase(java.util.Locale.ROOT)
    val bestU = udf { (qv: Seq[Float]) =>
      val arr = qv.toArray
      var bcid = -1; var bs = Double.NegativeInfinity
      bcCents.value.foreach { case (cid, cv) =>
        val s = graft.operators.IvfFlat.candidateScore(metricU, arr, cv)
        if (s > bs) { bs = s; bcid = cid }
      }
      (bcid, bs)
    }
    val admitted =
      if (metric.equalsIgnoreCase("COSINE"))
        col("cscore") >= Caching.closenessThreshold(metric, cost)
      else if (metric.equalsIgnoreCase("L2"))
        // L2: admission on euclidean distance (score = -d²)
        sqrt(-col("cscore")) <= Caching.closenessThreshold("L2", cost)
      else
        // IP has no bounded closeness notion (reference thresholds exist
        // only for cosine/L2, VectorCommandSet.cs:913-944): L2 layer off
        lit(false)
    val withCluster = queries
      .withColumn("best", bestU(col("qvec")))
      .withColumn("cscore", col("best._2"))
      .withColumn("l2_cluster", when(admitted, col("best._1")))
      .select(queries.columns.map(col) :+ col("l2_cluster"): _*)

    val keyed = withCluster
      .withColumn("l0_key", Caching.queryKey(lit(tenant), lit(index), lit(k),
        lit(metric), tagsNorm, xxhash64(xxhash64(col("qvec")), lit(k))))
      .withColumn("l1_key", Caching.queryKey(lit(tenant), lit(index), lit(k),
        lit(metric), tagsNorm,
        graft.functions.VectorSimHash.simhashCol(col("qvec"))))
      .withColumn("l2_key", when(col("l2_cluster").isNotNull,
        Caching.queryKey(lit(tenant), lit(index), lit(k), lit(metric), tagsNorm,
          col("l2_cluster").cast("long"))))
      // cache(), NOT localCheckpoint(): checkpointing was tried for
      // shallower downstream plans, but Dataset.unpersist is a no-op on a
      // checkpointed plan's RDD (it only clears cacheManager entries), so
      // every call would leak a persisted RDD until GC — and the measured
      // wall-time difference was noise once the small-miss rows shortcut
      // below removed the dominant cost
      .cache()

    // L0.5: alias resolution of the exact key (confidence ≥ 0.8)
    val aliasesExist = Files.exists(Paths.get(cacheAliasPath(tenant, index)))
    val resolved =
      if (!aliasesExist) keyed.withColumn("alias_key", lit(null).cast("long"))
      else Caching.resolveAlias(
          keyed.withColumn("cache_key", col("l0_key")),
          spark.read.parquet(cacheAliasPath(tenant, index)))
        .withColumn("alias_key",
          when(col("lookup_key") =!= col("l0_key"), col("lookup_key")))
        .drop("cache_key", "lookup_key")

    // layered probe, priority-ordered (reference cascade order)
    val probes = resolved.select(col("query_id"),
        explode(filter(array(
          struct(lit(0).as("pri"), lit("L0").as("layer"), col("l0_key").as("key")),
          struct(lit(1).as("pri"), lit("L0.5").as("layer"), col("alias_key").as("key")),
          struct(lit(2).as("pri"), lit("L1").as("layer"), col("l1_key").as("key")),
          struct(lit(3).as("pri"), lit("L2").as("layer"), col("l2_key").as("key"))),
          p => p("key").isNotNull)).as("p"))
      .select(col("query_id"), col("p.pri"), col("p.layer"), col("p.key"))

    val entriesExist = Files.exists(Paths.get(cacheEntriesPath(tenant, index)))
    val hitRows =
      if (!entriesExist) null
      else {
        // epoch + TTL validity (St7/St8); newest entry wins per key, with
        // a content-hash tie-break so same-batch writes to one key (two
        // queries sharing an L1/L2 key) resolve deterministically
        val wNewest = Window.partitionBy("cache_key")
          .orderBy(col("written_at").desc, xxhash64(to_json(col("hits"))))
        val valid = cacheEntries(tenant, index)
          .filter(col("epoch") === m.epoch && col("expires_at") > now)
          .withColumn("vrn", row_number().over(wNewest))
          .filter(col("vrn") === 1)
          .select(col("cache_key"), col("hits"))
        val wPri = Window.partitionBy("query_id").orderBy(col("pri"))
        // materialized (localCheckpoint): the populate step below APPENDS to
        // the entry table this plan reads — a lazy plan re-collected after
        // the append could see its own writes and flip misses to hits
        probes
          .join(valid, probes("key") === valid("cache_key"))
          .withColumn("hrn", row_number().over(wPri))
          .filter(col("hrn") === 1)
          .select(col("query_id"), col("layer"), col("hits"))
          .localCheckpoint()
      }

    // Served entries are trimmed to the REQUESTED k: L1/L2 keys bucket k
    // via roundK, so an entry may hold more hits than this request asked
    // for (the reference returns the stored list untrimmed — ours never
    // over-returns; fewer-than-k on bucket sharing is inherent to RoundK
    // and matches the reference).
    val hitDf =
      if (hitRows == null) null
      else hitRows.select(col("query_id"), col("layer"),
          posexplode(col("hits")))
        .select(col("query_id"), col("col.rank"), col("col.id"),
          col("col.score"), lit(true).as("cache_hit"), col("layer"))
        .filter(col("rank") <= k)

    val missQueries =
      if (hitRows == null) keyed
      else keyed.join(hitRows.select("query_id"), Seq("query_id"), "left_anti")
    // hit/miss accounting from two cheap counts (keyed is cached, hitRows
    // is checkpointed; hitRows holds ≤1 row per query by construction) —
    // they also decide the fully-warm fast path, which skips the whole
    // miss machinery: search plan, populate write, shed frame. The same
    // aggregation enforces query_id uniqueness post-dedup: equal ids with
    // DIFFERENT payloads must fail fast, not silently keep one.
    val qAgg = keyed.agg(count(lit(1)), count_distinct(col("query_id"))).head
    val nQ = qAgg.getLong(0)
    require(qAgg.getLong(1) == nQ,
      s"batch contains a query_id reused with different qvec/filter_tags " +
        s"(${nQ} rows, ${qAgg.getLong(1)} distinct ids)")
    val nHit = if (hitRows == null) 0L else hitRows.count()
    val anyMiss = nHit < nQ

    // zero-JOB empty frame (an eager localCheckpoint of a limit(0) plan
    // still scheduled a job per fully-warm call), decoupled from the
    // cache files by construction
    def emptyResult() = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", queries.schema("query_id").dataType),
          StructField("rank", IntegerType),
          StructField("id", StringType),
          StructField("score", DoubleType))))
    }

    // miss path: the real delta search (steps 10-12); materialized so the
    // populate write below doesn't trigger a second full search and the
    // returned frame is decoupled from the just-appended cache files.
    // Under cache-only shedding the misses never reach the index.
    // Small miss batches (≤1024 plain long-id queries, no tag filter or
    // scan cap) route through the zero-job [[searchRows]] serving tier
    // instead of the distributed plan: the result comes back as a local
    // relation (decoupled from cache files by construction, so no
    // checkpoint either), replacing the cold call's costliest action
    // chain with one bounded collect. Large or filtered batches keep the
    // distributed path — on a cluster that is the only correct tier.
    val rowsPathOk = nQ <= CachedMissLocalMaxQueries &&
      queries.schema("query_id").dataType ==
        org.apache.spark.sql.types.LongType &&
      // the local collect reads getSeq[Float]: the gate must fully decide
      // eligibility, so an array<double> qvec frame (typed but castable)
      // stays on the distributed path instead of a late ClassCastException
      (queries.schema("qvec").dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      }) &&
      !queries.columns.contains("filter_tags") && options.maxScans == 0
    val fresh =
      if (options.cacheOnly || !anyMiss) emptyResult()
      else if (rowsPathOk) {
        val qArr = missQueries.select(col("query_id"), col("qvec")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        import spark.implicits._
        searchRows(tenant, index, qArr, k, metric, nprobe)
          .toSeq.toDF("query_id", "rank", "id", "score")
      }
      else searchImpl(tenant, index,
        missQueries.select(queries.columns.map(col): _*), k, metric, nprobe,
        maxScans = options.maxScans)
        .localCheckpoint()
    val shedOut =
      if (!options.cacheOnly || !anyMiss) null
      else missQueries.select(col("query_id"))
        .withColumn("rank", lit(0))
        .withColumn("id", lit(null).cast("string"))
        .withColumn("score", lit(null).cast("double"))
        .withColumn("cache_hit", lit(false))
        .withColumn("layer", lit("SHED"))
        .localCheckpoint()

    // populate (step 13): one hits-array per missed query, written under
    // every derived key; L2 TTL write-hot-shortened. Zero-hit misses are
    // cached too — the reference stores the serialized (possibly empty)
    // result list (ResultCache.cs), so the repeat query must hit instead
    // of re-running the full scan; groupBy alone would drop them.
    val freshArr = missQueries.select("query_id")
      .join(fresh
        .groupBy("query_id")
        .agg(array_sort(collect_list(
          struct(col("rank"), col("id"), col("score")))).as("hits")),
        Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"),
        array().cast("array<struct<rank:int,id:string,score:double>>")))
    val hot = hotClusters.getOrElse {
      import spark.implicits._
      Seq.empty[(Int, Boolean)].toDF("cluster_id", "hot")
    }
    val newEntries = freshArr
      .join(keyed.select("query_id", "l0_key", "l1_key", "l2_key", "l2_cluster"),
        Seq("query_id"))
      .join(broadcast(hot.withColumnRenamed("cluster_id", "l2_cluster")),
        Seq("l2_cluster"), "left")
      .select(col("hits"),
        explode(filter(array(
          struct(lit("L0").as("layer"), col("l0_key").as("cache_key"), lit(ttlSeconds).as("ttl")),
          struct(lit("L1").as("layer"), col("l1_key").as("cache_key"), lit(ttlSeconds).as("ttl")),
          struct(lit("L2").as("layer"), col("l2_key").as("cache_key"),
            when(coalesce(col("hot"), lit(false)),
              greatest(lit(ttlSeconds / 10), lit(1))).otherwise(ttlSeconds).as("ttl"))),
          e => e("cache_key").isNotNull)).as("e"))
      .select(col("e.cache_key"), col("e.layer"), col("hits"),
        lit(m.epoch).as("epoch"),
        (lit(now) + col("e.ttl")).as("expires_at"),
        lit(now).as("written_at"))
    if (anyMiss && !options.cacheOnly) withManifestLock(tenant, index) {
      // CacheMemoryMb enforcement (MemoryCacheStorage.cs:59-71): when the
      // entry table has reached the tenant's quota, first lazily evict
      // stale/expired entries (the reference's read-path expiry sweep); if
      // still at quota, REJECT the populate — the miss was served, it just
      // isn't cached. Size checks are driver-side file metadata, no job.
      // Fruitless sweeps are rate-limited: a steady at-quota tenant must
      // not pay a full-table compaction job per miss, so re-sweep only
      // when the table changed or logical time moved past the last
      // attempt (TTLs may have expired by then).
      val entriesDir = cacheEntriesPath(tenant, index)
      val quotaBytes = options.cacheMemoryMb.toLong << 20
      val memoKey = s"$tenant/$index"
      val underQuota = {
        var cur = dirBytes(entriesDir)
        // a sweep that freed nothing stays fruitless until the table
        // changes or TTL-scale logical time passes (entries can't expire
        // faster than that) — without this, a steadily at-quota tenant
        // pays a full-table job per miss
        val skipSweep = fruitlessSweepMemo.get(memoKey).exists {
          case (sz, t) => sz == cur && now < t + ttlSeconds
        }
        if (cur >= quotaBytes && !skipSweep) {
          compactCacheEntries(tenant, index, now)
          cur = dirBytes(entriesDir)
          if (cur >= quotaBytes) fruitlessSweepMemo.put(memoKey, (cur, now))
        }
        cur < quotaBytes
      }
      if (underQuota) {
        newEntries.write.mode("append").parquet(entriesDir)
        // bound the file count independently of the quota: every miss
        // batch appends a file set, and the per-call validity window
        // scans all of them — amortized compaction keeps the per-call
        // probe cost flat over serving time
        if (dirFileCount(entriesDir) > CacheGcFileThreshold)
          compactCacheEntries(tenant, index, now)
      }
    }

    val freshOut0 = fresh
      .withColumn("cache_hit", lit(false))
      .withColumn("layer", lit(null).cast("string"))
    val freshOut = if (shedOut == null) freshOut0 else freshOut0.unionByName(shedOut)
    val out =
      if (hitDf == null) freshOut
      else hitDf.unionByName(freshOut)

    // step 14: metric counters (hit/miss per call) appended to the
    // per-index metrics log — feeds [[statsText]] (VEC.STATS parity);
    // shed queries count as misses (the reference bills the rejected
    // request too, VectorCommandSet.cs:432-433). Misses are counted from
    // the MISS SET (nQ − nHit), not the result rows — a miss whose search
    // returns zero hits (selective tags, empty probes) still bills.
    val nMiss = nQ - nHit
    // append + rotation under the per-index lock: a row landing between
    // another thread's fold-read and its swap would be silently destroyed.
    // Rotation folds the log into one summed row past the file threshold —
    // one tiny file per call is a small-files generator at serving rates,
    // and every consumer (statsText, billingUsage) only ever SUMS it.
    withManifestLock(tenant, index) {
      writeMetricsRowLocal(s"$root/metrics/$tenant/$index", now, nHit, nMiss)
      compactMetricsLog(tenant, index)
    }

    keyed.unpersist()
    out.orderBy("query_id", "rank")
  }

  // message schema for the driver-side metrics writer; matches the shape
  // Spark itself wrote (ts/hits/misses int64), so mixed dirs read fine
  private lazy val metricsRowSchema =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message metrics { required int64 ts; required int64 hits; required int64 misses; }")

  /** Append one (ts, hits, misses) row to a metrics dir WITHOUT a Spark
    * job: the per-call counters are a single ~24-byte row, and scheduling
    * a distributed write for it was pure overhead on the serving path
    * (one full job per [[searchCached]] call). parquet-mr writes the same
    * schema Spark did, so every consumer (statsText, billingUsage,
    * the fold) reads the mixed dir unchanged. */
  private def writeMetricsRowLocal(dir: String, ts: Long, hits: Long,
                                   misses: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val file = s"$dir/part-local-${java.util.UUID.randomUUID()}.parquet"
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withType(metricsRowSchema)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val g = new org.apache.parquet.example.data.simple.SimpleGroupFactory(
        metricsRowSchema).newGroup()
      g.add("ts", ts); g.add("hits", hits); g.add("misses", misses)
      w.write(g)
    } finally w.close()
  }

  /** Parquet-mr twin of the batch populate's entry rows — byte-compatible
    * with what Spark itself writes for the entry table (same column
    * names/types and standard 3-level LIST encoding), so the batch probe
    * plan, the GC compactor, and the resident reload read mixed dirs
    * unchanged. Lets the per-call serving path append a cache entry
    * WITHOUT scheduling a Spark job — one ~KB row group per miss; the
    * existing file-count GC folds the dir. */
  private lazy val entryRowSchema =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message spark_schema {
        |  optional int64 cache_key;
        |  optional binary layer (UTF8);
        |  optional group hits (LIST) {
        |    repeated group list {
        |      optional group element {
        |        optional int32 rank;
        |        optional binary id (UTF8);
        |        optional double score;
        |      }
        |    }
        |  }
        |  optional int64 epoch;
        |  optional int64 expires_at;
        |  optional int64 written_at;
        |}""".stripMargin)

  private def writeCacheEntryRowsLocal(
      dir: String,
      rows: Seq[(Long, String, Array[(Int, String, Double)], Long, Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val file = s"$dir/part-local-${java.util.UUID.randomUUID()}.parquet"
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withType(entryRowSchema)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { case (ck, layer, hits, epoch, expiresAt, writtenAt) =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroupFactory(
        entryRowSchema).newGroup()
      g.add("cache_key", ck)
      g.add("layer", layer)
      val hg = g.addGroup("hits")
      hits.foreach { case (r, id, s) =>
        val eg = hg.addGroup("list").addGroup("element")
        eg.add("rank", r); eg.add("id", id); eg.add("score", s)
      }
      g.add("epoch", epoch)
      g.add("expires_at", expiresAt)
      g.add("written_at", writtenAt)
      w.write(g)
    } finally w.close()
  }

  /** Fold the append-only hit/miss metrics log into a single summed row
    * when its part-file count exceeds [[CacheGcFileThreshold]] (all
    * consumers aggregate it, so the fold is lossless for them). Takes the
    * per-index lock: a concurrent call's append must not land between
    * the read and the swap (it would be silently destroyed), and the tmp
    * dir lives under root/tmp so billingUsage's enumeration of the
    * metrics/<tenant> children can never pick up a half-written fold. */
  private def compactMetricsLog(tenant: String, index: String): Unit =
    withManifestLock(tenant, index) {
      val p = s"$root/metrics/$tenant/$index"
      if (dirFileCount(p) > CacheGcFileThreshold) {
        val r = spark.read.parquet(p)
          .agg(max("ts"), sum("hits"), sum("misses")).head
        val tmp = tmpPath(s"metrics/$tenant/$index")
        deleteTree(Paths.get(tmp))
        writeMetricsRowLocal(tmp, r.getLong(0), r.getLong(1), r.getLong(2))
        swapInto(tmp, Paths.get(p))
      }
    }

  /** VEC.STATS Prometheus-text dump for an index: cumulative hit/miss
    * counters from the cached-search metrics log + the latency histogram
    * of an optional caller-supplied latency table (latencies are wall-
    * clock and therefore not engine-recorded — determinism rule)
    * (reference: VectorCommandSet.cs:103-133 → MetricsCollector.GetStats). */
  def statsText(tenant: String, index: String,
                latencies: Option[DataFrame] = None): String = {
    import graft.operators.Governance
    val p = s"$root/metrics/$tenant/$index"
    val (h, m) =
      if (!Files.exists(Paths.get(p))) (0L, 0L)
      else {
        val r = spark.read.parquet(p)
          .agg(sum("hits"), sum("misses")).head
        (if (r.isNullAt(0)) 0L else r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1))
      }
    val hist = latencies.map(Governance.latencyHistogram(_, "latency_ms"))
      .getOrElse {
        import spark.implicits._
        Governance.latencyHistogram(Seq.empty[Double].toDF("latency_ms"), "latency_ms")
      }
    // real eviction counts from the GC log (entries dropped by
    // compactCacheEntries — the reference's MemoryCacheStorage eviction
    // counter feeding GetStats)
    val evPath = evictionsPath(tenant, index)
    val ev =
      if (!Files.exists(Paths.get(evPath))) 0L
      else {
        val r = spark.read.parquet(evPath).agg(sum("evicted")).head
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    // live resident-tier hits/misses (not yet flushed to the log) fold in
    // so VEC.STATS is current even mid-serving-burst
    val memHits = servingHitCounters.get(s"$tenant/$index")
      .map(_.get()).getOrElse(0L)
    val memMisses = servingMissCounters.get(s"$tenant/$index")
      .map(_.get()).getOrElse(0L)
    Governance.metricsText(
      Governance.standardCounters(h + memHits, m + memMisses, evictions = ev,
        fallbacks = 0L), hist)
  }

  // -------------------------------------------------------------------
  // per-call cached serving (resident L0 probe over the entry table)
  // -------------------------------------------------------------------

  /** Resident-tier cache hits AND rows-path misses counted in memory: the
    * hot path must not append a metrics file per call (a small-files
    * generator at serving rates). [[statsText]] folds these in live;
    * [[flushServingMetrics]] persists + resets them so billing picks them
    * up. Batch-path misses still log their own metrics row per batch. */
  private val servingHitCounters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]
  private def servingHitsOf(tenant: String, index: String) =
    servingHitCounters.getOrElseUpdate(s"$tenant/$index",
      new java.util.concurrent.atomic.AtomicLong())
  private val servingMissCounters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]
  private def servingMissesOf(tenant: String, index: String) =
    servingMissCounters.getOrElseUpdate(s"$tenant/$index",
      new java.util.concurrent.atomic.AtomicLong())

  /** Live (not-yet-flushed) serving counters per index — the sidecar
    * loop's metrics snapshot (the reference's GetMetricsSnapshot payload,
    * server.py:138-160). Read-only: [[flushServingMetrics]] owns the
    * reset, so these are "since the last durable flush". */
  def servingCountersLive: Seq[(String, String, Long, Long)] =
    (servingHitCounters.keySet ++ servingMissCounters.keySet).toSeq.sorted
      .flatMap { key =>
        key.split("/", 2) match {
          case Array(t, i) => Some((t, i,
            servingHitCounters.get(key).map(_.get()).getOrElse(0L),
            servingMissCounters.get(key).map(_.get()).getOrElse(0L)))
          case _ => None
        }
      }

  // -------------------------------------------------------------------
  // sidecar-applied serving policy. The reference applies the policy's
  // TtlSeconds to subsequent cache decisions and leaves
  // AdmissionThreshold/EvictionPriority declared-but-unapplied on the
  // engine side (DynamicPolicyEngine.cs:16-46 — the comment at :40 says
  // exactly that); mirrored here: TTL drives inserts, the other two ride
  // along as data for stats/decision logs. ttl ≤ 0 = the reference's
  // NoCache decision — entries are born expired and never serve.
  // -------------------------------------------------------------------
  private val appliedPolicies = scala.collection.concurrent.TrieMap
    .empty[String, (Int, Double, String)]

  /** Apply a sidecar policy decision for a tenant (the engine half of
    * UpdatePolicy, DynamicPolicyEngine.cs:31-45). */
  def applyServingPolicy(tenant: String, ttlSeconds: Int,
                         admissionThreshold: Double = 0.1,
                         evictionPriority: String = "default"): Unit =
    appliedPolicies.put(tenant,
      (ttlSeconds, admissionThreshold, evictionPriority))

  /** TTL the wire plane should cache new entries with: the applied
    * policy's, or the caller's default when no policy has arrived. */
  def servingTtl(tenant: String, default: Int = 60): Int =
    appliedPolicies.get(tenant).map(_._1).getOrElse(default)

  /** The full applied policy, if any (stats/observability). */
  def servingPolicyOf(tenant: String): Option[(Int, Double, String)] =
    appliedPolicies.get(tenant)

  /** Rows-path cache inserts pending their durable append. The reference's
    * cache insert is an in-memory map put (MemoryCacheStorage) — serving
    * truth here is likewise the resident map, updated in-heap at miss
    * time; the parquet append that makes the entry visible to the BATCH
    * cascade and to a cold restart is amortized through this queue
    * (per-call parquet-writer init + dir rewalk measured ~20 ms and
    * serialized wire misses on the manifest lock at ~24 QPS). Flushes are
    * inline and deterministic — no background thread: a miss flushes when
    * the queue reaches [[PendingFlushMaxRows]] or its oldest row exceeds
    * [[PendingFlushMaxAgeNanos]]; hits piggyback the age check. Batch
    * readers may lag a pending insert by at most the flush trigger — a
    * cache answering a just-inserted query with a recompute, never a
    * wrong result (and strictly more durable than the reference, which
    * loses every entry on restart). [[flushCachePending]] is the
    * deterministic hook for tests and shutdown. */
  private val pendingEntryRows = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Array[(Int, String, Double)], Long, Long, Long)]]
  private val pendingEntryCounts = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicInteger]
  private val pendingEntrySince = scala.collection.concurrent.TrieMap
    .empty[String, Long]
  // latest caller-supplied CacheMemoryMb per index — the rows path's
  // analog of SearchOptions.cacheMemoryMb, consulted at flush time
  private val pendingQuotaMb = scala.collection.concurrent.TrieMap
    .empty[String, Int]
  private val PendingFlushMaxRows = 256
  private val PendingFlushMaxAgeNanos = 1000000000L

  /** Drain the pending rows-path inserts for an index into the durable
    * entry table (one parquet-mr append, no Spark job), enforcing the
    * tenant's CacheMemoryMb exactly like the batch populate (lazy sweep
    * at quota, then REJECT the drained rows — their misses were already
    * served; the in-heap copies age out by TTL/epoch under the resident
    * map's own bounds), then re-stamp the resident map's fingerprint so
    * the flush itself does not force a reload: the map already holds
    * these entries, so if its stamp matched the pre-write dir it matches
    * the post-write dir too. A stamp that does NOT match fpBefore means
    * someone else (a batch populate) wrote the dir since the map
    * loaded — leave it mismatched and let the next probe reload as
    * usual. Serving metrics flush here too, so rows-path hit/miss
    * billing becomes durable on the same amortized cadence as the
    * entries themselves. */
  def flushCachePending(tenant: String, index: String): Unit = {
    val key = s"$tenant/$index"
    val q = pendingEntryRows.get(key).orNull
    if (q == null || q.isEmpty) return
    withManifestLock(tenant, index) {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Array[(Int, String, Double)], Long, Long, Long)]
      var e = q.poll()
      while (e != null) { buf += e; e = q.poll() }
      pendingEntryCounts.get(key).foreach(_.addAndGet(-buf.length))
      pendingEntrySince.remove(key)
      // rows added concurrently after the drain keep an age stamp so the
      // next hit/miss age check still sees them
      if (!q.isEmpty) pendingEntrySince.putIfAbsent(key, System.nanoTime())
      if (buf.nonEmpty) {
        val logicalNow = buf.map(_._6).max
        val entriesDir = cacheEntriesPath(tenant, index)
        val quotaBytes = pendingQuotaMb.getOrElse(key, Int.MaxValue).toLong << 20
        val underQuota = {
          var cur = dirBytes(entriesDir)
          if (cur >= quotaBytes) {
            compactCacheEntries(tenant, index, logicalNow)
            cur = dirBytes(entriesDir)
          }
          cur < quotaBytes
        }
        if (underQuota) {
          val fpBefore = entriesFingerprint(entriesDir)
          writeCacheEntryRowsLocal(entriesDir, buf.toSeq)
          if (dirFileCount(entriesDir) > CacheGcFileThreshold)
            compactCacheEntries(tenant, index, logicalNow)
          val fpAfter = entriesFingerprint(entriesDir)
          residentL0Cache.get(key) match {
            // restamp ONLY when the map provably holds the drained
            // entries (same key + expiry): a map reloaded from the dir
            // between the in-heap insert and this flush matches fpBefore
            // yet lacks the pending rows — restamping it would hide them
            // from the resident tier until the dir next changes. The
            // check is ≤ PendingFlushMaxRows probes of an in-heap map.
            case Some((ep, f, map)) if f == fpBefore &&
                buf.forall { case (ck, _, _, _, exp, _) =>
                  val es = map.get(ck)
                  es != null && es.exists(_.expiresAt == exp)
                } =>
              residentL0Cache.put(key, (ep, fpAfter, map))
            case _ => ()
          }
        }
        flushServingMetrics(tenant, index, logicalNow)
      }
    }
  }

  /** Flush every index's pending cache inserts and in-memory serving
    * counters — the shutdown hook's last act, so rows-path billing and
    * cache entries survive a restart (the reference loses its whole
    * in-memory cache here; we only lose nothing). */
  def flushAllServingMetrics(now: Long = System.currentTimeMillis() / 1000L): Unit =
    (servingHitCounters.keySet ++ servingMissCounters.keySet ++
      pendingEntryRows.keySet).foreach { key =>
      key.split("/", 2) match {
        case Array(t, i) =>
          flushCachePending(t, i)
          flushServingMetrics(t, i, now)
        case _ => ()
      }
    }

  // per-key entries sorted in the batch probe's winner order; probe time
  // applies the same expiry filter the batch plan applies BEFORE ranking
  private case class ResidentEntry(expiresAt: Long,
                                   hits: Array[(Int, String, Double)])
  private val residentL0Cache = scala.collection.concurrent.TrieMap
    .empty[String, (Long, Long, java.util.HashMap[java.lang.Long, Array[ResidentEntry]])]

  /** Order-independent content fingerprint of the entry dir (file name,
    * size, mtime) — cheap driver-side staleness check for the resident
    * map (the dir is bounded at [[CacheGcFileThreshold]] files). */
  // forces a reload (and mismatches any cached value) when a concurrent
  // GC-swap/flush deletes files mid-walk — monotonically unique
  private val fpRaceMarker = new java.util.concurrent.atomic.AtomicLong(
    Long.MinValue)
  private def entriesFingerprint(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else
      try {
        val s = Files.walk(p)
        try {
          var h = 1125899906842597L
          s.filter(Files.isRegularFile(_)).forEach { f =>
            h ^= (f.getFileName.toString.hashCode.toLong * 31 +
              Files.size(f)) * 1099511628211L +
              Files.getLastModifiedTime(f).toMillis
          }
          h
        } finally s.close()
      } catch {
        // compactCacheEntries' swapInto (deleteTree + move) or flushCache
        // can delete files mid-walk; serving must degrade to a reload or
        // a batch-path miss, never crash
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          fpRaceMarker.incrementAndGet()
      }
  }

  private def residentL0Of(tenant: String, index: String, m: Manifest)
      : java.util.HashMap[java.lang.Long, Array[ResidentEntry]] = {
    val key = s"$tenant/$index"
    val dir = cacheEntriesPath(tenant, index)
    val fp = entriesFingerprint(dir)
    residentL0Cache.get(key) match {
      case Some((e, f, map)) if e == m.epoch && f == fp => map
      case _ =>
        val map = new java.util.HashMap[java.lang.Long, Array[ResidentEntry]]()
        try {
          if (Files.exists(Paths.get(dir))) {
            // winner order computed BY Spark (same expression as the batch
            // probe's tie-break: written_at desc, then content hash) — the
            // resident map only caches the plan's own ordering; runtime
            // expiry is applied at probe time like the batch plan's filter
            cacheEntries(tenant, index)
              .filter(col("epoch") === m.epoch)
              .select(col("cache_key"), col("expires_at"), col("hits"),
                col("written_at"), xxhash64(to_json(col("hits"))).as("jh"))
              .collect()
              .groupBy(_.getLong(0))
              .foreach { case (ck, rows) =>
                val sorted = rows
                  .sortBy(r => (-r.getLong(3), r.getLong(4)))
                  .map { r =>
                    val hits = r.getSeq[org.apache.spark.sql.Row](2)
                      .map(h => (h.getInt(0), h.getString(1), h.getDouble(2)))
                      .toArray
                    ResidentEntry(r.getLong(1), hits)
                  }
                map.put(ck, sorted)
              }
          }
          residentL0Cache.put(key, (m.epoch, fp, map))
          map
        } catch {
          // a GC-swap racing the read: serve this call as a batch-path
          // miss (correct, just slower) and retry the load next call —
          // the failed load is NOT cached
          case _: Exception =>
            new java.util.HashMap[java.lang.Long, Array[ResidentEntry]]()
        }
    }
  }

  /** Driver twin of the batch path's L2 admission (`bestU` + the
    * closeness threshold): nearest centroid by the metric (ties → lowest
    * cluster id, the iteration order of the same centroid array), admitted
    * when within the cost-relaxed closeness bound. IP has no bounded
    * closeness notion — layer off, like the batch path. */
  private def l2ClusterLocal(metricU: String, qv: Array[Float], cost: Double,
                             cents: Array[(Int, Array[Float])]): Option[Int] = {
    if (cents.isEmpty) return None
    var bcid = -1; var bs = Double.NegativeInfinity
    cents.foreach { case (cid, cv) =>
      val s = IvfFlat.candidateScore(metricU, qv, cv)
      if (s > bs) { bs = s; bcid = cid }
    }
    val relax = math.max(0.0, math.log10(math.max(cost, 1e-9))) * 0.01
    if (metricU == "COSINE") { if (bs >= 0.95 - relax) Some(bcid) else None }
    else if (metricU == "L2") {
      if (math.sqrt(-bs) <= 0.05 + relax) Some(bcid) else None
    } else None
  }

  // resident alias map (confidence ≥ 0.8, the resolveAlias rule), same
  // fingerprint-refresh discipline as the entry map
  private val residentAliasCache = scala.collection.concurrent.TrieMap
    .empty[String, (Long, Map[Long, Long])]
  private def residentAliasesOf(tenant: String, index: String): Map[Long, Long] = {
    val key = s"$tenant/$index"
    val dir = cacheAliasPath(tenant, index)
    val fp = entriesFingerprint(dir)
    residentAliasCache.get(key) match {
      case Some((f, map)) if f == fp => map
      case _ =>
        try {
          val map =
            if (!Files.exists(Paths.get(dir))) Map.empty[Long, Long]
            else spark.read.parquet(dir).filter(col("confidence") >= 0.8)
              .select("source_key", "canonical_key").collect()
              .map(r => r.getLong(0) -> r.getLong(1)).toMap
          residentAliasCache.put(key, (fp, map))
          map
        } catch { // concurrent flushCache delete: no aliases this call
          case _: Exception => Map.empty[Long, Long]
        }
    }
  }

  /** Per-call cached serving: the RESP-shaped analog of [[searchCached]]
    * for a single query — the full L0 → L0.5 → L1 → L2 priority cascade
    * probed against a driver-resident copy of the (GC-bounded) entry
    * table. A valid hit returns in-heap with no job, tagged with its
    * layer. A tag-free miss serves rows-native (zero-job search,
    * in-heap insert, amortized durable append — billed via the in-memory
    * miss counter that [[flushCachePending]]/[[flushServingMetrics]]
    * persist, quota-enforced at flush against `cacheMemoryMb`); a
    * tag-filtered miss delegates to the full batch cascade. Both return
    * layer "MISS". Probe semantics equal the batch plan's: same key
    * derivations (the driver/Column parity is spec-pinned; L1 reuses the
    * simhash kernel itself; L2 mirrors bestU + the cost-relaxed
    * closeness bound), same epoch gate, same expiry-before-winner rule,
    * same newest-with-content-hash tie-break (cached from the plan's own
    * ordering). Reference scenarios: repeat-query semantic-cache hit
    * (P99 14.5 ms) and prefetch→L2 hit (0.59 ms),
    * 20260112_phase6_summary.md. */
  def searchCachedRows(tenant: String, index: String, queryId: Long,
                       qvec: Array[Float], k: Int, metric: String = "L2",
                       nprobe: Int = 4, now: Long = 0L, ttlSeconds: Int = 60,
                       tags: Seq[String] = Nil,
                       cacheMemoryMb: Int = Int.MaxValue,
                       refine: Int = 0, hnswBeam: Boolean = false)
      : (String, Array[(Int, String, Double)]) = {
    val (layer, rows, _) = searchCachedRowsTraced(tenant, index, queryId,
      qvec, k, metric, nprobe, now, ttlSeconds, tags, cacheMemoryMb, refine,
      hnswBeam)
    (layer, rows)
  }

  /** [[searchCachedRows]] plus the per-call [[SearchTrace]]: which
    * cascade layers were probed (in order), which one hit (or MISS →
    * the full cached-search plan ran), and call wall time. */
  def searchCachedRowsTraced(tenant: String, index: String, queryId: Long,
                             qvec: Array[Float], k: Int, metric: String = "L2",
                             nprobe: Int = 4, now: Long = 0L,
                             ttlSeconds: Int = 60, tags: Seq[String] = Nil,
                             cacheMemoryMb: Int = Int.MaxValue,
                             refine: Int = 0, hnswBeam: Boolean = false)
      : (String, Array[(Int, String, Double)], SearchTrace) = {
    val tTrace0 = System.nanoTime()
    import graft.operators.Caching
    val m = manifest(tenant, index)
    val metricU = metric.toUpperCase(java.util.Locale.ROOT)
    // beam-filtered HNSW is only a different ANSWER when a filter is on
    val beam = hnswBeam && tags.nonEmpty && m.algo == "HNSW"
    // refined / beam-filtered answers live under their OWN key space:
    // the semantics scope rides the metric component (keys stay within
    // the 6-part queryKey contract, every existing key is untouched for
    // default calls), so a refined or beam entry can never serve a
    // default call or vice versa — they are different answers by design
    val metricKey = {
      val r = if (refine > 0) s"#refine=$refine" else ""
      val b = if (beam) "#hnswbeam" else ""
      s"$metric$r$b"
    }
    def keyOf(layerKey: Long): Long =
      Caching.queryKeyLocal(tenant, index, k, metricKey, tags, layerKey)
    val l0 = keyOf(Caching.l0LayerKeyLocal(qvec, k))
    val probes = scala.collection.mutable.ArrayBuffer[(String, Long)](
      ("L0", l0))
    residentAliasesOf(tenant, index).get(l0)
      .filter(_ != l0).foreach(ck => probes += (("L0.5", ck)))
    probes += (("L1", keyOf(graft.functions.VectorSimHash.simhash64(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(qvec), 42L))))
    val cost = m.nVectors / 10000.0 * (qvec.length / 128.0)
    l2ClusterLocal(metricU, qvec, cost, l2CentroidsLocal(tenant, index, m))
      .foreach(cid => probes += (("L2", keyOf(cid.toLong))))
    val entries = residentL0Of(tenant, index, m)
    val hit = probes.iterator.flatMap { case (layer, key) =>
      val cands = entries.get(key)
      (if (cands == null) None else cands.find(_.expiresAt > now))
        .map(e => (layer, e))
    }.nextOption()
    hit match {
      case Some((layer, e)) =>
        servingHitsOf(tenant, index).incrementAndGet()
        // piggyback: an aging pending queue flushes off the hit path's
        // cheap timestamp check, so pending inserts can't sit unflushed
        // behind a hit-only workload
        if (pendingEntrySince.get(s"$tenant/$index").exists(
            System.nanoTime() - _ > PendingFlushMaxAgeNanos))
          flushCachePending(tenant, index)
        (layer, e.hits.filter(_._1 <= k),
          SearchTrace("cache-hit", Some(layer), probes.map(_._1).toSeq,
            headLive = -1, headMasked = -1, tailRows = -1,
            totalMicros = (System.nanoTime() - tTrace0) / 1000L))
      case None =>
        // Rows-native miss: the reference answers a cache miss entirely
        // in-process — search the index, put the entry in its in-memory
        // cache, reply — inside one request (~ms). Delegating to the
        // batch cascade cost ~20 tiny Spark actions of scheduling and
        // planning per wire miss, and even a synchronous driver-side
        // parquet append measured ~20 ms/call (writer init + dir rewalk)
        // serialized on the manifest lock. So the miss mirrors the
        // reference's shape: the zero-job [[searchRows]] tier answers
        // (tag-filtered calls through [[searchRowsFilteredTraced]] — the
        // snapshot tag index filters during the scan, like the
        // reference's in-process filter), the resident map takes the
        // entry in-heap immediately (copy-on-write; the dir fingerprint
        // is untouched because the dir is untouched), and the durable
        // append rides the amortized [[pendingEntryRows]] queue.
        // Newest-first per key — the batch winner order — with one
        // documented looseness: two different-content writes to a shared
        // L1/L2 key in the same logical second tie in written_at, where
        // the batch plan picks by content hash and this path keeps the
        // later write; both are valid entries for that key and a full
        // reload re-ranks identically to the plan. Calls outside the
        // rows-tier gates (non-resident tail, oversized corpus/head)
        // keep the batch cascade below.
        val rowsNative: Option[(Array[(Long, Int, String, Double)], SearchTrace)] =
          if (tags.isEmpty)
            Some(searchRowsTraced(tenant, index, Array((queryId, qvec)), k,
              metric, nprobe, refine))
          else if (refine > 0) None // filtered+refined: plan-only below
          else searchRowsFilteredTraced(tenant, index, Array((queryId, qvec)),
            k, metric, nprobe, tags, hnswBeam = beam)
        rowsNative match {
          case Some((rows0, tr)) =>
        val hits = rows0.map { case (_, r, id, s) => (r, id, s) }.sortBy(_._1)
        val writeKeys = probes.toSeq.collect {
          case (l @ ("L0" | "L1" | "L2"), ck) => (l, ck)
        }
        val rkey = s"$tenant/$index"
        val nPending = withManifestLock(tenant, index) {
          residentL0Cache.get(rkey).foreach { case (ep, f, oldMap) =>
            if (ep == m.epoch) {
              val nm = new java.util.HashMap[java.lang.Long, Array[ResidentEntry]](oldMap)
              val e = ResidentEntry(now + ttlSeconds, hits)
              writeKeys.foreach { case (_, ck) =>
                // prune already-expired entries while prepending: with
                // reloads now rare (fingerprint restamp on flush), a hot
                // key repopulated every TTL would otherwise accumulate
                // dead entries in-heap without bound
                val prev = nm.get(ck)
                val kept =
                  if (prev == null) Array.empty[ResidentEntry]
                  else prev.filter(_.expiresAt > now)
                nm.put(ck, e +: kept)
              }
              residentL0Cache.put(rkey, (ep, f, nm))
            }
          }
          // pending enqueue stays under the SAME lock as the resident
          // insert: a concurrent flushCache (which clears the queue under
          // this lock) can then never interleave between the two — an
          // explicitly flushed entry must not resurrect via a later
          // pending flush
          val pq = pendingEntryRows.getOrElseUpdate(rkey,
            new java.util.concurrent.ConcurrentLinkedQueue())
          writeKeys.foreach { case (l, ck) =>
            pq.add((ck, l, hits, m.epoch, now + ttlSeconds, now))
          }
          pendingQuotaMb.put(rkey, cacheMemoryMb)
          val pc = pendingEntryCounts.getOrElseUpdate(rkey,
            new java.util.concurrent.atomic.AtomicInteger())
          val n = pc.addAndGet(writeKeys.length)
          pendingEntrySince.putIfAbsent(rkey, System.nanoTime())
          n
        }
        servingMissesOf(tenant, index).incrementAndGet()
        if (nPending >= PendingFlushMaxRows ||
            pendingEntrySince.get(rkey).exists(
              System.nanoTime() - _ > PendingFlushMaxAgeNanos))
          flushCachePending(tenant, index)
        ("MISS", hits,
          SearchTrace("cache-miss", None, probes.map(_._1).toSeq,
            headLive = tr.headLive, headMasked = tr.headMasked,
            tailRows = tr.tailRows,
            totalMicros = (System.nanoTime() - tTrace0) / 1000L))
          case None if refine > 0 || beam =>
        // refined (or beam-requested-but-unservable) call outside the
        // rows gates: serve the plan directly and SKIP cache population
        // — the batch cascade's column-side keys carry no semantics
        // scope, so populating through it would collide scoped answers
        // with default keys. A beam call lands here only when the
        // resident graphs/tag index are unavailable; the plan answer is
        // the documented post-filter fallback semantics.
        import spark.implicits._
        val base0 = Seq((queryId, qvec.toSeq)).toDF("query_id", "qvec")
        val base = if (tags.isEmpty) base0
          else base0.withColumn("filter_tags", typedLit(tags))
        val store16 =
          if (m.algo == "IVF_PQ" && sq16TableExists(tenant, index, m)) "sq16"
          else "exact"
        val rows = search(tenant, index, base, k, metric, nprobe,
            refine = refine, refineStore = store16)
          .collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[String]("id"),
            r.getAs[Double]("score")))
        servingMissesOf(tenant, index).incrementAndGet()
        ("MISS", rows,
          SearchTrace("cache-miss", None, probes.map(_._1).toSeq,
            headLive = -1, headMasked = -1, tailRows = -1,
            totalMicros = (System.nanoTime() - tTrace0) / 1000L))
          case None =>
        import spark.implicits._
        val base = Seq((queryId, qvec.toSeq)).toDF("query_id", "qvec")
          .withColumn("filter_tags", typedLit(tags))
        val rows = searchCached(tenant, index, base, k, metric, nprobe, now,
            ttlSeconds)
          .collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[String]("id"),
            r.getAs[Double]("score")))
        ("MISS", rows,
          SearchTrace("cache-miss", None, probes.map(_._1).toSeq,
            headLive = -1, headMasked = -1, tailRows = -1,
            totalMicros = (System.nanoTime() - tTrace0) / 1000L))
        }
    }
  }

  /** Persist + reset the in-memory resident-tier hit counters into the
    * metrics log (one summed row) so billing/offline consumers see them;
    * [[statsText]] already folds the live value in. */
  def flushServingMetrics(tenant: String, index: String, now: Long = 0L): Unit = {
    // write FIRST, subtract only after the append commits — a getAndSet
    // before a failed write would silently drop billable calls (calls
    // that land during the write stay in the counters for the next flush)
    val hc = servingHitsOf(tenant, index)
    val mc = servingMissesOf(tenant, index)
    val nh = hc.get()
    val nm = mc.get()
    if (nh > 0 || nm > 0) {
      withManifestLock(tenant, index) {
        writeMetricsRowLocal(s"$root/metrics/$tenant/$index", now, nh, nm)
        compactMetricsLog(tenant, index)
      }
      hc.addAndGet(-nh)
      mc.addAndGet(-nm)
    }
  }

  /** Current snapshot's centroid table (cluster_id, centroid). */
  def centroids(tenant: String, index: String): DataFrame =
    spark.read.parquet(
      s"${snapDir(tenant, index, manifest(tenant, index))}/centroids")

  /** Predictive prefetch into the result cache (St4 assembled): for each
    * predicted cluster, search its own inverted list with its centroid as
    * the query and write the hits as an L2 cache entry under the SAME key
    * [[searchCached]] derives — so the next query admitted to that cluster
    * hits the warmed entry (reference: VectorCommandSet.cs:318-379 +
    * PrefetchBackgroundQueue.cs:15-77; 5-min TTL default).
    * predicted: (cluster_id INT). Returns the number of entries written. */
  def prefetchIntoCache(tenant: String, index: String, predicted: DataFrame,
                        k: Int, metric: String = "L2", now: Long = 0L,
                        ttlSeconds: Int = 300, nprobe: Int = 4): Long = {
    import graft.operators.{Caching, TopK}
    val m = manifest(tenant, index)
    val ranked = cacheCentroidOverride(tenant, index) match {
      case Some(cents) =>
        // semantic-model clustering: the predicted cluster's centroid is
        // just a query vector for the index (the reference fire-and-forgets
        // a SEARCH of the predicted centroid, VectorCommandSet.cs:318-379)
        import spark.implicits._
        val byId = cents.toMap
        val ids = predicted.select("cluster_id").distinct()
          .collect().map(_.getInt(0)).filter(byId.contains)
        val queries = ids.toSeq.map(c => (c.toLong, byId(c).toSeq))
          .toDF("query_id", "qvec")
        searchImpl(tenant, index, queries, k, metric, nprobe)
          .select(col("query_id").as("qcluster"), col("rank"),
            col("id"), col("score"))
      case None =>
        // tail clustering IS the cache clustering: probe exactly the
        // predicted inverted list with its own centroid as the query
        val tailIdx = tailIndexOf(tenant, index, m)
        val assigned = tailIdx.assigned
        val queries = predicted.select("cluster_id").distinct()
          .join(broadcast(tailIdx.centroids), Seq("cluster_id"))
          .select(col("cluster_id"), col("centroid").as("qvec"))
        val scored = assigned
          .join(broadcast(queries), Seq("cluster_id"))
          .select(col("cluster_id").cast("long").as("qcluster"), col("id_str"),
            graft.functions.vector_score(metric, col("qvec"), col("vec")).as("score"))
        val rankedIds = TopK.perGroup(
            scored.select(col("qcluster"), xxhash64(col("id_str")).as("id"), col("score")),
            Seq("qcluster"), k)
        val hitIds = rankedIds.select("id").distinct()
        // assigned ids are unique by construction (one row per live vector)
        val idMap = assigned.select("id_str")
          .withColumn("id", xxhash64(col("id_str")))
          .join(broadcast(hitIds), Seq("id"), "left_semi")
        rankedIds.join(broadcast(idMap), Seq("id"))
          .select(col("qcluster"), col("rank"),
            col("id_str").as("id"), col("score"))
    }
    val entries = ranked
      .groupBy("qcluster")
      .agg(array_sort(collect_list(
        struct(col("rank"), col("id"), col("score")))).as("hits"))
      .select(
        Caching.queryKey(lit(tenant), lit(index), lit(k), lit(metric),
          array().cast("array<string>"), col("qcluster")).as("cache_key"),
        lit("L2").as("layer"), col("hits"),
        lit(m.epoch).as("epoch"),
        lit(now + ttlSeconds).as("expires_at"),
        lit(now).as("written_at"))
      .localCheckpoint()
    entries.write.mode("append").parquet(cacheEntriesPath(tenant, index))
    entries.count()
  }

  /** VEC.STATS analog: per-index record/cluster counts. */
  def stats(tenant: String, index: String): DataFrame = {
    val assigned = spark.read.parquet(
      s"${snapDir(tenant, index, manifest(tenant, index))}/vectors")
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
