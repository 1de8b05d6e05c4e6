package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-tenant quota configuration (reference: Model/TenantConfig.cs:5-57 —
  * same fields, same defaults; priority 0 = high, 1 = normal, 2 = low). */
case class TenantQuota(maxQps: Int = 100,
                       maxConcurrentRequests: Int = 8,
                       cacheMemoryMb: Int = 64,
                       dailyRequestLimit: Long = 100000L,
                       priority: Int = 1,
                       monthlyBudget: Double = 100.0)

/** Cluster-wide cache policy (reference: Model/CachePolicyConfig.cs:3-8 —
  * same fields, same defaults). */
case class CachePolicy(enableCache: Boolean = true,
                       defaultTtlSeconds: Int = 60)

/** Declared per-index schema (reference: Model/IndexConfig.cs:7-33). */
case class DeclaredIndex(dim: Int, metric: String = "L2",
                         algo: String = "IVF_FLAT", nlist: Int = 16,
                         pqM: Int = 8, pqK: Int = 256)

/** The management plane as a typed library facade — every route of the
  * reference's REST controllers (SURVEY §2.1 S6) as a direct call:
  *
  *   - indexes:  create / build / snapshot / load / stats / centroids push
  *               (reference: Controllers/IndexController.cs:13-292)
  *   - tenants:  create, quotas get/update, API key, users + roles
  *               (reference: Controllers/TenantController.cs:11-264)
  *   - cache:    flush / invalidate (reference: Controllers/CacheController.cs)
  *   - billing:  usage rollup (reference: Controllers/BillingController.cs)
  *   - audit:    filtered logs + stats (reference: Controllers/AuditController.cs)
  *   - health/metrics (reference: Controllers/HealthController.cs)
  *   - AI models: train / deploy / rollback / list — the sidecar's semantic
  *               model lifecycle (reference: Controllers/AiController.cs:15-197
  *               + src/Pyrope.AISidecar/semantic_model.py:9-53)
  *
  * Config-plane state (tenants, users, index declarations, model registry)
  * is tiny and driver-written as atomic-rename JSON, exactly like the
  * engine manifest; data-plane state stays in the engine's parquet layout.
  * This class stays transport-free; [[graft.server.HttpPlane]] serves
  * these same calls over the reference's REST routes, and
  * [[graft.server.RespServer]] serves the data plane over RESP.
  */
object Management {
  /** Sentinel principal for in-process trusted callers (the serving stack
    * itself). The reference's middleware likewise skips RequirePermission
    * on excluded internal paths (Program.cs:154-156); every externally
    * attributed call must pass a real user id and clears the role gate. */
  val SystemUser = "__system__"
}

class Management(spark: SparkSession, val root: String) {

  val engine = new GraftEngine(spark, root)

  // -------------------------------------------------------------------
  // RBAC enforcement (reference: RequirePermission on every route, e.g.
  // IndexController.cs:80-82, enforced by the auth middleware
  // Program.cs:154-156): admin ⊃ writer ⊃ reader. Operations take an
  // `actingUser`; unknown users and insufficient roles are rejected.
  // -------------------------------------------------------------------

  private val roleRank = Map("reader" -> 0, "writer" -> 1, "admin" -> 2)

  private def authorize(tenantId: String, actingUser: String,
                        atLeast: String): Unit =
    if (actingUser != Management.SystemUser) {
      val role = users(tenantId).getOrElse(actingUser,
        throw new SecurityException(
          s"unknown user '$actingUser' for tenant $tenantId"))
      if (roleRank(role) < roleRank(atLeast))
        throw new SecurityException(
          s"user '$actingUser' (role $role) lacks '$atLeast' permission " +
            s"on tenant $tenantId")
    }

  private val NamePat = "^[A-Za-z0-9_-]+$"
  private def requireName(s: String, what: String): Unit =
    require(s != null && s.matches(NamePat),
      s"invalid $what: '$s' (allowed: [A-Za-z0-9_-]+)")

  // write-then-atomic-rename, like the engine manifest
  private def writeJson(path: java.nio.file.Path, json: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = Paths.get(path.toString + ".tmp")
    Files.writeString(tmp, json, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def jLong(s: String, k: String): Option[Long] =
    raw""""$k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
  private def jDouble(s: String, k: String): Option[Double] =
    // Scala renders e.g. 1.0e7 as "1.0E7" — the pattern must cover
    // scientific notation or large budgets would round-trip as 1.0
    raw""""$k"\s*:\s*(-?[\d.]+(?:[eE][+-]?\d+)?)""".r
      .findFirstMatchIn(s).map(_.group(1).toDouble)
  private def jString(s: String, k: String): Option[String] =
    raw""""$k"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))

  // -------------------------------------------------------------------
  // tenants (TenantController.cs:25-57 create, 59-108 quotas, 110-143 key)
  // -------------------------------------------------------------------

  private def tenantFile(t: String) = Paths.get(s"$root/tenants/$t/config.json")
  private def usersFile(t: String) = Paths.get(s"$root/tenants/$t/users.json")

  private def quotaJson(q: TenantQuota, apiKeyHash: String): String =
    s"""{"maxQps": ${q.maxQps}, "maxConcurrentRequests": ${q.maxConcurrentRequests}, "cacheMemoryMb": ${q.cacheMemoryMb}, "dailyRequestLimit": ${q.dailyRequestLimit}, "priority": ${q.priority}, "monthlyBudget": ${q.monthlyBudget}, "apiKeyHash": "$apiKeyHash"}"""

  def createTenant(tenantId: String, quota: TenantQuota = TenantQuota(),
                   apiKeyHash: String = ""): Unit = {
    requireName(tenantId, "tenant id")
    require(!Files.exists(tenantFile(tenantId)),
      s"tenant already exists: $tenantId")
    writeJson(tenantFile(tenantId), quotaJson(quota, apiKeyHash))
  }

  def tenantExists(tenantId: String): Boolean = Files.exists(tenantFile(tenantId))

  /** Parsed-quota memo keyed by the config file's (mtime, size): the
    * RESP serving path resolves the tenant's cache quota on every call,
    * and was paying a file read + 6 regex scans per query (per-call disk
    * reads ride this host's IO storms into serving tails). Any writer
    * bumps mtime → next stat re-parses; same-JVM writers also drop the
    * entry synchronously. */
  private val quotaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (java.nio.file.attribute.FileTime, Long, TenantQuota)]()

  def quota(tenantId: String): TenantQuota = {
    val f = tenantFile(tenantId)
    val attrs =
      try Files.readAttributes(
        f, classOf[java.nio.file.attribute.BasicFileAttributes])
      catch {
        // ONLY absence means "no such tenant" — a transient I/O or
        // permission error reported as a missing tenant would hand the
        // client a wrong, actionable-looking answer during the exact
        // disk storms this memo exists to ride out; let those propagate
        // as the internal errors they are
        case _: java.nio.file.NoSuchFileException =>
          throw new IllegalArgumentException(s"no such tenant: $tenantId")
      }
    val hit = quotaMemo.get(tenantId)
    if (hit != null && hit._1 == attrs.lastModifiedTime &&
        hit._2 == attrs.size) hit._3
    else {
      val s = Files.readString(f)
      val q = TenantQuota(
        jLong(s, "maxQps").getOrElse(100L).toInt,
        jLong(s, "maxConcurrentRequests").getOrElse(8L).toInt,
        jLong(s, "cacheMemoryMb").getOrElse(64L).toInt,
        jLong(s, "dailyRequestLimit").getOrElse(100000L),
        jLong(s, "priority").getOrElse(1L).toInt,
        jDouble(s, "monthlyBudget").getOrElse(100.0))
      quotaMemo.put(tenantId, (attrs.lastModifiedTime, attrs.size, q))
      q
    }
  }

  def updateQuota(tenantId: String, q: TenantQuota,
                  actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    require(tenantExists(tenantId), s"no such tenant: $tenantId")
    writeJson(tenantFile(tenantId), quotaJson(q, apiKeyHash(tenantId)))
    quotaMemo.remove(tenantId)
  }

  private def apiKeyHash(tenantId: String): String =
    jString(Files.readString(tenantFile(tenantId)), "apiKeyHash").getOrElse("")

  def updateApiKey(tenantId: String, newHash: String,
                   actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    require(tenantExists(tenantId), s"no such tenant: $tenantId")
    writeJson(tenantFile(tenantId), quotaJson(quota(tenantId), newHash))
    quotaMemo.remove(tenantId)
  }

  /** Whether the tenant has any API key set — the protocol planes only
    * enforce per-command auth for tenants that configured one. */
  def apiKeyConfigured(tenantId: String): Boolean =
    tenantExists(tenantId) && apiKeyHash(tenantId).nonEmpty

  /** Constant-shape comparison of a presented key hash (the reference
    * stores hashes, never plaintext — Security/ApiKeyAuth). */
  def verifyApiKey(tenantId: String, presentedHash: String): Boolean =
    tenantExists(tenantId) && {
      val stored = apiKeyHash(tenantId)
      stored.nonEmpty && java.security.MessageDigest.isEqual(
        stored.getBytes("UTF-8"), presentedHash.getBytes("UTF-8"))
    }

  // users + roles (TenantController.cs:145-264; roles mirror the
  // reference's RBAC permission tiers)
  val Roles: Set[String] = Set("admin", "writer", "reader")

  def users(tenantId: String): Map[String, String] = {
    val f = usersFile(tenantId)
    if (!Files.exists(f)) Map.empty
    else raw""""([A-Za-z0-9_-]+)"\s*:\s*"(admin|writer|reader)"""".r
      .findAllMatchIn(Files.readString(f))
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private def writeUsers(tenantId: String, us: Map[String, String]): Unit =
    writeJson(usersFile(tenantId),
      us.toSeq.sorted.map { case (u, r) => s""""$u": "$r"""" }
        .mkString("{", ", ", "}"))

  def createUser(tenantId: String, userId: String, role: String,
                 actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    require(tenantExists(tenantId), s"no such tenant: $tenantId")
    requireName(userId, "user id")
    require(Roles(role), s"unknown role: $role (allowed: ${Roles.mkString("/")})")
    val us = users(tenantId)
    require(!us.contains(userId), s"user already exists: $userId")
    writeUsers(tenantId, us + (userId -> role))
  }

  def updateUserRole(tenantId: String, userId: String, role: String,
                     actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    require(Roles(role), s"unknown role: $role")
    val us = users(tenantId)
    require(us.contains(userId), s"no such user: $userId")
    writeUsers(tenantId, us + (userId -> role))
  }

  def deleteUser(tenantId: String, userId: String,
                 actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    val us = users(tenantId)
    require(us.contains(userId), s"no such user: $userId")
    writeUsers(tenantId, us - userId)
  }

  // -------------------------------------------------------------------
  // cache policy store (CacheController.cs:26-60 GET/PUT policies;
  // Model/CachePolicyConfig.cs:3-8 — same fields, same defaults).
  // Persisted as config-plane JSON rather than process memory so every
  // driver/gateway sees one policy; callers feed `defaultTtlSeconds`
  // into the engine's `ttlSeconds` search argument.
  // -------------------------------------------------------------------

  private def policyFile = Paths.get(s"$root/cache_policy.json")

  def cachePolicy: CachePolicy = {
    if (!Files.exists(policyFile)) CachePolicy()
    else {
      val s = Files.readString(policyFile)
      CachePolicy(
        raw""""enableCache"\s*:\s*(true|false)""".r.findFirstMatchIn(s)
          .forall(_.group(1) == "true"),
        jLong(s, "defaultTtlSeconds").getOrElse(60L).toInt)
    }
  }

  def updateCachePolicy(p: CachePolicy,
                        actingUser: String = Management.SystemUser): Unit = {
    require(p.defaultTtlSeconds >= 0, "DefaultTtlSeconds must be >= 0.")
    writeJson(policyFile,
      s"""{"enableCache": ${p.enableCache}, "defaultTtlSeconds": ${p.defaultTtlSeconds}}""")
  }

  // -------------------------------------------------------------------
  // indexes (IndexController.cs:29-78 create, 80-123 build, 125-228
  // snapshot/load, 230-249 stats, 251-292 centroids)
  // -------------------------------------------------------------------

  private def indexFile(t: String, i: String) =
    Paths.get(s"$root/indexes/$t/$i/config.json")

  def createIndex(tenantId: String, indexName: String, cfg: DeclaredIndex,
                  actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "admin")
    requireName(tenantId, "tenant id"); requireName(indexName, "index name")
    require(cfg.dim > 0, s"dim must be positive: ${cfg.dim}")
    require(Set("L2", "IP", "COSINE")(cfg.metric.toUpperCase(java.util.Locale.ROOT)),
      s"unknown metric: ${cfg.metric}")
    require(Set("FLAT", "IVF_FLAT", "IVF_PQ", "HNSW")(cfg.algo.toUpperCase(java.util.Locale.ROOT)),
      s"unknown algo: ${cfg.algo}")
    require(!Files.exists(indexFile(tenantId, indexName)),
      s"index already exists: $tenantId/$indexName")
    writeJson(indexFile(tenantId, indexName),
      s"""{"dim": ${cfg.dim}, "metric": "${cfg.metric.toUpperCase(java.util.Locale.ROOT)}", "algo": "${cfg.algo.toUpperCase(java.util.Locale.ROOT)}", "nlist": ${cfg.nlist}, "pqM": ${cfg.pqM}, "pqK": ${cfg.pqK}}""")
  }

  def indexConfig(tenantId: String, indexName: String): Option[DeclaredIndex] = {
    val f = indexFile(tenantId, indexName)
    if (!Files.exists(f)) None
    else {
      val s = Files.readString(f)
      Some(DeclaredIndex(
        jLong(s, "dim").getOrElse(0L).toInt,
        jString(s, "metric").getOrElse("L2"),
        jString(s, "algo").getOrElse("IVF_FLAT"),
        jLong(s, "nlist").getOrElse(16L).toInt,
        jLong(s, "pqM").getOrElse(8L).toInt,
        jLong(s, "pqK").getOrElse(256L).toInt))
    }
  }

  /** Build with the DECLARED config — the REST build route has no
    * parameters; everything comes from index creation. */
  def buildIndex(tenantId: String, indexName: String, seed: Long = 42L,
                 actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    val cfg = indexConfig(tenantId, indexName)
      .getOrElse(throw new IllegalArgumentException(
        s"no such index: $tenantId/$indexName (createIndex first)"))
    engine.build(tenantId, indexName, nlist = cfg.nlist, metric = cfg.metric,
      seed = seed, algo = cfg.algo, pqM = cfg.pqM, pqK = cfg.pqK)
  }

  def indexStats(tenantId: String, indexName: String,
                 actingUser: String = Management.SystemUser): DataFrame = {
    authorize(tenantId, actingUser, "reader")
    engine.stats(tenantId, indexName)
  }

  def snapshotIndex(tenantId: String, indexName: String, dest: String,
                    actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    engine.exportSnapshot(tenantId, indexName, dest)
  }

  def loadIndex(tenantId: String, indexName: String, src: String,
                actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    engine.importSnapshot(tenantId, indexName, src)
  }

  /** Push externally trained semantic-cluster centroids into the L2 cache
    * layer (sidecar → server flow). */
  def updateCentroids(tenantId: String, indexName: String,
                      centroids: DataFrame,
                      actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    engine.setCacheCentroids(tenantId, indexName, centroids)
  }

  // -------------------------------------------------------------------
  // cache (CacheController.cs:62-79 flush, 81-103 invalidate)
  // -------------------------------------------------------------------

  def flushCache(tenantId: String, indexName: String,
                 actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    engine.flushCache(tenantId, indexName)
  }

  def invalidateCache(tenantId: String, indexName: String,
                      actingUser: String = Management.SystemUser): Unit = {
    authorize(tenantId, actingUser, "writer")
    engine.invalidateCache(tenantId, indexName)
  }

  /** Entry-table GC on demand (the maintenance form of the lazy sweep —
    * reference: MemoryCacheStorage eviction surfaced through stats).
    * Returns the number of evicted entries. */
  def compactCache(tenantId: String, indexName: String, now: Long,
                   actingUser: String = Management.SystemUser): Long = {
    authorize(tenantId, actingUser, "writer")
    engine.compactCacheEntries(tenantId, indexName, now)
  }

  // -------------------------------------------------------------------
  // billing (BillingController.cs:26-46): usage rollup per tenant/index
  // from the engine's metrics log
  // -------------------------------------------------------------------

  def billingUsage(tenantId: String,
                   actingUser: String = Management.SystemUser): DataFrame = {
    authorize(tenantId, actingUser, "reader")
    val base = Paths.get(s"$root/metrics/$tenantId")
    val indexes =
      if (!Files.isDirectory(base)) Seq.empty[String]
      else {
        val it = Files.list(base).iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) { val p = it.next(); if (Files.isDirectory(p)) buf += p.getFileName.toString }
        buf.toSeq.sorted
      }
    import spark.implicits._
    val frames = indexes.map { idx =>
      spark.read.parquet(s"$root/metrics/$tenantId/$idx")
        .agg(sum("hits").as("cache_hits"), sum("misses").as("cache_misses"))
        .select(lit(tenantId).as("tenant_id"), lit(idx).as("index_name"),
          coalesce(col("cache_hits"), lit(0L)).as("cache_hits"),
          coalesce(col("cache_misses"), lit(0L)).as("cache_misses"))
    }
    val empty = Seq.empty[(String, String, Long, Long)]
      .toDF("tenant_id", "index_name", "cache_hits", "cache_misses")
    frames.foldLeft(empty)(_ unionByName _)
      .withColumn("requests", col("cache_hits") + col("cache_misses"))
  }

  // -------------------------------------------------------------------
  // audit (AuditController.cs:23-95: filtered logs + stats)
  // -------------------------------------------------------------------

  def audit(actor: String, action: String, resource: String, ts: Long): Unit =
    engine.audit(actor, action, resource, ts)

  def auditLogs(actor: Option[String] = None, action: Option[String] = None,
                fromTs: Option[Long] = None, toTs: Option[Long] = None): DataFrame = {
    var df = engine.auditLog()
    actor.foreach(a => df = df.filter(col("actor") === a))
    action.foreach(a => df = df.filter(col("action") === a))
    fromTs.foreach(t => df = df.filter(col("ts") >= t))
    toTs.foreach(t => df = df.filter(col("ts") <= t))
    df.orderBy("ts")
  }

  def auditStats(): DataFrame =
    engine.auditLog().groupBy("action").agg(count(lit(1)).as("n"))
      .orderBy("action")

  // -------------------------------------------------------------------
  // health / metrics (HealthController.cs:16-27)
  // -------------------------------------------------------------------

  def health(): String = """{"status": "healthy"}"""

  def metricsText(tenantId: String, indexName: String,
                  latencies: Option[DataFrame] = None,
                  actingUser: String = Management.SystemUser): String = {
    authorize(tenantId, actingUser, "reader")
    engine.statsText(tenantId, indexName, latencies)
  }

  // -------------------------------------------------------------------
  // AI model registry (AiController.cs:30-196 + semantic_model.py:9-53):
  // versioned centroid models with explicit deploy and one-step rollback
  // -------------------------------------------------------------------

  private def modelDir(name: String) = s"$root/models/$name"
  private def registryFile(name: String) = Paths.get(s"${modelDir(name)}/registry.json")

  private def registry(name: String): (Long, Long, Long) = { // (latest, active, previous)
    val f = registryFile(name)
    if (!Files.exists(f)) (0L, 0L, 0L)
    else {
      val s = Files.readString(f)
      (jLong(s, "latest").getOrElse(0L), jLong(s, "active").getOrElse(0L),
        jLong(s, "previous").getOrElse(0L))
    }
  }

  private def writeRegistry(name: String, latest: Long, active: Long,
                            previous: Long): Unit =
    writeJson(registryFile(name),
      s"""{"latest": $latest, "active": $active, "previous": $previous}""")

  /** Train a new semantic-cluster model version (KMeans over the given
    * vectors — the sidecar's n_clusters-KMeans, semantic_model.py:17-29).
    * vectors: (id BIGINT, vec ARRAY<FLOAT>). Returns the new version.
    * Training does NOT deploy (the reference deploys explicitly). */
  def trainModel(name: String, vectors: DataFrame, k: Int,
                 seed: Long = 42L): Long = {
    requireName(name, "model name")
    val (latest, active, previous) = registry(name)
    val v = latest + 1
    val idx = graft.operators.IvfFlat.build(vectors, nlist = k, seed = seed)
    idx.centroids.write.mode("overwrite")
      .parquet(s"${modelDir(name)}/v$v/centroids")
    writeRegistry(name, v, active, previous)
    v
  }

  def modelVersions(name: String): Seq[Long] = {
    val (latest, _, _) = registry(name)
    (1L to latest)
  }

  def activeModel(name: String): Option[Long] =
    registry(name) match { case (_, a, _) => if (a > 0) Some(a) else None }

  def deployModel(name: String, version: Long): Unit = {
    val (latest, active, _) = registry(name)
    require(version >= 1 && version <= latest,
      s"no such version: $name v$version (latest: v$latest)")
    writeRegistry(name, latest, version, active)
  }

  /** One-step rollback to the previously active version. */
  def rollbackModel(name: String): Unit = {
    val (latest, active, previous) = registry(name)
    require(previous > 0, s"nothing to roll back to for $name")
    writeRegistry(name, latest, previous, active)
  }

  def modelCentroids(name: String, version: Long): DataFrame =
    spark.read.parquet(s"${modelDir(name)}/v$version/centroids")

  /** Push the ACTIVE model's centroids into an index's L2 cache layer —
    * the sidecar's trained-model → server centroid-sync flow. */
  def deployModelToIndex(name: String, tenantId: String,
                         indexName: String): Unit = {
    val v = activeModel(name).getOrElse(
      throw new IllegalArgumentException(s"model $name has no active version"))
    updateCentroids(tenantId, indexName, modelCentroids(name, v))
  }

  // -------------------------------------------------------------------
  // quota → plan-time degradation bridge (steps 8-9 of the read path,
  // resolved from the STORED tenant config)
  // -------------------------------------------------------------------

  def searchOptionsFor(tenantId: String, indexName: String,
                       degraded: Boolean = false,
                       monthSpend: Double = 0.0,
                       cacheHintForce: Boolean = false): engine.SearchOptions = {
    val q = quota(tenantId)
    engine.resolveSearchOptions(tenantId, indexName, degraded,
      priority = q.priority, overBudget = monthSpend > q.monthlyBudget,
      cacheHintForce = cacheHintForce, cacheMemoryMb = q.cacheMemoryMb)
  }
}
