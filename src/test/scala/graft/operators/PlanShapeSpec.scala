package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-guard assertions on physical plan shape: the properties that keep
  * these operators viable at 100 TB must be visible in `.explain`. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  test("IVF on-disk layout gives partition pruning for cluster filters (nprobe path)") {
    val vectors = (0 until 200).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("id", "vec")
    val idx = IvfFlat.build(vectors, nlist = 4)
    val dir = Files.createTempDirectory("prune").toString
    IvfFlat.save(idx, dir)
    val plan = spark.read.parquet(s"$dir/vectors")
      .filter(col("cluster_id").isin(1, 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"), plan)
    // the data filter must NOT appear as a post-scan Filter on all rows
    assert(!plan.contains("PushedFilters: [In(cluster_id"), plan)
  }

  test("IVF_PQ driver-known scoring prunes the snapshot scan by probed cluster") {
    val vectors = (0 until 200).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("id", "vec")
    val idx = IvfPq.build(vectors, nlist = 4, m = 4, k = 8)
    val dir = Files.createTempDirectory("pq_prune").toString
    IvfPq.save(idx, dir)
    val loaded = IvfPq.load(spark, dir)
    val queries = Seq((0L, Seq.fill(4)(5f))).toDF("query_id", "qvec")
    // small batch → the driver-known ADC branch; its IN over the probed
    // clusters must reach the cluster-partitioned codes as a PARTITION
    // filter (a broadcast join alone never prunes the scan)
    val scored = IvfPq.scoredCandidates(loaded, queries, nprobe = 2)
    scored.collect() // finalize the adaptive plan
    val plan = scored.queryExecution.executedPlan.toString
    // the filter must sit INSIDE the partition-filter list, not merely
    // appear somewhere in the tree
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cluster_id.*"), plan)
    assert(!plan.contains("PushedFilters: [In(cluster_id"), plan)
  }

  test("IVF_PQ distributed scoring prunes the snapshot scan by probed cluster") {
    val vectors = (0 until 200).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("id", "vec")
    val idx = IvfPq.build(vectors, nlist = 4, m = 4, k = 8)
    val dir = Files.createTempDirectory("pq_prune_dist").toString
    IvfPq.save(idx, dir)
    val loaded = IvfPq.load(spark, dir)
    val queries = Seq((0L, Seq.fill(4)(5f))).toDF("query_id", "qvec")
    // maxLocalQueries=0 forces the distributed ADC branch; its IN over
    // the probed clusters must prune the partitioned codes scan too
    val scored = IvfPq.scoredCandidates(loaded, queries, nprobe = 2,
      maxLocalQueries = 0)
    scored.collect() // finalize the adaptive plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cluster_id.*"), plan)
    assert(!plan.contains("PushedFilters: [In(cluster_id"), plan)
  }

  test("parquet scan prunes columns: 2-column projection reads 2 columns") {
    val dir = Files.createTempDirectory("cols").toString + "/data"
    (0 until 100).map(i => (i.toLong, i.toString, i * 1.0, Seq(i.toFloat)))
      .toDF("id", "name", "value", "vec").write.parquet(dir)
    val df = spark.read.parquet(dir).select("id", "value")
      .filter(col("value") > 10)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,value:double>"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,10.0)"), plan)
  }

  test("vector score expression stays inside whole-stage codegen") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("id", "vec")
    val q = Seq(Tuple1(Seq(1f, 0f))).toDF("qvec")
    val scored = df.crossJoin(broadcast(q))
      .select(col("id"), graft.functions.vector_dot(col("vec"), col("qvec")).as("s"))
      .filter(col("s") > 0)
    assert(scored.collect().length == 2) // compiles, runs, finalizes THIS plan
    // codegen'd spans print as "*(n)" in the tree string
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("embedding LSH pairs: banded equi-join, no cartesian/nested-loop product") {
    val emb = (0 until 50).map(i => (i.toLong, Seq.fill(8)(i * 0.1f)))
      .toDF("vec_id", "embedding")
    // the pre-checkpoint plan (lshPairs materializes its output)
    val (planDf, banded) = EmbeddingDedup.lshPairsPlan(emb, tau = 0.9, seed = 42L)
    val plan =
      try planDf.queryExecution.executedPlan.toString
      finally banded.unpersist()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // candidates come from an equi-join on (band, band-hash)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("simhashPairs serves from materialized candidates: one fingerprint pass, no join in the final plan") {
    val docs = (0 until 40).map(i => (i.toLong, s"alpha beta gamma delta $i"))
      .toDF("doc_id", "text")
    val result = TextDedup.simhashPairs(docs, maxHamming = 20)
    val plan = result.queryExecution.executedPlan.toString
    // the band self-join ran ONCE inside the localCheckpoint (over the
    // persisted banded table — fingerprint UDF evaluated a single time);
    // the returned frame must scan that checkpoint, not re-plan the join
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
    assert(result.count() > 0)
  }

  test("minhashLshPairs serves from materialized pairs: verify ran inside the checkpoint") {
    val docs = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, s"the quick brown fox jumps over the lazy dog tail $i")
      else (i.toLong, s"completely different text body number $i with many other words")
    }.toDF("doc_id", "text")
    val result = TextDedup.minhashLshPairs(docs, n = 3, tau = 0.5)
    val plan = result.queryExecution.executedPlan.toString
    // band join + pair-local verify both ran eagerly inside localCheckpoints;
    // the returned frame must scan the checkpoint, not re-plan any join
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
  }

  test("stratified sampling runs through the top-k aggregate, not a per-stratum window sort") {
    val docs = (0L until 50L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "lang")
    val plan = Sampling.stratified(docs, "lang", "doc_id", n = 5)
      .queryExecution.executedPlan.toString
    // the quota is enforced by the bounded aggregate (map-side partial,
    // <= n rows per stratum per task to the shuffle); a Window node here
    // would mean the full corpus is shuffled and sorted per stratum
    assert(plan.contains("topk_hits"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("decontamination is a hashed-shingle equi-join: no cartesian, no forced broadcast") {
    val docs = (0 until 40).map(i => (i.toLong, s"alpha beta gamma delta epsilon word$i end"))
      .toDF("doc_id", "text")
    val plan = TextDedup.contaminated(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0), nGram = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("top-k over scored candidates shuffles only aggregated buffers, not raw rows") {
    val df = (0 until 1000).map(i => (i % 7L, i.toLong, i * 0.5))
      .toDF("query_id", "id", "score").repartition(8)
    val plan = TopK.perGroup(df, Seq("query_id"), 5)
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate before the exchange, final after
    val exchangeIdx = plan.indexOf("Exchange")
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    assert(firstAgg >= 0 && exchangeIdx >= 0, plan)
    assert(plan.indexOf("ObjectHashAggregate", exchangeIdx) > exchangeIdx, plan)
  }

  test("span dedup is agg + equi-join, no cartesian, no window over the corpus") {
    val docs = (0 until 30).map(i => (i.toLong, s"a b c d e f g h i j word$i tail"))
      .toDF("doc_id", "text")
    val plan = TextDedup.dedupSpans(docs, width = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the global span-count side joins back by span equality
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    // reassembly is collect_list-in-agg, never a corpus-wide Window sort
    assert(!plan.contains("Window"), plan)
  }

  test("span dedup shuffles hash skeletons: count-join keys are xxhash64 columns, no span string in any exchange") {
    val docs = (0 until 30).map(i => (i.toLong, s"a b c d e f g h i j word$i tail"))
      .toDF("doc_id", "text")
    val result = TextDedup.dedupSpans(docs, width = 4)
    result.collect() // finalize the adaptive plan
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), plan)
    // the span-count aggregation and its join exchange on (h1, h2) longs
    assert("hashpartitioning\\(h1#\\d+L, h2#\\d+L".r.findFirstIn(plan).isDefined, plan)
    // no exchange is keyed on the raw span text (posexplode emits `col`)
    assert("hashpartitioning\\((span|col)#".r.findFirstIn(plan).isEmpty, plan)
  }

  test("star edges: one bucket exchange, per-task two-pass — no sort, no join, no cache") {
    // the corpus-scale property of the r10 star stage: the bands×corpus
    // table crosses exactly ONE exchange (the bucket repartition) into a
    // per-task two-pass map — no Window (whose required per-partition
    // ordering sorted the full 640M-row band table at the 10M rung,
    // 87.2 s graded, the r9 stage's measured cost center), no sort, no
    // join, nothing corpus-sized persisted. The second hashpartitioning
    // in the plan is the distinct over the (tiny) edge set.
    val docs = (0L until 40L)
      .map(i => (i, (0 until 12).map(t => s"w${(i % 5 + t)}").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = docs
      .select(col("doc_id"), TextDedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextDedup.shingleHashesOfTokens(col("toks"), 3).as("sh"))
      .select(col("doc_id"),
        TextDedup.minhashUdf(16)(col("sh")).as("sig"))
    val banded = TextDedup.bandedTable(sigs, 16, 8)
    val edges = TextDedup.starEdges(banded)
    edges.collect() // finalize the adaptive plan
    // AQE's toString prints final + initial plans — assert on final only
    val plan = edges.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.contains("Window") && !plan.contains("Sort ["), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan)
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9_]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.count(_ == "bucket") == 1,
      s"band table must cross exactly one bucket exchange: $exchanges\n$plan")
    assert(!plan.contains("InMemoryTableScan"), plan)
  }

  test("verify hydrate BROADCASTS a checkpointed pair side under the gate: the shingle table never shuffles") {
    // lever (b) of the r9 dedup work, pinned: with the exact-count
    // broadcast hint, the single verify join keeps the corpus-sized
    // shingle side stationary regardless of autoBroadcastJoinThreshold
    // (the default 10 MB abandons the map-side hydrate at ~400k pairs —
    // measured as a full shuffle of the ~9 GB shingle table at 10M docs)
    val docs = (0L until 40L)
      .map(i => (i, (0 until 12).map(t => s"w${(i % 5 + t)}").mkString(" ")))
      .toDF("doc_id", "text")
    val docShingles = docs
      .select(col("doc_id"), TextDedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextDedup.shingleHashesOfTokens(col("toks"), 3).as("shingles"))
    val pairs = Seq((0L, 5L), (1L, 6L), (2L, 7L)).toDF("id1", "id2")
      .localCheckpoint()
    val verified = TextDedup.verifyPairLocal(
      docShingles, TextDedup.hintedPairs(pairs))
    verified.collect()
    val plan = verified.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the shingle side reaches the join without crossing an exchange:
    // the only hashpartitioning in the final plan is the pair-fold
    // groupBy's (id1, id2), never the shingle table's doc_id
    assert(!"hashpartitioning\\(doc_id#".r.findFirstIn(plan).isDefined, plan)
  }
}
