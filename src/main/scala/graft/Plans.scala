package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BruteForceKnn, IvfFlat, TextDedup}

/** Dump formatted physical plans of the flagship operators — the
  * .explain evidence behind the scale-design claims (see PLANS.md). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    println("==== PLAN: brute-force batch KNN ====")
    BruteForceKnn.knn(vectors, queries, "COSINE", 5).explain("formatted")

    println("==== PLAN: IVF probe-pruned search over saved index ====")
    val idx = IvfFlat.build(vectors, nlist = 8)
    val tmp = java.nio.file.Files.createTempDirectory("plans").toString
    IvfFlat.save(idx, tmp)
    val loaded = IvfFlat.load(spark, tmp)
    IvfFlat.search(loaded, queries, "L2", 5, nprobe = 2).explain("formatted")

    println("==== PLAN: cluster filter on the partitioned index layout ====")
    spark.read.parquet(s"$tmp/vectors")
      .filter(col("cluster_id").isin(1, 2)).explain("formatted")

    println("==== PLAN: IVF_PQ driver-known ADC scoring (cluster-pruned scan) ====")
    val pqIdx = graft.operators.IvfPq.build(vectors, nlist = 8, m = 4, k = 8)
    val pqTmp = java.nio.file.Files.createTempDirectory("plans_pq").toString
    graft.operators.IvfPq.save(pqIdx, pqTmp)
    graft.operators.IvfPq
      .scoredCandidates(graft.operators.IvfPq.load(spark, pqTmp),
        queries, nprobe = 2)
      .explain("formatted")

    println("==== PLAN: shingle-join jaccard pairs (no cross product) ====")
    TextDedup.jaccardPairs(
      spark.read.parquet(s"$dir/documents.parquet"), 3, 0.5).explain("formatted")

    println("==== PLAN: embedding LSH near-dup pairs (banded equi-join) ====")
    val (lshPlan, lshBanded) =
      graft.operators.EmbeddingDedup.lshPairsPlan(emb, tau = 0.9, seed = 42L)
    lshPlan.explain("formatted")
    lshBanded.unpersist()

    println("==== PLAN: stratified sample quota via bounded top-k aggregate ====")
    graft.operators.Sampling.stratified(
      spark.read.parquet(s"$dir/documents.parquet"), "lang", "doc_id", 50)
      .explain("formatted")

    println("==== PLAN: decontamination (hashed-shingle equi-join vs eval grams) ====")
    val docsAll = spark.read.parquet(s"$dir/documents.parquet")
    TextDedup.contaminated(
      docsAll.filter(col("doc_id") % 10 =!= 0),
      docsAll.filter(col("doc_id") % 10 === 0), nGram = 5)
      .explain("formatted")

    spark.stop()
  }
}
