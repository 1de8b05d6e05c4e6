package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorSimHash

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: 0/1 near-dups (one word changed out of 40), 2 exact dup
  // of 0, 3/4 unrelated (disjoint vocabularies). Long docs keep SimHash bit
  // margins stable.
  private val base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
    "kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu red green blue yellow " +
    "purple orange silver golden copper iron stone river ocean cloud")
  private lazy val docs = Seq(
    (0L, base),
    (1L, base.replace("oscar", "mercury")),
    (2L, base),
    (3L, ("ein zwei drei vier funf sechs sieben acht neun zehn " +
      "elf zwolf dreizehn vierzehn funfzehn sechzehn siebzehn achtzehn neunzehn zwanzig " +
      "haus baum berg fluss wald feld stadt dorf strasse bruecke " +
      "sonne mond stern regen schnee wind sturm nebel donner blitz")),
    (4L, ("uno dos tres cuatro cinco seis siete ocho nueve diez " +
      "once doce trece catorce quince gato perro casa arbol montana " +
      "rio bosque campo ciudad pueblo calle puente sol luna estrella " +
      "lluvia nieve viento tormenta niebla trueno rayo mar playa isla"))
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val r = TextDedup.exact(docs).collect()
    assert(r.length == 4) // 0 and 2 collapse
    val dup = r.find(_.getAs[Long]("dup_cnt") == 2).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("ngram jaccard finds the planted near-dups and the exact dup") {
    val pairs = TextDedup.jaccardPairs(docs, n = 3, tau = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // exact dup → jaccard 1.0
    assert(pairs.contains((0L, 1L))) // near dup
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix-filtered jaccard == unfiltered (the filter is exact, not approximate)") {
    // wider fixture: 60 docs with a gradient of overlap so pairs sit on
    // both sides of tau and prefixes actually prune
    val words = (0 until 80).map(i => s"w$i")
    val grad = (0 until 60).map { d =>
      (100L + d, (0 until 40).map(j => words((d / 3 + j) % 80)).mkString(" "))
    }
    val all = docs.union(grad.toDF("doc_id", "text"))
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val plain = TextDedup.jaccardPairs(all, 3, tau, prefixFilter = false)
        .select("id1", "id2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      val pref = TextDedup.jaccardPairs(all, 3, tau)
        .select("id1", "id2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      assert(pref == plain, s"tau=$tau: prefix=${pref.size} plain=${plain.size}")
      // rarest-first (AllPairs frequency order) is exact too — any global
      // total order upholds the prefix guarantee
      val rare = TextDedup.jaccardPairs(all, 3, tau, rareFirst = true)
        .select("id1", "id2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      assert(rare == plain, s"tau=$tau: rareFirst=${rare.size} plain=${plain.size}")
    }
  }

  test("minhash LSH recovers the same pairs as exact jaccard at tau") {
    val exact = TextDedup.jaccardPairs(docs, 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(docs, 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
  }

  test("minhash signature similarity estimates jaccard") {
    val sigs = TextDedup.minhashSignatures(docs, 3, 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 128
    assert(est(0L, 2L) == 1.0)         // identical docs → identical sigs
    assert(est(0L, 1L) > 0.5)          // near dups
    assert(est(0L, 3L) < 0.2)          // unrelated
  }

  test("simhash: identical docs distance 0, near-dups close, unrelated far") {
    val fps = TextDedup.simhashes(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(VectorSimHash.hamming(fps(0L), fps(2L)) == 0)
    assert(VectorSimHash.hamming(fps(0L), fps(1L)) <= 12)
    assert(VectorSimHash.hamming(fps(0L), fps(3L)) > 12)
    val pairs = TextDedup.simhashPairs(docs, 12)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 3L && p._1 != 4L || p._1 == 3L))
  }

  test("fingerprint is order-sensitive, equal only for equal token streams") {
    val fps = TextDedup.fingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(2L))
    assert(fps(0L) != fps(1L))
    val rev = Seq((9L, "dog lazy the over jumps fox brown quick the"))
      .toDF("doc_id", "text")
    val fRev = TextDedup.fingerprints(rev).head.getLong(1)
    assert(fRev != fps(0L))
  }

  test("shingle hashes are boundary-exact and total: no separator aliasing, short docs empty") {
    // the multi-arg hash keeps token boundaries significant: 'a_b','c'
    // and 'a','b_c' join to the same '_'-separated string but are
    // DIFFERENT token streams — their trigram hash sets must be
    // disjoint at the aliased position, while equal token streams hash
    // identically; and a doc shorter than n yields an empty array, not
    // a descending-sequence runtime error
    val rows = Seq(
      (0L, "a_b c d"), (1L, "a b_c d"), (2L, "a_b c d"), // 0==2, 0!=1
      (3L, "x y")) // shorter than n=3
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextDedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextDedup.shingleHashesOfTokens(col("toks"), 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rows(0L) == rows(2L))
    assert(rows(0L).toSet.intersect(rows(1L).toSet).isEmpty,
      "separator-aliased token streams must not share shingle hashes")
    assert(rows(3L).isEmpty)
  }

  test("hub-shingle cap drops ubiquitous shingles but keeps true dups") {
    val withHub = docs.withColumn("text", concat(col("text"), lit(" common tail phrase")))
    val capped = TextDedup.jaccardPairs(withHub, 3, 0.5, maxDocFreq = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 2L)))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares the 5-gram span
      (2L, "alpha beta gamma other words here"),   // longest shared run = 3
      (3L, "completely unrelated text with nothing shared at all")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon prime")).toDF("doc_id", "text")
    val got = TextDedup.contaminated(train, eval, nGram = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc1 shares exactly one distinct 5-gram (alpha..epsilon); doc2's
    // longest common run is 3 tokens < 5; doc3 shares nothing
    assert(got == Map(1L -> 1L))
  }

  test("jaccard pair generation shuffles shingles, not a cross product") {
    // inspect the pre-checkpoint plan (jaccardPairs materializes eagerly)
    val (planDf, sh) = TextDedup.jaccardPairsPlan(docs, 3, 0.5, 0)
    val plan = planDf.queryExecution.executedPlan.toString
    sh.unpersist()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("span dedup strips every occurrence of a corpus-duplicated span, keeps order") {
    // width=2 spans: doc1 = [a b][c d][e f]; doc2 = [a b][x y];
    // doc3 = [c d]; doc4 = [u v] (unique). Duplicated spans: "a b"
    // (docs 1,2) and "c d" (docs 1,3).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, "u v")
    ).toDF("doc_id", "text")
    val got = TextDedup.dedupSpans(docs, width = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((3L, 2L, "e f")))
    assert(got(2L) == ((2L, 1L, "x y")))
    assert(got(3L) == ((1L, 1L, ""))) // everything removed → empty, not null
    assert(got(4L) == ((1L, 0L, "u v")))
  }

  test("span dedup keeps a ragged tail span and joins spans in document order") {
    // 5 tokens at width=2 → spans [p q][r s][t]; nothing duplicated
    val docs = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val r = TextDedup.dedupSpans(docs, width = 2).collect().head
    assert(r.getAs[Long]("n_spans") == 3L)
    assert(r.getAs[Long]("n_removed") == 0L)
    assert(r.getAs[String]("clean_text") == "p q r s t")
  }

  // seeded cluster corpus: `clusters` groups of `size` near-dups (each
  // member mutates ~1/mutMod of the source's tokens) + `unique` singletons
  private def clusterCorpus(clusters: Int, size: Int, unique: Int,
                            docLen: Int = 60, mutMod: Int = 50) = {
    val rng = new Random(97)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    (0 until clusters).foreach { c =>
      val src = Array.fill(docLen)(s"w${rng.nextInt(500000)}")
      (0 until size).foreach { m =>
        val toks =
          if (m == 0) src
          else src.map(t => if (rng.nextInt(mutMod) == 0) s"m${rng.nextInt(1 << 30)}" else t)
        rows += ((id, toks.mkString(" "))); id += 1
      }
    }
    (0 until unique).foreach { _ =>
      rows += ((id, Array.fill(docLen)(s"u${rng.nextInt(1 << 30)}").mkString(" ")))
      id += 1
    }
    rows.toSeq.toDF("doc_id", "text")
  }

  test("star-edge LSH keep-set == all-pairs LSH keep-set on clean clusters") {
    // the star variant trades the complete pair list for connectivity —
    // on mutual-near-dup clusters (the structure dedup targets) the
    // downstream keep-set must be IDENTICAL to the all-pairs recipe's
    val corpus = clusterCorpus(clusters = 12, size = 5, unique = 40)
    def keepSet(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TextDedup.keepCanonical(corpus.select("doc_id"), pairs)
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    val all = keepSet(TextDedup.minhashLshPairs(corpus, n = 3, tau = 0.5))
    val star = keepSet(TextDedup.minhashLshStarPairs(corpus, n = 3, tau = 0.5))
    assert(star == all)
    // sanity on the structure itself: 12 cluster canonicals + 40 singletons
    assert(all.values.toSet.size == 52, all.values.toSet.size)
  }

  test("star-edge LSH: a giant near-dup cluster costs O(c) verified edges, one canonical") {
    // ONE cluster of 60 near-identical docs: all-pairs candidate
    // generation would enumerate C(60,2) = 1770 pairs per colliding band;
    // the star emits ≤ ~bands distinct edges per member and the verify
    // keeps the cluster intact as a single component
    val c = 60
    val corpus = clusterCorpus(clusters = 1, size = c, unique = 20)
    val star = TextDedup.minhashLshStarPairs(corpus, n = 3, tau = 0.5)
    val nEdges = star.count()
    assert(nEdges < 6L * c, s"star edges must stay ~linear in c: $nEdges")
    val (comp, rounds) = Components.connectedComponentsWithRounds(star)
    val canon = TextDedup.keepCanonicalFrom(corpus.select("doc_id"), comp)
    assert(canon.filter(col("keep")).count() == 1 + 20)
    assert(canon.filter(col("canonical_id") === 0L).count() == c)
    assert(rounds >= 1 && rounds <= 10, s"rounds=$rounds")
  }

  test("sharded star recipe keep-set == unsharded keep-set when clusters straddle shards") {
    // every cluster's members are scattered round-robin across 4 shards,
    // so stage 1 (shard-local buckets) can NEVER see a whole cluster —
    // the cross-shard merge pass must restore exactly the connectivity
    // the sharding scoped out
    val corpus = clusterCorpus(clusters = 10, size = 8, unique = 30)
      .withColumn("shard", pmod(col("doc_id"), lit(4)))
    def keepSet(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TextDedup.keepCanonical(corpus.select("doc_id"), pairs)
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
    val sharded = keepSet(
      TextDedup.minhashLshStarPairsSharded(corpus, "shard", n = 3, tau = 0.5,
        stageSecs = (st, sec) => stages(st) = sec))
    val unsharded = keepSet(
      TextDedup.minhashLshStarPairs(corpus, n = 3, tau = 0.5))
    assert(sharded == unsharded)
    // the stage reporter fires once per stage, in recipe order, with
    // real (positive) wall clock — the bench's per-stage attribution
    // rows depend on this contract
    assert(stages.keys.toSeq == Seq("stage1", "stage2"), stages)
    assert(stages.values.forall(_ > 0.0), stages)
    // structure sanity: 10 cluster canonicals + 30 singletons survive
    assert(sharded.values.toSet.size == 40, sharded.values.toSet.size)
    // and stage 1 alone must NOT suffice (the test would be vacuous if
    // a single shard already connected each cluster): with 8 members
    // over 4 shards, shard-local components have ≥ 2 canonicals per
    // cluster unless the cross pass merges them — check via the
    // sharded pair set minus cross-shard pairs
    val within = TextDedup
      .minhashLshStarPairsSharded(corpus, "shard", n = 3, tau = 0.5)
      .filter(pmod(col("id1"), lit(4)) === pmod(col("id2"), lit(4)))
    val withinKeep = TextDedup.keepCanonical(corpus.select("doc_id"), within)
      .select("canonical_id").distinct().count()
    assert(withinKeep > 40, s"within-shard pairs alone must under-merge: $withinKeep")
  }

  test("batched star recipe: per-group band slices reproduce the fused keep-set") {
    // the scratch-bounded form (bands processed in groups, shingles
    // recomputed per group, nothing corpus-sized persisted) must land
    // on the SAME verified pair semantics as the fused recipe — buckets
    // are band-scoped, so grouping is a pure partition of the band set
    val corpus = clusterCorpus(clusters = 10, size = 8, unique = 30)
    def keepSet(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TextDedup.keepCanonical(corpus.select("doc_id"), pairs)
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
    val batched = keepSet(TextDedup.minhashLshStarPairsBatched(
      corpus, n = 3, tau = 0.5, bandGroups = 4,
      stageSecs = (st, sec) => stages(st) = sec))
    val fused = keepSet(TextDedup.minhashLshStarPairs(corpus, n = 3, tau = 0.5))
    assert(batched == fused)
    // stage reporter: one row per band group plus the verify tail
    assert(stages.keys.toSeq ==
      (0 until 4).map(g => s"band_group_$g") :+ "verify", stages)
    assert(stages.values.forall(_ > 0.0), stages)
    // degenerate single group ≡ the fused band set in one batch
    val one = keepSet(TextDedup.minhashLshStarPairsBatched(
      corpus, n = 3, tau = 0.5, bandGroups = 1))
    assert(one == fused)
    // bandGroups must divide bands
    intercept[IllegalArgumentException] {
      TextDedup.minhashLshStarPairsBatched(corpus, n = 3, tau = 0.5,
        bandGroups = 7)
    }
  }

  test("starEdges: two stars add exactly the second-hub edges, one window exchange") {
    // direct edge-set pin on a hand-built bucket table (starEdges is
    // LSH-agnostic — it sees only (doc_id, bucket)): bucket 100 holds
    // {1, 5, 9}, bucket 200 holds {2, 7}, bucket 300 holds {3}
    val banded = Seq((1L, 100L), (5L, 100L), (9L, 100L),
      (2L, 200L), (7L, 200L), (3L, 300L)).toDF("doc_id", "bucket")
    val one = TextDedup.starEdges(banded)
      .as[(Long, Long)].collect().toSet
    assert(one == Set((1L, 5L), (1L, 9L), (2L, 7L)))
    val two = TextDedup.starEdges(banded, stars = 2)
      .as[(Long, Long)].collect().toSet
    // second hub of bucket 100 is 5 → adds (5, 9); two-member and
    // singleton buckets gain nothing
    assert(two == one + ((5L, 9L)))
    // the scale property survives: the second hub comes from the SAME
    // per-task two-pass map as the first (min and second-min tracked
    // together) — no Window, no sort-merge join anywhere in the
    // two-star plan
    val df2 = TextDedup.starEdges(banded, stars = 2)
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"), plan)
  }

  test("two stars rescue a bucket whose minimum is a false-positive member") {
    // the documented single-star under-merge corner (ADVICE r8), built
    // directly: doc 1 is unrelated text, docs 5 ≈ 9 are near-dups, and
    // all three share one LSH bucket. Under one star both edges touch
    // the false-positive hub and fail the exact verify — (5, 9) is
    // never tested and the cluster under-merges. The second hub (5)
    // carries the genuine edge.
    val corpus = Seq(
      (1L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10 zz11 zz12"),
      (5L, base),
      (9L, base.replace("oscar", "mercury"))).toDF("doc_id", "text")
    val shingles = TextDedup.docShingleTable(corpus, 3)
    val banded = Seq((1L, 100L), (5L, 100L), (9L, 100L)).toDF("doc_id", "bucket")
    def verified(stars: Int): Set[(Long, Long)] = TextDedup
      .verifyPairLocal(shingles, TextDedup.starEdges(banded, stars))
      .filter(col("jaccard") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(verified(1) == Set.empty, "single star: fp hub silences the bucket")
    assert(verified(2) == Set((5L, 9L)), "second hub restores connectivity")
  }

  test("star-edge LSH: a boilerplate-collision bucket cannot merge unrelated docs") {
    // 20 docs share a 10-token boilerplate prefix but are otherwise
    // disjoint: their shared shingles can dominate min-hashes into
    // common buckets, yet every star edge must fail the exact-Jaccard
    // verify — linear cost, zero false merges
    val rng = new Random(131)
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val corpus = (0L until 20L).map(i =>
      (i, boiler + " " + Array.fill(50)(s"x${rng.nextInt(1 << 30)}").mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextDedup.minhashLshStarPairs(corpus, n = 3, tau = 0.5).isEmpty)
  }
}
