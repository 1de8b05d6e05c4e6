package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, and a deterministic stopword-profile language guesser.
  * All arithmetic is integer counts and exact divisions so results are
  * engine-independent (DuckDB-oracle-safe).
  */
object TextAnalysis {

  val EnStop: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  val DeStop: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "ein", "zu", "nicht", "mit", "auf")
  val FrStop: Seq[String] =
    Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans")
  val EsStop: Seq[String] =
    Seq("el", "los", "y", "es", "un", "una", "que", "por", "para", "con")

  private def toks(c: Column): Column = split(c, " ", -1)

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  /** Per-document quality features: token counts, distinct ratio, stopword
    * ratio, mean token length — the length/punct/stopword heuristics of a
    * pretraining-quality filter. */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      countIn(t, EnStop).cast("long").as("n_stop"),
      length(col("text")).cast("long").as("n_chars"))
    .withColumn("distinct_ratio", col("n_distinct") / col("n_tokens"))
    .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
    .withColumn("mean_token_len",
      (col("n_chars") - (col("n_tokens") - 1)) / col("n_tokens"))
  }

  /** BPE-style pre-tokenizer count: GPT-2-ish segmentation — contraction
    * suffixes, space-prefixed letter runs, space-prefixed digit runs,
    * space-prefixed punctuation runs, residual spaces. Lookahead-free so
    * the same pattern runs identically under Java regex (Spark) and RE2
    * (DuckDB oracle). A far better proxy for model token counts than
    * whitespace splitting (punctuation and numbers segment separately). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ']+| +"

  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Gopher-style repetition signal: the fraction of a document's word
    * bigrams taken by its single most frequent bigram — high values flag
    * boilerplate / generated spam for a pretraining filter (Rae et al.
    * 2021 "Scaling Language Models", repetition rules C.2).
    *
    * Scale shape: explode → hash-aggregate on (doc_id, bigram) → per-doc
    * max. Deliberately NOT a per-row array self-count (`transform` +
    * `filter` per element is O(L²) per document and runs in one task);
    * the aggregate form shuffles one row per DISTINCT (doc, bigram),
    * map-side combined, and parallelizes across the corpus — the shape
    * that survives 100 TB. Single-token documents have no bigram and
    * produce no row (matches the SQL oracle's semantics). */
  def repetition(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val bg = docs
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        (size(col("t")) - 1).cast("long").as("n_bigrams"),
        explode(zip_with(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
    bg.groupBy("doc_id", "n_bigrams", "bigram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_bigrams")
      .agg(max("c").as("top_bigram_n"))
      .withColumn("top_bigram_frac", col("top_bigram_n") / col("n_bigrams"))
  }

  /** PII patterns, shared verbatim with the DuckDB oracle: lookahead-free
    * and backreference-free so Java regex (Spark) and RE2 (DuckDB) agree
    * on every match. Both engines use leftmost-first (Perl-style)
    * matching — not POSIX leftmost-longest — and these patterns have no
    * alternations whose branch order could differ, so matches agree.
    * Note PhonePat's separator run `[0-9 -]{7,13}` is deliberately loose
    * (it can bridge a single space into an adjacent digit group, e.g.
    * "+12345678 9012" matches as one phone); both engines over-match
    * identically, and [[graft.TextAnalysisSpec]] pins the behavior. */
  val EmailPat: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePat: String = "\\+[0-9][0-9 -]{7,13}[0-9]"

  /** PII scan + scrub for a training corpus: per-document counts of
    * email / IPv4 / international-phone shapes and the length of the
    * redacted text (emails → <EMAIL>, then IPs → <IP>, then phones →
    * <PHONE>, in that fixed order so overlapping matches resolve
    * deterministically). Counts are computed per-pattern on the RAW text
    * while the scrub is sequential, so a span that matches two patterns
    * (e.g. "user@192.168.1.1.com" is one email AND one ipv4) counts once
    * under each but scrubs to a single replacement — counts can exceed
    * what n_chars_scrubbed implies. Pure column expressions — scales as
    * a scan. */
  def piiScan(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), lit(EmailPat), lit("<EMAIL>")),
        lit(Ipv4Pat), lit("<IP>")),
      lit(PhonePat), lit("<PHONE>"))
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0)))
        .cast("long").as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0)))
        .cast("long").as("n_phones"),
      length(scrubbed).cast("long").as("n_chars_scrubbed"))
  }

  /** Deterministic language guess: stopword-profile counts per language,
    * argmax with fixed precedence (en > de > fr > es), 'und' when no
    * profile matches. */
  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val en = countIn(t, EnStop); val de = countIn(t, DeStop)
    val fr = countIn(t, FrStop); val es = countIn(t, EsStop)
    docs.select(col("doc_id"), en.as("en"), de.as("de"), fr.as("fr"), es.as("es"))
      .withColumn("best", greatest(col("en"), col("de"), col("fr"), col("es")))
      .withColumn("lang_pred",
        when(col("best") === 0, "und")
          .when(col("en") === col("best"), "en")
          .when(col("de") === col("best"), "de")
          .when(col("fr") === col("best"), "fr")
          .otherwise("es"))
      .select("doc_id", "lang_pred")
  }
}
