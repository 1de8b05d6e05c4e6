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
