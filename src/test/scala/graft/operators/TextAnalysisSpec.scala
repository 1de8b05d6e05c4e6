package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality features on a known sentence") {
    val docs = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(docs).head
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct") == 5)
    assert(r.getAs[Long]("n_stop") == 2) // two 'the'
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_token_len") - 17.0 / 6) < 1e-12)
  }

  test("langId picks the dominant stopword profile; und when none") {
    val docs = Seq(
      (1L, "the cat and the dog in a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat et la maison est dans paris"),
      (4L, "qwerty zxcvb asdfg")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "und")
  }

  test("langId tie-break precedence is deterministic (en wins ties)") {
    val docs = Seq((1L, "la the")).toDF("doc_id", "text") // en=1 fr=1 es=1
    assert(TextAnalysis.langId(docs).head.getString(1) == "en")
  }

  test("bpeTokenCount segments contractions, digits, and punctuation runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "don't stop 123 now!!"),
      (2L, "hello world"),
      (3L, "a1b2")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCount(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // don | 't | " stop" | " 123" | " now" | !! → 6
    assert(got(1L) == 6L, s"got ${got(1L)}")
    assert(got(2L) == 2L)   // hello | " world"
    assert(got(3L) == 4L)   // a | 1 | b | 2
  }

  test("repetition: top-bigram count and fraction; single-token docs drop") {
    val docs = Seq(
      (1L, "buy now buy now buy now"),    // bigrams: "buy now"×3, "now buy"×2
      (2L, "a b c d"),                    // all distinct → top=1 of 3
      (3L, "solo")                        // no bigram → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("top_bigram_n"),
          r.getAs[Double]("top_bigram_frac")))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 5L && got(1L)._2 == 3L)
    assert(math.abs(got(1L)._3 - 3.0 / 5) < 1e-12)
    assert(got(2L) == ((3L, 1L, 1.0 / 3)))
  }

  test("piiScan: planted emails/IPs/phones are counted and scrubbed") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.co or bob@host.org thanks"),
      (2L, "server 10.0.255.7 and 192.168.1.1 up; call +1 415-555-0100"),
      (3L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_phones"), r.getAs[Long]("n_chars_scrubbed")))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 0L && got(1L)._3 == 0L)
    assert(got(2L)._1 == 0L && got(2L)._2 == 2L && got(2L)._3 == 1L)
    assert(got(3L) == ((0L, 0L, 0L,
      "clean text with no identifiers at all".length.toLong))) // untouched
    // scrub replaces, never leaks: redacted doc 1 contains no '@'
    val scrubLen1 = got(1L)._4
    val expected1 = "mail me at <EMAIL> or <EMAIL> thanks".length.toLong
    assert(scrubLen1 == expected1)
  }

  test("piiScan: documented over-match and double-count edges are pinned") {
    val docs = Seq(
      // PhonePat's loose separator run bridges the space: ONE phone match
      // swallowing both digit groups, not two.
      (1L, "ref +12345678 9012 end"),
      // A span matching two patterns counts once under EACH, but the
      // sequential scrub (email first) resolves it to a single <EMAIL>.
      (2L, "ping user@192.168.1.1.com now")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_phones"), r.getAs[Long]("n_chars_scrubbed")))).toMap
    assert(got(1L) == ((0L, 0L, 1L, "ref <PHONE> end".length.toLong)))
    assert(got(2L) == ((1L, 1L, 0L, "ping <EMAIL> now".length.toLong)))
  }
}
