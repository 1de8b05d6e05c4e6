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
}
