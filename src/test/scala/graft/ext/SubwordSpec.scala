package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference: greedy longest-match count of one word. */
  private def refCount(w: String, vocab: Set[String], maxLen: Int): Int = {
    var pos = 0
    var cnt = 0
    while (pos < w.length) {
      val l = (math.min(maxLen, w.length - pos) to 1 by -1)
        .find(l => vocab.contains(w.substring(pos, pos + l))).getOrElse(1)
      pos += l
      cnt += 1
    }
    cnt
  }

  private def refTokens(text: String): Seq[String] =
    "\\W+".r.split(text.toLowerCase).toSeq.filter(_.nonEmpty)

  test("trainVocab keeps every corpus character and the heaviest pieces") {
    val docs = Seq("the cat sat", "the cat ran", "thy thesis").toDF("text")
    val v = Subword.trainVocab(docs, "text", topMulti = 3, maxPieceLen = 5)
    val chars = "thecasrnyi".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(v.pieces.toSet))
    assert(v.pieces.count(_.length >= 2) == 3)
    // "th" weight 4 beats everything; deterministic selection
    assert(v.pieces.contains("th"))
  }

  test("kernel count equals the scala reference on fixture text") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val v = Subword.trainVocab(docs, "text", topMulti = 64, maxPieceLen = 5)
    val vs = v.pieces.toSet
    val got = docs
      .select(col("doc_id"), Subword.tokenCount(col("text"), v).as("n"))
      .as[(Long, Int)].collect().toMap
    val texts = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val want = refTokens(t).map(refCount(_, vs, 5)).sum
      assert(got(id) == want, s"doc $id")
    }
    // subword counts are strictly >= whitespace counts (each word >= 1)
    val ws = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n")).as[(Long, Int)].collect().toMap
    assert(texts.forall { case (id, _) => got(id) >= ws(id) })
  }

  test("unknown characters at encode time advance one char and count 1") {
    val train = Seq("abc abc").toDF("text")
    val v = Subword.trainVocab(train, "text", topMulti = 2, maxPieceLen = 5)
    val got = Seq("abc xyz").toDF("text")
      .select(Subword.tokenCount(col("text"), v).as("n"))
      .as[Int].head()
    // "abc" is one piece; x/y/z are unknown singles
    assert(got == 1 + 3)
  }

  test("subword counts plug into Packing and Mixing as the token column") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val v = Subword.trainVocab(docs, "text", topMulti = 64, maxPieceLen = 5)
    val counted = docs.select(col("doc_id"), col("source"),
      Subword.tokenCount(col("text"), v).as("sw_tokens"))
    val packed = Packing.contiguousFill(counted, "doc_id", "sw_tokens",
      budgetTokens = 2048L)
    val total = counted.agg(sum(col("sw_tokens").cast("long"))).head.getLong(0)
    val bins = packed.agg(max(col("bin"))).head.getLong(0)
    assert(bins == (total - 1) / 2048L,
      "contiguous fill over subword counts must use the exact total")
    val parts = counted.select(col("source")).distinct().as[String].collect()
      .map(_ -> 1L).toMap
    val picked = Mixing.sampleToBudget(counted, "doc_id", "source",
      "sw_tokens", budgetTokens = 4000L, parts = parts)
    assert(picked.count() > 0)
  }
}
