package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SymSpell-blocked edit-distance-1 pairs: the delete-1 key join is
  * exhaustive for d<=1 and the levenshtein verify rejects the false
  * candidates blocking lets through. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deleteVariants: token plus each single deletion") {
    val out = Seq("cat").toDF("t")
      .select(Fuzzy.deleteVariants(col("t"))).head.getSeq[String](0).toSet
    assert(out == Set("cat", "at", "ct", "ca"))
  }

  test("typoPairs finds exactly the d<=1 pairs") {
    val toks = Seq("cat", "cut", "cart", "ca", "dog", "dig", "night",
      "table", "cable", "xcat", "caty").toDF("tok")
    val pairs = Fuzzy.typoPairs(toks, "tok")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(
      ("cat", "cut"),     // substitution
      ("cart", "cat"),    // deletion
      ("ca", "cat"),      // insertion
      ("dig", "dog"),     // substitution
      ("cable", "table"), // substitution at position 1
      ("cat", "xcat"),    // front insertion
      ("cat", "caty")     // back insertion
    ))
    // the false candidates blocking admits are rejected by the verify:
    // "xcat"/"caty" share the delete-1 variant "cat" but are d=2
    assert(!pairs.contains(("caty", "xcat")))
  }

  test("duplicate input tokens collapse before pairing") {
    val toks = (Seq.fill(50)("abc") ++ Seq.fill(30)("abd")).toDF("tok")
    val pairs = Fuzzy.typoPairs(toks, "tok").collect()
    assert(pairs.length == 1 &&
      pairs.head.getString(0) == "abc" && pairs.head.getString(1) == "abd")
  }
}
