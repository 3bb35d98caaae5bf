package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Normalize.normalize(col("t"))).head.getString(0)

  test("normalize: case, digits, punctuation, whitespace") {
    assert(norm("Hello,   WORLD! 42 dots...") == "hello world 00 dots")
    assert(norm("  a  b  ") == "a b")
    assert(norm("") == "")
    assert(norm("!!!") == "")
  }

  test("normalize is idempotent; reformatted casings collide") {
    val x = "TERMS   of service APPLY;  see Section 4?"
    val y = "Terms of Service apply. See section 4!"
    assert(norm(x) == norm(y))
    assert(norm(norm(x)) == norm(x))
    // distinct content stays distinct
    assert(norm("alpha beta") != norm("alpha gamma"))
  }
}
