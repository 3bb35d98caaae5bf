package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4 "Skew handling" — the
  * reference left this as an open risk, reference/docs/README.md:370-373).
  * AQE's skew-join splitting covers sort-merge joins automatically; this
  * helper covers the cases AQE can't re-plan (e.g. a broadcast-unfriendly
  * medium dimension against a fact with a few pathological keys).
  */
object SkewTools {

  /** Salted inner equi-join: the fact side gets a deterministic salt from
    * `saltBy` (hash of a high-cardinality fact column — deterministic so
    * reruns reproduce), the dimension side is replicated `salts` ways, and
    * the join key becomes (key, salt), splitting each hot key's rows across
    * `salts` reducers. Result is row-identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
