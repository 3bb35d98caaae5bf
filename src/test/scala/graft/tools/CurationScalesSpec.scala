package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Scale-spec parsing for the curation grid (no Spark session needed):
  * the bench's `SPARK_GRAFT_CURATION_SCALES` string must round-trip into
  * (name, copies, morFocus, cowProps) — in particular `morcow`, the
  * sf100 mode that adds the CoW SCD2 cells at the low proportions. */
class CurationScalesSpec extends AnyFunSuite {

  test("parseScales: full grid, mor, and morcow modes") {
    val parsed = CurationBench.parseScales("sf1:1,sf10:10,sf100:100:morcow")
    assert(parsed == Seq(
      ("sf1", 1, false, Seq.empty[Double]),
      ("sf10", 10, false, Seq.empty[Double]),
      ("sf100", 100, true, Seq(0.001, 0.01))))
    val morOnly = CurationBench.parseScales("sf100:100:mor")
    assert(morOnly == Seq(("sf100", 100, true, Seq.empty[Double])))
  }

  test("parseScales: morcow@p|p picks explicit CoW proportions") {
    val parsed = CurationBench.parseScales("sf30:30:morcow@0.001|0.01|0.1")
    assert(parsed == Seq(("sf30", 30, true, Seq(0.001, 0.01, 0.1))))
    // typos name themselves instead of a bare NumberFormat/IndexOOB:
    // a comma inside the props list fractures the scale spec itself...
    val e = intercept[IllegalArgumentException] {
      CurationBench.parseScales("sf30:30:morcow@0,001")
    }
    assert(e.getMessage.contains("001"))
    // ...and a non-numeric proportion is named with its spec
    val e2 = intercept[IllegalArgumentException] {
      CurationBench.parseScales("sf30:30:morcow@x")
    }
    assert(e2.getMessage.contains("sf30:30:morcow@x"))
  }

  test("scaleEstimateS grows with copies and with CoW cells") {
    val base = CurationBench.scaleEstimateS(100, morFocus = true, iters = 2)
    val withCow =
      CurationBench.scaleEstimateS(100, morFocus = true, iters = 2, cowCells = 4)
    assert(withCow > base)
    assert(CurationBench.scaleEstimateS(10, morFocus = false, iters = 2) >
      CurationBench.scaleEstimateS(1, morFocus = false, iters = 2))
  }
}
