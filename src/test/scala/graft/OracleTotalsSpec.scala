package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench oracle-totals number parsing (round-18 advisor):
  * python json.dump emits exponent notation for tiny DuckDB times, and
  * a `[0-9.]+` pattern would parse `1e-05` as `1.0` — corrupting the
  * embedded spark-over-duckdb ratio by five orders of magnitude. Plain
  * JVM spec, no SparkSession. */
class OracleTotalsSpec extends AnyFunSuite {

  private val totals =
    """{"sf":"/root/testdata/sf0.1","complete":true,""" +
      """"group1_total":27.5,"group2_total":1e-05,""" +
      """"queries1":{"tiny":1e-05,"upper":2.5E-3,"plus":1.5e+2,""" +
      """"neg":-3e-2,"plain":0.125,"intish":4},""" +
      """"queries2":{"big":12.375}}"""

  test("entryMap parses exponent-notation floats exactly (1e-05 is not 1.0)") {
    val m = OracleTotals.entryMap(totals, "queries1")
    assert(m("tiny") === 1e-05)
    assert(m("upper") === 2.5e-3)
    assert(m("plus") === 150.0)
    assert(m("neg") === -0.03)
    assert(m("plain") === 0.125)
    assert(m("intish") === 4.0)
    assert(m.size === 6)
    assert(OracleTotals.entryMap(totals, "queries2") === Map("big" -> 12.375))
    assert(OracleTotals.entryMap(totals, "missing").isEmpty)
  }

  test("stringList reads the subset key; absent key is empty (full-suite file)") {
    val subset = totals.dropRight(1) +
      ""","subset":["ann_int8_topk","tpch_q1","tpch_q5"]}"""
    assert(OracleTotals.stringList(subset, "subset") ===
      Seq("ann_int8_topk", "tpch_q1", "tpch_q5"))
    // a full-suite totals file has no subset key: the list is empty, so
    // Bench's subset-agreement check (empty == empty for a full run,
    // exact set match for a SPARK_GRAFT_BENCH_ONLY run) works on both
    assert(OracleTotals.stringList(totals, "subset").isEmpty)
  }

  test("field reads exponent scalars, strings and booleans whole") {
    assert(OracleTotals.field(totals, "group1_total").map(_.toDouble)
      .contains(27.5))
    // an exponent-form scalar total must come back as the WHOLE token,
    // not truncated at the 'e'
    assert(OracleTotals.field(totals, "group2_total").map(_.toDouble)
      .contains(1e-05))
    assert(OracleTotals.field(totals, "sf")
      .contains("\"/root/testdata/sf0.1\""))
    assert(OracleTotals.field(totals, "complete").contains("true"))
    assert(OracleTotals.field(totals, "absent").isEmpty)
  }
}
