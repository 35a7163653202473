package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dsl.QueryIR._
import graft.dsl.QueryJson

/** Pure (no Spark) tests for the JSON DSL front-end. */
class DslSpec extends AnyFunSuite {

  test("parses the reference's flagship query shape") {
    val q = QueryJson.parse(
      """{"select":["day",{"SUM":"bid_price"}],"from":"events",
         "where":[{"col":"type","op":"eq","val":"impression"}],
         "group_by":["day"]}""")
    assert(q.select == Seq(ColItem("day"), AggItem(Sum, "bid_price")))
    assert(q.where == Seq(Cond("type", Eq, Seq(SLit("impression")))))
    assert(q.groupBy == Seq("day"))
    assert(q.aggregates.head.outputName == "sum(bid_price)")
  }

  test("parses between with two values, in with many, order dirs, limit") {
    val q = QueryJson.parse(
      """{"select":["publisher_id",{"COUNT":"*"}],"from":"events",
         "where":[{"col":"day","op":"between","val":["2024-10-20","2024-10-23"]},
                  {"col":"country","op":"in","val":["JP","US","DE"]}],
         "group_by":["publisher_id"],
         "order_by":[{"col":"COUNT(*)","dir":"desc"},{"col":"publisher_id"}],
         "limit": 7}""")
    val Seq(c0: Cond, c1: Cond) = q.where
    assert(c0.op == Between && c0.values.size == 2)
    assert(c1.op == In && c1.values.size == 3)
    assert(q.orderBy == Seq(OrderKey("COUNT(*)", desc = true),
      OrderKey("publisher_id", desc = false)))
    assert(q.limit.contains(7))
  }

  test("defaults: from=events, empty where/group/order, no limit") {
    val q = QueryJson.parse("""{"select":[{"COUNT":"*"}]}""")
    assert(q.from == "events" && q.where.isEmpty && q.groupBy.isEmpty)
    assert(q.limit.isEmpty)
  }

  test("rejects malformed queries loudly") {
    def bad(json: String) =
      intercept[QueryJson.DslParseException](QueryJson.parse(json))
    bad("""{"select":[]}""")
    bad("""{"select":[{"FROB":"x"}]}""")                      // unknown agg
    bad("""{"select":[{"SUM":"*"}]}""")                       // SUM(*)
    bad("""{"select":["a"],"where":[{"col":"c","op":"frob","val":1}]}""")
    bad("""{"select":["a"],"where":[{"col":"c","op":"between","val":[1]}]}""")
    bad("""{"select":["a"],"order_by":[{"col":"a","dir":"sideways"}]}""")
  }

  test("parses OR/AND/NOT predicate trees; canonical key distinguishes them") {
    val q = QueryJson.parse(
      """{"select":[{"COUNT":"*"}],"from":"events",
         "where":[{"or":[{"col":"t","op":"eq","val":"a"},
                         {"not":{"col":"v","op":"lt","val":5}}]}]}""")
    val Seq(OrPred(Seq(c: Cond, NotPred(n: Cond)))) = q.where
    assert(c == Cond("t", Eq, Seq(SLit("a"))) && n.op == Lt)
    val qAnd = QueryJson.parse(
      """{"select":[{"COUNT":"*"}],"from":"events",
         "where":[{"and":[{"col":"t","op":"eq","val":"a"},
                          {"col":"v","op":"lt","val":5}]}]}""")
    assert(q.canonicalKey != qAnd.canonicalKey)
    // a mixed or+and object is ambiguous -> loud failure
    intercept[QueryJson.DslParseException](QueryJson.parse(
      """{"select":["a"],"where":[{"or":[{"col":"c","op":"eq","val":1}],
                                   "and":[{"col":"c","op":"eq","val":1}]}]}"""))
    intercept[QueryJson.DslParseException](QueryJson.parse(
      """{"select":["a"],"where":[{"or":[]}]}"""))
  }

  test("canonical key is stable and value-sensitive") {
    def q(v: Int) = QueryJson.parse(
      s"""{"select":[{"COUNT":"*"}],"where":[{"col":"x","op":"eq","val":$v}]}""")
    assert(q(1).canonicalKey == q(1).canonicalKey)
    assert(q(1).canonicalKey != q(2).canonicalKey)
  }
}
