package graft.dsl

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON <-> IR codec for the query DSL.
  *
  * Accepts the reference's exact JSON shape (claude.md:96-144,
  * example_queries.json): `{"select": ["day", {"SUM": "bid_price"}],
  * "from": "events", "where": [{"col": ..., "op": ..., "val": ...}],
  * "group_by": [...], "order_by": [{"col": ..., "dir": "desc"}],
  * "limit": n}`. Parse errors are loud ([[DslParseException]]), unlike the
  * reference which KeyErrors at execution depth.
  */
object QueryJson {
  import QueryIR._

  final class DslParseException(msg: String) extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw new DslParseException(msg)

  private def toLit(v: JValue): Lit = v match {
    case JString(s) => SLit(s)
    case JInt(i) => ILit(i.toLong)
    case JLong(l) => ILit(l)
    case JDouble(d) => DLit(d)
    case JDecimal(d) => DLit(d.toDouble)
    case JBool(b) => BLit(b)
    case JNull => NullLit
    case other => fail(s"unsupported literal: $other")
  }

  private def parseSelectItem(v: JValue): SelectItem = v match {
    case JString(name) => ColItem(name)
    case JObject(List((fnName, arg))) =>
      val fn = AggFn.parse(fnName).getOrElse(fail(s"unknown aggregate: $fnName"))
      val argName = arg match {
        case JString(s) => s
        case other => fail(s"aggregate arg must be a string, got $other")
      }
      if (argName == "*" && fn != Count) fail(s"$fnName(*) is not valid")
      AggItem(fn, argName)
    case other => fail(s"unsupported select item: $other")
  }

  /** Predicate tree: `{"or": [p, ...]}`, `{"and": [p, ...]}`,
    * `{"not": p}`, or a leaf condition object. A strict extension of the
    * reference DSL (which forbids nested conditions, claude.md:124);
    * queries using it are compiled but never rollup-routed. */
  private def parsePred(v: JValue): Pred = v match {
    case obj: JObject =>
      (obj \ "or", obj \ "and", obj \ "not") match {
        case (JArray(ps), JNothing, JNothing) =>
          if (ps.isEmpty) fail("'or' needs at least 1 predicate")
          OrPred(ps.map(parsePred))
        case (JNothing, JArray(ps), JNothing) =>
          if (ps.isEmpty) fail("'and' needs at least 1 predicate")
          AndPred(ps.map(parsePred))
        case (JNothing, JNothing, p: JObject) => NotPred(parsePred(p))
        case (JNothing, JNothing, JNothing) => parseCond(obj)
        case _ => fail(s"predicate must be one of or/and/not/condition: $obj")
      }
    case other => fail(s"predicate must be an object: $other")
  }

  private def parseCond(v: JValue): Cond = v match {
    case obj: JObject =>
      val col = (obj \ "col") match {
        case JString(s) => s
        case _ => fail(s"condition missing 'col': $obj")
      }
      val op = (obj \ "op") match {
        case JString(s) => CmpOp.parse(s).getOrElse(fail(s"unknown op: $s"))
        case _ => fail(s"condition missing 'op': $obj")
      }
      val values = (obj \ "val") match {
        case JArray(vs) => vs.map(toLit)
        case JNothing => fail(s"condition missing 'val': $obj")
        case single => Seq(toLit(single))
      }
      op match {
        case Between if values.size != 2 =>
          fail(s"between needs exactly 2 values, got ${values.size}")
        case In if values.isEmpty => fail("in needs at least 1 value")
        case Between | In => ()
        case _ if values.size != 1 =>
          fail(s"$op needs exactly 1 value, got ${values.size}")
        case _ => ()
      }
      Cond(col, op, values)
    case other => fail(s"condition must be an object: $other")
  }

  private def parseOrderKey(v: JValue): OrderKey = v match {
    case obj: JObject =>
      val col = (obj \ "col") match {
        case JString(s) => s
        case _ => fail(s"order_by entry missing 'col': $obj")
      }
      val desc = (obj \ "dir") match {
        case JString(d) => d.toLowerCase match {
          case "desc" | "descending" => true
          case "asc" | "ascending" => false
          case other => fail(s"unknown sort dir: $other")
        }
        case JNothing => false
        case other => fail(s"'dir' must be a string: $other")
      }
      OrderKey(col, desc)
    // bare-string form {"order_by": ["minute"]} tolerated for convenience
    case JString(s) => OrderKey(s, desc = false)
    case other => fail(s"unsupported order_by entry: $other")
  }

  def fromJValue(j: JValue): Query = j match {
    case obj: JObject =>
      val select = (obj \ "select") match {
        case JArray(items) if items.nonEmpty => items.map(parseSelectItem)
        case _ => fail("query needs a non-empty 'select' array")
      }
      val from = (obj \ "from") match {
        case JString(s) => s
        case JNothing => "events" // the reference's only table (claude.md:107)
        case other => fail(s"'from' must be a string: $other")
      }
      val where = (obj \ "where") match {
        case JArray(cs) => cs.map(parsePred)
        case JNothing => Nil
        case other => fail(s"'where' must be an array: $other")
      }
      val groupBy = (obj \ "group_by") match {
        case JArray(gs) => gs.map {
          case JString(s) => s
          case other => fail(s"group_by entry must be a string: $other")
        }
        case JNothing => Nil
        case other => fail(s"'group_by' must be an array: $other")
      }
      val orderBy = (obj \ "order_by") match {
        case JArray(os) => os.map(parseOrderKey)
        case JNothing => Nil
        case other => fail(s"'order_by' must be an array: $other")
      }
      val limit = (obj \ "limit") match {
        case JInt(n) => Some(n.toInt)
        case JLong(n) => Some(n.toInt)
        case JNothing => None
        case other => fail(s"'limit' must be an integer: $other")
      }
      Query(select, from, where, groupBy, orderBy, limit)
    case other => fail(s"query must be a JSON object: $other")
  }

  def parse(json: String): Query = fromJValue(JsonMethods.parse(json))

  /** Parse a JSON array of queries (the main.py submission format). */
  def parseMany(json: String): Seq[Query] = JsonMethods.parse(json) match {
    case JArray(qs) => qs.map(fromJValue)
    case single: JObject => Seq(fromJValue(single))
    case other => fail(s"expected array of queries: $other")
  }
}
