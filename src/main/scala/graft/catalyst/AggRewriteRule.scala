package graft.catalyst

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.types._

import graft.engine.AggTableDef

/** Catalyst materialized-view rewrite: `Aggregate(Filter(Scan(events)))`
  * over the fact table is rewritten onto a pre-computed rollup table when
  * the containment proof holds.
  *
  * This is the idiomatic-Catalyst restatement of the reference's
  * "query planner" (its five hard-coded dict matchers,
  * query_engine.py:73-232) — but at the *logical plan* level, so it fires
  * for ANY front-end (our DSL, spark.sql, raw DataFrame code), not just
  * queries phrased through the engine. OSS Spark has no built-in
  * materialized-view rewriting; this rule adds it via
  * `SparkSessionExtensions.injectOptimizerRule`.
  *
  * Soundness: the rewrite fires only when
  *  1. the aggregate's child is (Filter over)? the registered fact
  *     relation (identified by its file-source root path);
  *  2. every filter conjunct is `attr op literal` on a rollup key, or is
  *     exactly a conjunct of the rollup's own build filter;
  *  3. grouping keys are a subset of rollup keys;
  *  4. every aggregate is SUM/MIN/MAX/AVG/COUNT over a rollup measure (or
  *     COUNT(*)/COUNT(1)), rewritten by the standard partial-aggregate
  *     algebra (SUM->SUM of partial sums, COUNT->SUM of partial counts,
  *     AVG->SUM/SUM, MIN/MAX->MIN/MAX of partial bounds).
  * Anything else leaves the plan untouched. This containment check is the
  * fix for the reference's filter-dropping matchers (SURVEY §4.3 #2-3).
  */
case class AggRewriteRule(
    spark: SparkSession,
    factPath: () => Option[String],
    defs: () => Seq[AggTableDef],
    rollup: String => DataFrame) extends Rule[LogicalPlan] {

  /** Count of successful rewrites (for tests/inspection). */
  @volatile var fired: Long = 0

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val path = factPath().getOrElse(return plan)
    plan.transformDown {
      case agg: Aggregate =>
        tryRewrite(agg, path).getOrElse(agg)
    }
  }

  // ----------------------------------------------------------- matching

  private def isFactScan(plan: LogicalPlan, path: String): Boolean = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.exists(_.toString.stripSuffix("/").endsWith(path.stripSuffix("/")))
    case _ => false
  }

  /** Decompose the aggregate's child into (conjuncts, fact scan output). */
  private def childFilters(plan: LogicalPlan, path: String)
      : Option[Seq[Expression]] = plan match {
    case Filter(cond, child) =>
      childFilters(child, path).map(splitConjuncts(cond) ++ _)
    case SubqueryAlias(_, child) => childFilters(child, path)
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      childFilters(child, path)
    case rel if isFactScan(rel, path) => Some(Nil)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A filter conjunct usable on the rollup: attr op literal over column
    * `name`. Returns (columnName, rebuild: Expression => Expression) where
    * rebuild re-roots the predicate onto a new attribute. */
  private def usableConjunct(e: Expression): Option[(String, Attribute => Expression)] = {
    def lift(attr: AttributeReference, f: Attribute => Expression) =
      Some((attr.name.toLowerCase, f))
    e match {
      case EqualTo(a: AttributeReference, l: Literal) => lift(a, EqualTo(_, l))
      case EqualTo(l: Literal, a: AttributeReference) => lift(a, EqualTo(l, _))
      case Not(EqualTo(a: AttributeReference, l: Literal)) => lift(a, x => Not(EqualTo(x, l)))
      case GreaterThan(a: AttributeReference, l: Literal) => lift(a, GreaterThan(_, l))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => lift(a, GreaterThanOrEqual(_, l))
      case LessThan(a: AttributeReference, l: Literal) => lift(a, LessThan(_, l))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => lift(a, LessThanOrEqual(_, l))
      case GreaterThan(l: Literal, a: AttributeReference) => lift(a, LessThan(_, l))
      case LessThan(l: Literal, a: AttributeReference) => lift(a, GreaterThan(_, l))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        lift(a, In(_, vs))
      case InSet(a: AttributeReference, vs) => lift(a, InSet(_, vs))
      case IsNotNull(a: AttributeReference) => lift(a, IsNotNull(_))
      case _ => None
    }
  }

  /** Rewrite one aggregate function call onto rollup partial columns. */
  private def rewriteAggFn(fn: AggregateFunction, d: AggTableDef,
                           attrOf: String => Option[Attribute]): Option[Expression] = {
    def measureName(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if d.measures.exists(_.equalsIgnoreCase(a.name)) => Some(
        d.measures.find(_.equalsIgnoreCase(a.name)).get)
      case Cast(a: AttributeReference, _, _, _)
          if d.measures.exists(_.equalsIgnoreCase(a.name)) => Some(
        d.measures.find(_.equalsIgnoreCase(a.name)).get)
      case _ => None
    }
    def sumOf(c: String, resultType: Option[DataType] = None): Option[Expression] =
      attrOf(c).map { a =>
        val s = Sum(a).toAggregateExpression()
        resultType.filter(_ != s.dataType).map(Cast(s, _)).getOrElse(s)
      }
    // COUNT -> SUM(partial counts) must coalesce to 0: SUM over an empty
    // selection is NULL, COUNT over an empty scan is 0
    def countOf(c: String): Option[Expression] =
      sumOf(c, Some(LongType)).map(s => Coalesce(Seq(s, Literal(0L, LongType))))
    fn match {
      case Count(Seq(Literal(_, _))) | Count(Nil) => countOf(d.cntStar)
      case Count(Seq(e)) => measureName(e).flatMap(m => countOf(d.cntCol(m)))
      case s @ Sum(e, _) => measureName(e).flatMap(m => sumOf(d.sumCol(m), Some(s.dataType)))
      case a @ Average(e, _) =>
        measureName(e).flatMap { m =>
          for (sc <- attrOf(d.sumCol(m)); cc <- attrOf(d.cntCol(m))) yield {
            val div = Divide(
              Cast(Sum(sc).toAggregateExpression(), DoubleType),
              Cast(Sum(cc).toAggregateExpression(), DoubleType))
            if (a.dataType != DoubleType) Cast(div, a.dataType) else div
          }
        }
      case Min(e) => measureName(e).flatMap(m => attrOf(d.minCol(m)).map(x =>
        Min(x).toAggregateExpression()))
      case Max(e) => measureName(e).flatMap(m => attrOf(d.maxCol(m)).map(x =>
        Max(x).toAggregateExpression()))
      case _ => None
    }
  }

  private def tryRewrite(agg: Aggregate, path: String): Option[LogicalPlan] = {
    val conjuncts = childFilters(agg.child, path).getOrElse(return None)

    // groupings must be plain attributes
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }

    defs().iterator.flatMap { d =>
      rewriteOnto(agg, d, conjuncts, groupNames)
    }.nextOption()
  }

  private def rewriteOnto(agg: Aggregate, d: AggTableDef,
                          conjuncts: Seq[Expression],
                          groupNames: Seq[String]): Option[LogicalPlan] = {
    val keySet = d.keys.map(_.toLowerCase).toSet
    if (d.filter.nonEmpty) return None // only unfiltered rollups at plan level
    if (!groupNames.forall(g => keySet.contains(g.toLowerCase))) return None

    // every conjunct must be attr-op-literal on a rollup key
    val usable = conjuncts.map(c => usableConjunct(c) match {
      case Some((name, rebuild)) if keySet.contains(name) => (name, rebuild)
      case _ => return None
    })

    // every aggregate expression: grouping attr passthrough or agg call
    val rollupDf = rollup(d.name)
    val rollupPlan = rollupDf.queryExecution.analyzed
    def attrOf(name: String): Option[Attribute] =
      rollupPlan.output.find(_.name.equalsIgnoreCase(name))

    val rewrittenAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        attrOf(a.name).map(n => Alias(n, a.name)(exprId = a.exprId))
          .getOrElse(return None)
      // isDistinct=false and filter=None only: COUNT(DISTINCT m) and
      // `agg FILTER (WHERE ...)` cannot be answered from rollup partials
      // (partial sums lose per-row distinctness / the filter predicate),
      // so they must fall through to the scan path untouched.
      case al @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
        rewriteAggFn(fn, d, attrOf)
          .map(e => Alias(e, name)(exprId = al.exprId))
          .getOrElse(return None)
      case al @ Alias(Cast(AggregateExpression(fn, _, false, None, _), dt, tz, ansi), name) =>
        rewriteAggFn(fn, d, attrOf)
          .map(e => Alias(Cast(e, dt, tz, ansi), name)(exprId = al.exprId))
          .getOrElse(return None)
      case _ => return None
    }

    // filters re-rooted onto rollup attributes
    val rebuiltFilter = usable
      .map { case (name, rebuild) => rebuild(attrOf(name).getOrElse(return None)) }
      .reduceOption(And)
    val filtered = rebuiltFilter.map(Filter(_, rollupPlan)).getOrElse(rollupPlan)

    val newGroupings = groupNames.map(g => attrOf(g).getOrElse(return None))
    fired += 1
    Some(Aggregate(newGroupings, rewrittenAggs, filtered))
  }
}

object AggRewriteRule {

  /** Mutable per-session registry the injected rule reads (extensions are
    * installed at session build time, before any layout exists). */
  final class Registry {
    @volatile var factPath: Option[String] = None
    @volatile var defs: Seq[AggTableDef] = Nil
    @volatile var rollupLoader: String => DataFrame = null
  }

  private val registries = new java.util.concurrent.ConcurrentHashMap[SparkSession, Registry]()

  def registryFor(spark: SparkSession): Registry =
    registries.computeIfAbsent(spark, _ => new Registry)

  /** Install the rule on an existing session (experimental-methods route —
    * equivalent to SparkSessionExtensions.injectOptimizerRule but usable
    * after session construction). Idempotent. */
  def install(spark: SparkSession): AggRewriteRule = {
    val reg = registryFor(spark)
    val existing = spark.experimental.extraOptimizations
      .collectFirst { case r: AggRewriteRule => r }
    existing.getOrElse {
      val rule = AggRewriteRule(spark,
        () => reg.factPath, () => reg.defs, name => reg.rollupLoader(name))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
      rule
    }
  }

  /** Point the rule at a prepared layout. */
  def configure(spark: SparkSession, factPath: String,
                defs: Seq[AggTableDef], loader: String => DataFrame): AggRewriteRule = {
    val rule = install(spark)
    val reg = registryFor(spark)
    reg.factPath = Some(factPath)
    reg.defs = defs
    reg.rollupLoader = loader
    rule
  }
}
