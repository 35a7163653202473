package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point — the idiomatic install route for
  * the engine's Catalyst extensions:
  *
  * {{{
  *   spark.sql.extensions=graft.catalyst.GraftExtensions
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Injects [[AggRewriteRule]] into the optimizer; the rule stays inert
  * until [[AggRewriteRule.configure]] points it at a prepared layout
  * (extensions are applied at session build time, before any layout
  * exists — the per-session registry bridges that gap).
  * [[AggRewriteRule.install]] remains available for sessions built
  * without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule { session =>
      val reg = AggRewriteRule.registryFor(session)
      AggRewriteRule(session,
        () => reg.factPath, () => reg.defs,
        name => reg.rollupLoader(name))
    }
  }
}
