package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Guards against Catalyst's CollapseProject inlining expensive array
  * expressions into consumers.
  *
  * Background: higher-order functions (transform/aggregate/filter) are
  * interpreted, and a non-attribute child expression inside a lambda body
  * is RE-EVALUATED once per lambda element. If a staged array column gets
  * collapsed into its consumer (CollapseProject inlines aliases referenced
  * at most once), an O(n) array build inside an O(n) lambda becomes
  * O(n^2) per row — measured 8-40x slowdowns on the dedup pipelines.
  *
  * `bound(arr)(f)` references `arr` twice (a trivially-true guard plus the
  * real use), which keeps the producing Project intact so `f` sees a bound
  * attribute and the array is built exactly once per row.
  */
object Staging {
  def bound(arr: Column)(f: Column => Column): Column =
    when(size(arr) >= 0, f(arr))
}
