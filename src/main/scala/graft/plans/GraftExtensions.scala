package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` hook registering the library's custom planner
  * pieces — the deployment-grade alternative to the runtime
  * `experimental.extraStrategies` injection in [[TopK.perGroup]] (which
  * remains as a fallback for sessions not built through this hook).
  *
  * Wire it either way:
  *   - `GraftSession.builder(...)` applies it via `withExtensions`;
  *   - external apps set `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => GraftStrategies)
}
