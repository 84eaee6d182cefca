package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.Shim

/** The `spark.sql.extensions` entry point must inject exactly the objects
  * the running-session path (`GraftSession.registerPlanExtensions`)
  * registers — proving the two deployment wirings interchangeable.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the as-of strategy and pushdown rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = Shim.builtPlannerStrategies(ext, spark)
    val rules = Shim.builtOptimizerRules(ext, spark)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
    assert(rules.contains(graft.plans.PushFilterThroughAsOfJoin))
    // the singletons are the very objects the experimental path registers,
    // so every AsOfJoinSpec behavior transfers to an extensions-built session
    assert(strategies.size == 1 && rules.size == 1)
  }
}
