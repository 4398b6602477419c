package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal

/** The config-driven wiring path (`spark.sql.extensions=
  * graft.GraftExtensions`): the injector must register every native
  * function and the TopKPerKey planner strategy. The session-build
  * hook itself is Spark's (static conf, applied at SparkContext
  * construction — not reachable from a shared-context test JVM), so
  * this spec drives the `private[sql]` SparkSessionExtensions build
  * surface the hook calls — hence the test-only org.apache.spark.sql
  * package. */
class GraftExtensionsSpec extends graft.SparkSpec {

  private def injected(): SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    ext
  }

  test("injector registers all native functions with working builders") {
    val registry = injected().registerFunctions(new SimpleFunctionRegistry)
    val names = Seq("graft_fingerprint64", "graft_cosine",
      "graft_sorted_intersect", "graft_auc")
    names.foreach { n =>
      assert(registry.functionExists(FunctionIdentifier(n)), n)
    }
    // builder sanity: constructs an evaluable expression tree that
    // agrees with the imperatively-registered session function
    val fp = registry.lookupFunctionBuilder(FunctionIdentifier("graft_fingerprint64"))
      .get(Seq(Literal.create("graft")))
    graft.functions.GraftFunctions.register(spark)
    val want = spark.sql("SELECT graft_fingerprint64('graft')").head.getLong(0)
    assert(fp.eval(null) == want)
  }

  test("injector provides the TopKPerKey planner strategy") {
    val strategies = injected().buildPlannerStrategies(spark)
    assert(strategies.contains(graft.plans.TopKPerKeyStrategy))
  }
}
