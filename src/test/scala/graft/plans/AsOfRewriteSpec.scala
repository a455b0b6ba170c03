package graft.plans

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The union+window → native-as-of optimizer rule (AsOfRewriteRule):
  * fires on q12's idiom, preserves results exactly, and can be switched
  * off. q12b (the direct native API) pins the target operator
  * independently of the rule. */
class AsOfRewriteSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def q12 = SparkEntry.queries("q12_asof_join")(spark, dir)

  test("the rewrite replaces the window idiom with the native merge operator") {
    val analyzed = q12.queryExecution.analyzed.toString
    assert(analyzed.contains("AsOfJoinPlan"), analyzed.take(600))
    assert(!analyzed.contains("Window"), analyzed.take(600))
    val physical = q12.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical.take(600))
  }

  test("rewrite on and off produce identical rows; the flag restores the window plan") {
    val withRule = q12.collect().toSeq
    spark.conf.set("spark.graft.asofRewrite.enabled", "false")
    try {
      val analyzed = q12.queryExecution.analyzed.toString
      assert(analyzed.contains("Window") && !analyzed.contains("AsOfJoinPlan"),
        analyzed.take(600))
      assert(q12.collect().toSeq == withRule)
    } finally spark.conf.set("spark.graft.asofRewrite.enabled", "true")
  }

  test("rewritten q12 matches the native-API q12b row for row") {
    val viaRule = q12.collect().toSeq
    val native = SparkEntry.queries("q12b_asof_native")(spark, dir).collect().toSeq
    assert(viaRule == native)
  }

  test("AsOfJoinExec participates in whole-stage codegen, and the generated code compiles") {
    val df = q12
    df.collect() // materialize so AQE finalizes the stages
    val planStr = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is Spark's marker for operators inside a
    // WholeStageCodegen stage (AQE nests the stage inside query-stage
    // leaves, so string form is the robust check)
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(planStr).nonEmpty,
      s"AsOfJoinExec not inside a WholeStageCodegen stage:\n${planStr.take(800)}")
    // fallback=false turns a janino compile failure into a hard error
    // instead of a silent drop to the interpreted doExecute — this is
    // the assertion that the GENERATED code is actually valid
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(q12.collect().length == SparkEntry.queries("q12b_asof_native")(spark, dir).collect().length)
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
