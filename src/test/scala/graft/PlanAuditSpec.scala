package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical plan audit over the ENTIRE query surface: every SparkEntry
  * query must (1) construct and plan, and (2) contain no CartesianProduct
  * node. A cartesian product is the one plan shape that can never survive a
  * 100× scale-up; broadcast nested-loop joins with a k-bounded broadcast
  * side (the brute-force ANN contract, scalar-subquery cross joins) are
  * allowed — Spark plans those as BroadcastNestedLoopJoin, not
  * CartesianProduct, so the assertion distinguishes them for free.
  *
  * Runs at sf0.001 so driver-side model fitting inside query construction
  * (k-means, codebooks, OPQ) stays cheap; planning never executes the
  * final job itself. GenPlans documents the full formatted plans at
  * sf0.01; this spec is the structurally-enforced subset that `sbt test`
  * re-checks on every change. */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query plans without a CartesianProduct") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("simple"))
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
      } catch {
        case e: Throwable =>
          failures += s"$name: failed to plan — ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}"
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
