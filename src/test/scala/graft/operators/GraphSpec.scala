package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pageRank: star hub dominates leaves, isolated node sits at teleport") {
    // star: 1 is the hub of 2,3,4; 9 is isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    val teleport = 0.15 / 5
    assert(math.abs(r(9L) - teleport) < 1e-15)      // isolated: pure teleport
    assert(r(2L) == r(3L) && r(3L) == r(4L))        // leaves symmetric
    assert(r(1L) > r(2L) * 2)                       // hub dominates
    // no dangling redistribution: total mass < 1 but every rank >= teleport
    assert(r.values.sum <= 1.0 + 1e-12)
    assert(r.values.forall(_ >= teleport - 1e-15))
  }

  test("pageRank: direction of the input pair does not matter (symmetrized)") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val fwd = Graph.pageRank(nodes, Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val rev = Graph.pageRank(nodes, Seq((2L, 1L), (3L, 2L)).toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    assert(fwd == rev)
    // path graph: middle node outranks ends
    assert(fwd(2L) > fwd(1L) && fwd(1L) == fwd(3L))
  }
}
