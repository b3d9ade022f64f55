package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank on a symmetric 2-cycle converges to uniform") {
    val edges = Seq((0L, 1L, 1L), (1L, 0L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(0L, 1L).toDF("node")
    val pr = Graph.pageRank(edges, nodes, iters = 8)
      .as[(Long, Double)].collect().toMap
    assert(pr(0L) === 0.5)
    assert(pr(1L) === 0.5)
  }

  test("pagerank weights split proportionally and respect damping") {
    // 0 -> 1 (w=3), 0 -> 2 (w=1); 1,2 -> 0. One iteration from uniform:
    // node1 inflow = (1/3)*(3/4); node2 inflow = (1/3)*(1/4)
    val edges = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val base = 0.15 / 3
    val third = 1.0 / 3
    val pr1 = Graph.pageRank(edges, nodes, iters = 1)
      .as[(Long, Double)].collect().toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pr1(1L) === r6(base + 0.85 * (third * 3 / 4)))
    assert(pr1(2L) === r6(base + 0.85 * (third * 1 / 4)))
    assert(pr1(0L) === r6(base + 0.85 * (third + third)))
  }

  test("dangling nodes leak mass (documented simple formulation)") {
    // 0 -> 1, 1 has no out-edges: total mass shrinks below 1
    val edges = Seq((0L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(0L, 1L).toDF("node")
    val pr = Graph.pageRank(edges, nodes, iters = 8)
      .as[(Long, Double)].collect().toMap
    assert(pr.values.sum < 1.0)
    assert(pr(1L) > pr(0L)) // 1 receives, 0 only emits
  }

  test("pagerank is deterministic across partitionings") {
    val edges = (0L until 40L).map(i => (i % 8, (i * 3) % 8, 1L + i % 5))
      .toDF("src", "dst", "w")
    val nodes = (0L until 8L).toDF("node")
    val a = Graph.pageRank(edges, nodes, iters = 6)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.repartition(7), nodes.repartition(3), iters = 6)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
