package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Unit tests for min-label connected components. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain needs diameter rounds and still converges to the min id") {
    // 5-1-4-2-8: min label 1 must travel 3 hops to reach 8
    val got = components(Seq((5L, 1L), (1L, 4L), (4L, 2L), (2L, 8L)))
    assert(got === Map(5L -> 1L, 1L -> 1L, 4L -> 1L, 2L -> 1L, 8L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("edge direction does not matter") {
    assert(components(Seq((7L, 3L))) === components(Seq((3L, 7L))))
  }

  test("an empty edge list yields an empty labeling (dup-free corpus)") {
    // q_dedup_clusters feeds LSH candidate pairs here; zero candidates
    // must produce the empty frame the oracle produces, not crash
    assert(components(Seq.empty) === Map.empty)
  }

  test("a cycle converges") {
    val got = components(Seq((2L, 3L), (3L, 4L), (4L, 2L)))
    assert(got === Map(2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponentsStar(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction agrees with min-label propagation on a long chain") {
    // a 12-hop path: worst case for propagation (O(d) rounds), the
    // shape star contraction collapses in O(log d)
    val chain = (0L until 12L).map(i => (i, i + 1))
    assert(starComponents(chain) === components(chain))
  }

  test("star contraction: empty edges, disjoint components, self-loops") {
    assert(starComponents(Seq.empty) === Map.empty)
    assert(starComponents(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(starComponents(Seq((7L, 7L))) === Map(7L -> 7L))
  }
}
