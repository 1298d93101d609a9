package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components resolve to their min ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain needs >1 round and still converges") {
    // path 1-2-3-...-9: min label must walk the whole diameter
    val chain = (1L until 9L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 9)
  }

  test("direction and duplicates don't matter") {
    val got = components(Seq((5L, 2L), (2L, 5L), (5L, 2L), (7L, 5L)))
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L))
  }

  test("componentSummary counts members per keeper") {
    val comp = Graph.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"))
    val got = Graph.componentSummary(comp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 10L -> 2L))
  }

  test("cycle terminates (converges despite the loop)") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("distributed path (localThreshold=0) matches the local path") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L)).toDF("a", "b")
    val local = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.connectedComponents(edges, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local)
    assert(dist(9L) == 4L) // the 6-hop chain fully resolved
  }

  test("triangles enumerates each triangle once; chains have none") {
    // K4 on {1,2,3,4} (4 triangles) + a chain 5-6-7 (0 triangles) +
    // messy input: self-loop, duplicate, reversed orientation
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L), (2L, 2L), (1L, 2L), // noise: reversed dup, self-loop, dup
      (5L, 6L), (6L, 7L)).toDF("a", "b")
    val tri = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val deg = Graph.degrees(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 2L, 7L -> 1L))
  }

  test("pointer jumping resolves a 64-node chain well under diameter rounds") {
    // plain min-propagation needs 63 rounds; with the interleaved
    // label←label's-label jump, convergence is O(log diameter) — maxIter=12
    // fails without jumping and passes with it
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.connectedComponents(chain, localThreshold = 0L, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    assert(got.values.toSet == Set(1L))
  }

  test("pageRankFixed: local and distributed paths are bit-identical; hubs rank higher") {
    // star (1 hub, 4 spokes) plus a detached pair
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (8L, 9L)).toDF("a", "b")
    val local = Graph.pageRankFixed(pairs, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.pageRankFixed(pairs, iters = 6, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist) // same integer recurrence on both paths
    assert(local(1L) > local(2L)) // the hub dominates its spokes
    assert(Set(2L, 3L, 4L, 5L).map(local).size == 1) // symmetric spokes tie
    assert(local(8L) == local(9L))
  }
}
