package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Level-synchronous BFS: hop minimality, cycle termination, multi-seed
  * union semantics, the maxHops bound, and unreachable-node exclusion —
  * the contracts the WITH RECURSIVE oracle of `graph_reach` relies on.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) =
    Materialize.scoped {
      Graph.bfs(edges.toDF("u", "v"), seeds.toDF("node"), maxHops)
        .as[(Long, Int)].collect().toMap
    }

  test("chain graph: hops equal path length, bound truncates") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(dists(chain, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(dists(chain, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("cycle terminates and keeps first-discovery distance") {
    // 1→2→3→1 cycle plus a tail; UNION-distinct recursion in the oracle
    // terminates the same way: no (node, hops) pair repeats
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 9L)
    assert(dists(g, Seq(1L), 10) === Map(1L -> 0, 2L -> 1, 3L -> 2, 9L -> 3))
  }

  test("diamond takes the shorter arm") {
    val g = Seq(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 5L, 5L -> 4L)
    assert(dists(g, Seq(1L), 10)(4L) === 2)
  }

  test("multi-seed: distance is min over seeds; unreachable excluded") {
    val g = Seq(1L -> 2L, 2L -> 3L, 10L -> 3L, 50L -> 60L)
    val d = dists(g, Seq(1L, 10L), 10)
    assert(d === Map(1L -> 0, 10L -> 0, 2L -> 1, 3L -> 1))
    assert(!d.contains(60L)) // reachable only from 50, not a seed
  }

  test("seed-only graph with no outgoing edges returns the seed at 0") {
    assert(dists(Seq(7L -> 8L), Seq(99L), 5) === Map(99L -> 0))
  }

  test("graph_reach matches a driver-style replay of its own oracle shape") {
    // semantic pin at tiny SF: recompute min-hop distances with a plain
    // iterative loop over collected edges (small here) and compare
    val q = SparkEntry.queries("graph_reach")(spark, sfTiny)
    val got = q.as[(Long, Int)].collect().toMap

    val li = Tables.lineitem(spark, sfTiny)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
      .as[(Long, Int, Long)].collect()
    val byOrder = li.groupBy(_._1)
    val adj = byOrder.values.flatMap { lines =>
      // (orderkey, linenumber) is NOT unique in the synthetic data — the
      // adjacency is a multimap join, all pairs across consecutive lines
      val byLn = lines.groupBy(_._2).map { case (ln, ls) => ln -> ls.map(_._3).toSeq }
      byLn.toSeq.flatMap { case (ln, ps) =>
        val nxt = byLn.getOrElse(ln + 1, Seq.empty[Long])
        for (p <- ps; p2 <- nxt if p2 != p) yield (p, p2)
      }
    }.toSeq
    val und = (adj ++ adj.map(_.swap)).distinct
    val nbrs = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seed = li.map(_._3).min
    var dist = Map(seed -> 0)
    var frontier = Set(seed)
    for (hop <- 1 to 4) {
      val nxt = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty)) -- dist.keySet
      nxt.foreach(n => dist += n -> hop)
      frontier = nxt
    }
    assert(got === dist)
  }
}
