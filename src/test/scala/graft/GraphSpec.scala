package graft

import graft.llm.Graph
import org.apache.spark.sql.functions._

/** Integer PageRank: exact parity with an independent driver-side
  * reference fold, structural properties (symmetry, hub dominance,
  * dangling redistribution), and the registry rows end-to-end. */
class GraphSpec extends SparkSpec {

  private def edgesDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  /** Independent reference implementation: a plain driver-side fold
    * over Maps, written against the SPEC in Graph's Scaladoc (not the
    * DataFrame code), so agreement means the distributed plan computes
    * the documented recurrence and not merely itself. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(r).sum
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((a, b) <- edges) s(b) += r(a) / outdeg(a)
      r = nodes.map(nd =>
        nd -> (Graph.Teleport + (85L * (s(nd) + dm / n)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = Graph.Iters): Map[Long, Long] =
    Graph.pagerank(edgesDf(edges), iters).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pagerank matches the independent integer reference exactly (cycle + feeder + dangling node)") {
    // 1↔3 cycle through 2, node 4 feeds in (in-degree 0), node 5 only
    // receives (dangling — exercises the redistribution term).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    assert(run(edges) === refPagerank(edges, Graph.Iters))
  }

  test("pagerank on a 4-clique is uniform (symmetry is preserved bit-for-bit)") {
    val nodes = 0L to 3L
    val edges = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val ranks = run(edges).values.toSet
    assert(ranks.size === 1, s"clique ranks diverged: $ranks")
  }

  test("pagerank ranks a star hub above its leaves, leaves uniform") {
    val edges = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L)))
    val ranks = run(edges)
    assert((1L to 5L).map(ranks).toSet.size === 1, "leaves diverged")
    assert(ranks(0L) > ranks(1L), "hub not ranked above leaves")
  }

  test("total mass is conserved up to floor loss (never created)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    val ranks = run(edges)
    val total = ranks.values.sum
    val mass0 = ranks.size * Graph.Scale
    assert(total <= mass0, "rank mass was created")
    // Each round floors at most (edges + nodes + 1) unit-sized losses of
    // the recycled 85% — mass can only bleed slowly.
    assert(total > mass0 * 9L / 10L, s"implausible mass loss: $total of $mass0")
  }

  test("graph_pagerank registry row: supplier side is pure dangling mass, customers hold rank (sf0.001)") {
    val out = Graph.queries("graph_pagerank")(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(1))
    assert(byType.keySet === Set("cust", "supp"))
    // Suppliers receive rank (customers point at them) — every supplier
    // rank strictly above the bare teleport floor.
    assert(byType("supp").forall(_.getLong(3) > Graph.Teleport))
  }

  test("graph_pagerank_knn registry row covers every vector exactly once (sf0.001)") {
    val out = Graph.queries("graph_pagerank_knn")(spark, sf0001)
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.count() === n)
    assert(out.select(countDistinct(col("vec_id"))).collect()(0).getLong(0) === n)
  }
}
