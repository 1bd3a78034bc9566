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

  /** Seeded twin of [[refPagerank]], written against pagerankSeeded's
    * Scaladoc spec: teleport (15·n·Scale div 100) div n_seeds to seeds
    * only, dangling mass dm div n_seeds to seeds only. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val tShare = (15L * n * Graph.Scale / 100L) / seeds.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(r).sum
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((a, b) <- edges) s(b) += r(a) / outdeg(a)
      r = nodes.map(nd => nd ->
        ((if (seeds(nd)) tShare else 0L) +
          85L * (s(nd) + (if (seeds(nd)) dm / seeds.size else 0L)) / 100L)).toMap
    }
    r
  }

  test("pagerankSeeded matches the independent seeded reference exactly (dangling mass returns to seeds)") {
    // Same hand graph as the uniform test: node 5 is dangling, so its
    // mass must flow back to the seeds {1, 4}, not to everyone.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    val seeds = Set(1L, 4L)
    import spark.implicits._
    val got = Graph.pagerankSeeded(edgesDf(edges),
        seeds.toSeq.toDF("node"), Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPpr(edges, seeds, Graph.Iters))
    // And it genuinely differs from the uniform variant (the seeded
    // teleport is load-bearing, not a no-op rewrite).
    assert(got !== run(edges))
    // ADVICE r12: an ambiguous multi-column seed frame (no 'node'
    // column) must fail fast, not silently read its first column.
    val err = intercept[IllegalArgumentException] {
      Graph.pagerankSeeded(edgesDf(edges),
        Seq((9L, 1L)).toDF("weight", "seed_id"), Graph.Iters)
    }
    assert(err.getMessage.contains("single-column"))
    // A multi-column frame WITH a 'node' column is unambiguous and uses
    // exactly that column regardless of position.
    val byName = Graph.pagerankSeeded(edgesDf(edges),
        seeds.toSeq.map(s => (s * 100, s)).toDF("other", "node"),
        Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byName === got)
  }

  test("graph_ppr registry row: anchors dominate, mass conserved, every node ranked (sf0.001)") {
    val rows = Graph.queries("graph_ppr")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val uniform = Graph.queries("graph_pagerank")(spark, sf0001).count()
    assert(rows.length === uniform.toInt, "node coverage differs from the uniform row")
    val n = rows.length.toLong
    assert(rows.map(_._3).sum <= n * Graph.Scale, "rank mass was created")
    // The ten anchor customers receive the whole teleport budget, so
    // they must sit far above the non-anchor customers that only
    // collect recycled flow.
    val (anchors, rest) = rows.filter(_._2 == "cust")
      .partition(t => t._1 / 2 <= 10)
    assert(anchors.nonEmpty && rest.nonEmpty)
    assert(anchors.map(_._3).min > rest.map(_._3).max,
      "an anchor ranked below a non-anchor customer")
  }

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

  /** Weighted twin of [[refPagerank]], written against
    * pagerankWeighted's Scaladoc spec: outW = Σ w per source, and the
    * contribution is the floor-FIRST product (rank div outW) · w. */
  private def refPagerankWeighted(edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outw = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outw.contains).map(r).sum
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((a, b, w) <- edges) s(b) += r(a) / outw(a) * w
      r = nodes.map(nd =>
        nd -> (Graph.Teleport + (85L * (s(nd) + dm / n)) / 100L)).toMap
    }
    r
  }

  private def runWeighted(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.pagerankWeighted(edges.toDF("src", "dst", "w")).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("pagerankWeighted: unit weights degenerate to the uniform variant exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    assert(runWeighted(edges.map { case (a, b) => (a, b, 1L) }) === run(edges))
  }

  test("pagerankWeighted matches the independent weighted reference; skewed weights shift rank toward the heavy edge") {
    // 1 splits 9:1 between 2 and 3; 2/3 recycle back — the heavy target
    // must outrank the light one, and every value must match the
    // driver-side fold bit-for-bit. Node 5 stays dangling.
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 1L, 2L), (3L, 5L, 1L))
    val got = runWeighted(edges)
    assert(got === refPagerankWeighted(edges, Graph.Iters))
    assert(got(2L) > got(3L),
      "the 9:1 split did not rank the heavy target above the light one")
    // And it genuinely differs from erasing the weights.
    assert(got !== run(edges.map { case (a, b, _) => (a, b) }))
  }

  /** Seeded AND weighted twin of [[refPagerank]], written against the
    * two parents' Scaladoc specs composed: outW = Σ w per source with
    * the floor-FIRST contribution product, teleport/dangling anchored
    * on the seeds. */
  private def refPprWeighted(edges: Seq[(Long, Long, Long)],
      seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val tShare = (15L * n * Graph.Scale / 100L) / seeds.size
    val outw = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var r = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outw.contains).map(r).sum
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((a, b, w) <- edges) s(b) += r(a) / outw(a) * w
      r = nodes.map(nd => nd ->
        ((if (seeds(nd)) tShare else 0L) +
          85L * (s(nd) + (if (seeds(nd)) dm / seeds.size else 0L)) / 100L)).toMap
    }
    r
  }

  test("pagerankSeededWeighted: the two flags COMPOSE — exact match vs the independent seeded-weighted fold, and each flag bites") {
    import spark.implicits._
    // 1 splits 9:1 between 2 and 3, recycling back; node 5 dangling (its
    // mass must return to the seeds {1, 4} only); 4 feeds in weighted 2.
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 1L, 2L), (3L, 5L, 1L))
    val seeds = Set(1L, 4L)
    val got = Graph.pagerankSeededWeighted(
        edges.toDF("src", "dst", "w"), seeds.toSeq.toDF("node"), Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPprWeighted(edges, seeds, Graph.Iters))
    // Dropping EITHER flag changes the answer — the composition is
    // load-bearing, not a pass-through to one parent.
    val seededOnly = Graph.pagerankSeeded(
        edges.map { case (a, b, _) => (a, b) }.toDF("src", "dst"),
        seeds.toSeq.toDF("node"), Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weightedOnly = runWeighted(edges)
    assert(got !== seededOnly, "weights are dead in the composed variant")
    assert(got !== weightedOnly, "seeds are dead in the composed variant")
  }

  test("graph_ppr_weighted registry row: covers the co-purchase node set, anchors hold their teleport share, mass conserved (sf0.001)") {
    val pr = Graph.queries("graph_ppr_weighted")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = Graph.queries("graph_components_copurchase")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(pr.keySet === cc, "node universe differs from the shared edge spelling")
    val n = pr.size.toLong
    assert(pr.values.sum <= n * Graph.Scale, "rank mass was created")
    assert(Graph.lastPagerankBasis === Graph.Scale,
      s"oracle-compared pagerank ran on adapted basis ${Graph.lastPagerankBasis}")
    // The ten smallest node ids are the anchors: each receives its
    // final-round teleport share, so rank >= tShare at every anchor.
    val anchors = pr.keySet.toSeq.sorted.take(10)
    val tShare = (15L * n * Graph.Scale / 100L) / 10L
    anchors.foreach { a =>
      assert(pr(a) >= tShare, s"anchor $a rank ${pr(a)} below its teleport share $tShare")
    }
    // And the composition genuinely differs from both single-flag
    // variants over the same graph (flags bite on the real corpus).
    val base = Graph.copurchaseEdges(spark, sf0001)
    val sym = base.select(col("doc_a").as("src"), col("doc_b").as("dst"),
        col("w"))
      .union(base.select(col("doc_b").as("src"), col("doc_a").as("dst"),
        col("w")))
    import spark.implicits._
    val seedDf = anchors.toDF("node")
    val seededOnly = Graph.pagerankSeeded(sym.select(col("src"), col("dst")),
        seedDf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weightedOnly = Graph.pagerankWeighted(sym).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr !== seededOnly, "weights are dead on the corpus")
    assert(pr !== weightedOnly, "seeds are dead on the corpus")
  }

  /** Driver-side BFS reference: layered expansion over an adjacency
    * map, written against bfsFrom's Scaladoc (min hop, cap, −1). */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupMap(_._1)(_._2)
    var dist = seeds.intersect(nodes.toSet).map(_ -> 0L).toMap
    var frontier = dist.keySet
    var hop = 0L
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(adj.getOrElse(_, Nil)) -- dist.keySet
      dist = dist ++ next.map(_ -> hop)
      frontier = next
    }
    nodes.map(nd => nd -> dist.getOrElse(nd, -1L)).toMap
  }

  test("bfsFrom matches the reference fold: cycle, unreachable component, hop cap, seed rules") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
        cap: Int = Graph.BfsMaxHops): Map[Long, Long] =
      Graph.bfsFrom(edgesDf(edges), seeds.toDF("node"), cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Directed cycle 1→2→3→1 with a feeder 4→1 (4 unreachable FROM 1 —
    // direction respected) and an isolated pair 8→9 (dist −1).
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (8L, 9L))
    assert(run(g, Seq(1L)) === refBfs(g, Set(1L), Graph.BfsMaxHops))
    // Multi-source: min distance wins per node.
    assert(run(g, Seq(1L, 8L)) === refBfs(g, Set(1L, 8L), Graph.BfsMaxHops))
    // Hop cap: a 15-chain from seed 0 reaches node 10 at the cap, 11+ = −1.
    val chain = (0L until 15L).map(i => (i, i + 1))
    val capped = run(chain, Seq(0L))
    assert(capped === refBfs(chain, Set(0L), Graph.BfsMaxHops))
    assert(capped(10L) === 10L && capped(11L) === -1L && capped(15L) === -1L)
    // Seeds outside the edge universe are dropped; an all-outside seed
    // set fails loudly.
    assert(run(g, Seq(1L, 99L)) === refBfs(g, Set(1L), Graph.BfsMaxHops))
    assertThrows[IllegalArgumentException] { run(g, Seq(99L)) }
    // Ambiguous multi-column seed frame fails fast (the pagerankSeeded rule).
    assertThrows[IllegalArgumentException] {
      Graph.bfsFrom(edgesDf(g), Seq((9L, 1L)).toDF("weight", "seed_id"))
    }
  }

  test("bfsFrom materializes only the new layer per round: checkpointed row counts equal layer sizes (VERDICT r15 #4)") {
    import spark.implicits._
    // 15-chain from seed 0 under the default cap 10: eleven layers of
    // exactly one node each. lastBfsLayerSizes records each round's
    // checkpointed row count — frontier-only materialization means the
    // series is the LAYER sizes (Σ = reached count), never the running
    // reached-set size (which would read 1,2,3,… here).
    val chain = (0L until 15L).map(i => (i, i + 1))
    val res = Graph.bfsFrom(edgesDf(chain), Seq(0L).toDF("node")).collect()
    val sizes = Graph.lastBfsLayerSizes
    assert(sizes === Seq.fill(Graph.BfsMaxHops + 1)(1L),
      s"per-round checkpoint sizes $sizes != the per-layer sizes")
    assert(sizes.sum === res.count(_.getLong(1) >= 0L),
      "layer sizes do not sum to the reached count")
    // A branching graph: layer sizes 1, 2, 4 — still layer-shaped.
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (2L, 6L))
    Graph.bfsFrom(edgesDf(tree), Seq(0L).toDF("node")).collect()
    assert(Graph.lastBfsLayerSizes === Seq(1L, 2L, 4L))
  }

  test("graph_bfs_seeds registry row matches a driver-side BFS over the collected co-purchase edges (sf0.001)") {
    val got = Graph.queries("graph_bfs_seeds")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Graph.copurchaseEdges(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges.toSeq ++ edges.toSeq.map(_.swap)
    val seeds = sym.map(_._1).distinct.sorted.take(10).toSet
    assert(got === refBfs(sym, seeds, Graph.BfsMaxHops))
    // Non-vacuous: the corpus must exercise real depth (the −1 sentinel
    // is exercised by the hand-graph test above — the sf0.001
    // co-purchase graph turns out fully reachable from the ten seeds,
    // which is itself the near-giant-component shape the corpus is for).
    assert(got.values.exists(_ >= 2), "no node beyond hop 1 — depth vacuous")
  }

  test("pagerankWeighted rejects non-positive weights") {
    import spark.implicits._
    val err = intercept[IllegalArgumentException] {
      Graph.pagerankWeighted(
        Seq((1L, 2L, 1L), (2L, 1L, 0L)).toDF("src", "dst", "w"))
    }
    assert(err.getMessage.contains("positive"))
  }

  test("graph_pagerank_copurchase registry row: covers the components node set, mass conserved, weights bite (sf0.001)") {
    val pr = Graph.queries("graph_pagerank_copurchase")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = Graph.queries("graph_components_copurchase")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    // Both rows ride the shared copurchaseEdges spelling, so the node
    // universes must be identical.
    assert(pr.keySet === cc)
    val n = pr.size.toLong
    assert(pr.values.sum <= n * Graph.Scale, "rank mass was created")
    assert(pr.values.sum > n * Graph.Scale * 9L / 10L, "implausible mass loss")
    // Oracle-compared row must run on the fixed basis (the r12 rule).
    assert(Graph.lastPagerankBasis === Graph.Scale,
      s"oracle-compared pagerank ran on adapted basis ${Graph.lastPagerankBasis}")
    // Weights bite: the corpus carries n_orders in 2..5, so the
    // weighted ranking must differ from the same graph with weights
    // erased (both built over the shared copurchaseEdges spelling).
    val base = Graph.copurchaseEdges(spark, sf0001)
    assert(base.agg(max(col("w"))).first().getLong(0) >= 3,
      "corpus weights are degenerate (all equal) — the bite assert is vacuous")
    val sym = base.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(base.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val uniform = Graph.pagerank(sym).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr !== uniform, "weighted ranks equal the unweighted ranks — w is dead")
  }

  test("weighted SQL builder leaves the unweighted oracle spelling untouched (byte-level fragments)") {
    val plain = Graph.oracleSql("graph_pagerank")
    assert(plain.contains("COUNT(*) AS outdeg"))
    assert(plain.contains("SUM(r.rank // i.outdeg) AS BIGINT"))
    assert(!plain.contains("e.w"))
    val weighted = Graph.oracleSql("graph_pagerank_copurchase")
    assert(weighted.contains("CAST(SUM(w) AS BIGINT) AS outdeg"))
    assert(weighted.contains("SUM((r.rank // i.outdeg) * e.w) AS BIGINT"))
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
    // ADVICE r12: the DuckDB twin embeds the compile-time Scale, so an
    // oracle-compared row must have run on EXACTLY that basis — if the
    // n-derived overflow guard ever adapts it on a verify corpus, fail
    // here loudly instead of as a confusing driver hash mismatch.
    assert(Graph.lastPagerankBasis === Graph.Scale,
      s"oracle-compared pagerank ran on adapted basis ${Graph.lastPagerankBasis}")
  }

  test("graph_pagerank_knn registry row covers every vector exactly once (sf0.001)") {
    val out = Graph.queries("graph_pagerank_knn")(spark, sf0001)
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.count() === n)
    assert(out.select(countDistinct(col("vec_id"))).collect()(0).getLong(0) === n)
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val rows = Graph.triangles(edgesDf(edges)).collect()
    // One row per node BEFORE the Map collapse — a duplicate-emitting
    // regression must fail here, not vanish into last-write-wins.
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("triangles: 4-clique with a pendant matches hand counts") {
    // Clique {1,2,3,4} (each node in C(3,2)=3 triangles, clust 10000),
    // pendant 5 hanging off 1 (deg 1 → clust 0; node 1's deg rises to 4
    // → clust = 2·3·10⁴ div (4·3) = 5000).
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val res = runTriangles(clique :+ (1L, 5L))
    assert(res(1L) === ((4L, 3L, 5000L)))
    assert(res(2L) === ((3L, 3L, 10000L)))
    assert(res(3L) === ((3L, 3L, 10000L)))
    assert(res(4L) === ((3L, 3L, 10000L)))
    assert(res(5L) === ((1L, 0L, 0L)))
  }

  test("triangles: bipartite graphs have none (purchase-graph shape)") {
    val edges = for (c <- 0L to 3L; s <- 10L to 13L) yield (c, s)
    val res = runTriangles(edges)
    assert(res.nonEmpty)
    assert(res.values.forall { case (_, tri, bp) => tri === 0L && bp === 0L })
  }

  test("triangles: direction and duplicate edges are erased before counting") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ tri // both directions + dups
    assert(runTriangles(noisy) === runTriangles(tri))
  }

  test("triangles match a brute-force triple scan on a seeded random graph") {
    // Deterministic Erdős–Rényi-ish graph; reference counts every
    // {a,b,c} triple directly, written against the definition.
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for (a <- 0L until n; b <- a + 1 until n
      if rnd.nextDouble() < 0.2) yield (a, b)).toSeq
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val ref = nodes.map { v =>
      val nb = adj(v).toSeq
      val tri = (for (i <- nb.indices; j <- i + 1 until nb.size
        if adj(nb(i)).contains(nb(j))) yield 1).size.toLong
      val d = nb.size.toLong
      v -> ((d, tri, if (d >= 2) 2L * tri * 10000L / (d * (d - 1)) else 0L))
    }.toMap
    assert(runTriangles(edges) === ref)
  }

  test("graph_pagerank_nnd: linear-arm ranks agree with the exact-graph arm (sf0.001)") {
    val exact = Graph.queries("graph_pagerank_knn")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nnd = Graph.queries("graph_pagerank_nnd")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every vector is ranked (each has outdeg k in both graphs).
    assert(nnd.keySet === exact.keySet)
    // Mass conservation: teleport injects 0.15·Scale per node per
    // round and recycling keeps ≤ 0.85 of the rest, so the total sits
    // just under n·Scale (integer floors only ever lose mass).
    val n = exact.size
    assert(nnd.values.sum <= n.toLong * Graph.Scale)
    assert(nnd.values.sum >= n.toLong * Graph.Scale * 97L / 100L)
    // Top-decile agreement with the exact-graph prototypicality
    // ranking — the property diversity selection actually consumes.
    // Deterministic given catalog stats (the nnd arm's contract), so
    // this is a fixed value per corpus, gated with margin under the
    // measured point.
    def top(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (id, r) => (-r, id) }.take(n / 10).map(_._1).toSet
    val overlap = (top(exact) & top(nnd)).size.toDouble / (n / 10)
    assert(overlap >= 0.6, s"top-decile overlap $overlap")
  }

  test("graph_diversity_select: D4 selection invariants (sf0.001)") {
    val out = Graph.queries("graph_diversity_select")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.length === n.toInt)
    // selected ⟺ survived BOTH drops; proto-drop applies to survivors only.
    assert(out.forall { case (_, _, d, p, s) =>
      s === (if (d == 0 && p == 0) 1L else 0L) && !(d == 1 && p == 1)
    })
    // The prototype cut is exactly the top-⌊m/4⌋ survivors by
    // (rank desc, vec_id) — the documented deterministic order.
    val surv = out.filter(_._3 == 0).sortBy(t => (-t._2, t._1))
    val m = surv.length
    assert(out.count(_._4 == 1) === m / 4)
    assert(surv.take(m / 4).forall(_._4 == 1))
    assert(surv.drop(m / 4).forall(_._4 == 0))
    // The clustered corpus really exercises the near-dup arm.
    assert(out.count(_._3 == 1) > 0)
  }

  test("graph_diversity_select_nnd: linear arm agrees with the oracle arm's selection (sf0.01)") {
    // VERDICT r12 #4: gated at sf0.01 (20 k vectors) — the scale the
    // oracle arm is hash-checked at — not just the 2 k fast corpus.
    def sets(name: String) = {
      val rows = Graph.queries(name)(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      // selected ⟺ survived BOTH drops (shared output contract).
      assert(rows.forall { case (_, d, p, s) =>
        s === (if (d == 0 && p == 0) 1L else 0L) && !(d == 1 && p == 1)
      })
      (rows.map(_._1).toSet, rows.filter(_._4 == 1).map(_._1).toSet)
    }
    val (oracleIds, oracleSel) = sets("graph_diversity_select")
    val (nndIds, nndSel) = sets("graph_diversity_select_nnd")
    // Same corpus coverage: every vector gets a verdict in both arms.
    assert(nndIds === oracleIds)
    // The linear arm must make materially the same selection as the
    // hash-matched oracle arm — the divergences are the LSH near-dup
    // recall (vs exactPairs), the NND edge recall (0.94 at sf0.01),
    // and the approx-quantile cutoff (vs the exact m/4 order). The
    // arms' contract is the SELECTED SET, so that is what's gated.
    // Deterministic given catalog stats (the nnd family contract);
    // gate with margin under the measured point (see the info line).
    val jac = (oracleSel & nndSel).size.toDouble / (oracleSel | nndSel).size
    info(f"selected-set Jaccard $jac%.3f " +
      s"(|oracle|=${oracleSel.size}, |nnd|=${nndSel.size})")
    assert(jac >= 0.7, s"selected-set Jaccard $jac < 0.7 " +
      s"(|oracle|=${oracleSel.size}, |nnd|=${nndSel.size})")
  }

  test("graph_components: islands cover every vector with min-id labels and true sizes; linear arm agrees with the oracle arm (sf0.01)") {
    // VERDICT r12 #4: agreement gated at the verify scale (sf0.01,
    // 20 k vectors), matching the kNN recall gates in LlmSpec.
    def comps(name: String) = {
      val rows = Graph.queries(name)(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val n = Tables.embeddings(spark, sf001).count()
      assert(rows.length === n.toInt, s"$name does not cover the corpus")
      // component_id = the component's minimum member id; size = the
      // actual member count (both arms share the output contract).
      rows.groupBy(_._2).foreach { case (cid, members) =>
        assert(members.map(_._1).min === cid, s"$name: label $cid not min")
        assert(members.forall(_._3 == members.length),
          s"$name: size mismatch in component $cid")
      }
      rows
    }
    val exact = comps("graph_components_knn")
    val nnd = comps("graph_components_nnd")
    assert(exact.exists(_._3 > 1),
      "corpus surfaced no multi-vector island — agreement gate vacuous")
    // Cluster agreement as intra-component PAIR Jaccard (label values
    // are membership-dependent, so comparing ids directly would
    // conflate a renamed component with a wrong one).
    def pairSet(rows: Array[(Long, Long, Long)]) =
      rows.groupBy(_._2).values.filter(_.length > 1).flatMap { ms =>
        val ids = ms.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val (pe, pn) = (pairSet(exact), pairSet(nnd))
    val jac = (pe & pn).size.toDouble / (pe | pn).size
    info(f"intra-component pair Jaccard $jac%.3f " +
      s"(|exact|=${pe.size}, |nnd|=${pn.size})")
    assert(jac >= 0.7, s"intra-component pair Jaccard $jac < 0.7")
  }

  test("graph_components_copurchase: min-id labels, true sizes, threshold respected (sf0.001)") {
    val rows = Graph.queries("graph_components_copurchase")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no co-purchase edges survived the threshold")
    // Component labels are the member minimum; sizes are true counts.
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid, s"label $cid not the min member")
      assert(members.forall(_._3 == members.length),
        s"size mismatch in component $cid")
    }
    // Non-vacuous: the clustered corpus must surface a genuinely
    // multi-part bundle (transitivity exercised, not just edge pairs).
    assert(rows.map(_._3).max >= 3,
      "no component of 3+ parts — the transitive closure is vacuous")
    // The node universe is exactly the parts with a kept (>= 2 distinct
    // orders) co-purchase edge — recompute the edge set independently
    // with plain DataFrame ops and compare endpoints.
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
    val ends = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey").as("ok"),
        col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct()
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(explode(array(col("pa"), col("pb"))).as("p"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet === ends,
      "covered part set differs from the thresholded edge endpoints")
  }

  test("graph_triangles registry row: one bounded row per vector (sf0.001)") {
    val out = Graph.queries("graph_triangles")(spark, sf0001).collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.length === n.toInt)
    assert(out.forall { r =>
      val (deg, tri, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      deg >= 3 && tri >= 0 && bp >= 0 && bp <= 10000 &&
        tri <= deg * (deg - 1) / 2
    })
  }
}
