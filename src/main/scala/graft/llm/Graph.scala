package graft.llm

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph centrality for curation — the ranking half of graph-based data
 * work that the CC/label side (dedup_components) doesn't cover.
 * Large-scale pretraining pipelines rank their sources on a link-ish
 * graph before sampling (CommonCrawl-style domain ranking; the harmonic
 * centrality / PageRank pre-filters described around CCNet and
 * RefinedWeb), and embedding-space curation ranks documents by
 * PROTOTYPICALITY inside the kNN similarity graph (the SemDeDup/D4
 * line of work). Both are the same operator: PageRank (Page et al.
 * 1999) over an edge list.
 *
 * Determinism design — INTEGER PageRank. Float PageRank sums
 * contributions in shuffle order, so the last ulp differs between
 * engines and iterations amplify it; instead every rank is a scaled
 * long ([[Scale]] = 10^12 per node) and one iteration is
 *
 *   contrib(s→d) = rank(s) div outdeg(s)
 *   rank'(d)     = Teleport + (85 · (Σ contrib + dangling div n)) div 100
 *
 * — all floor divisions on non-negative longs, so the result is
 * bit-identical regardless of execution order or engine (the
 * event_holt integer-basis discipline applied to a fixpoint), and the
 * DuckDB oracle hash-matches end-to-end. Dangling mass (nodes with no
 * out-edges) is redistributed uniformly, the standard correction.
 * Overflow headroom: total mass never exceeds n·Scale (teleport
 * injects exactly 0.15·Scale per node, recycling keeps ≤ 0.85 of the
 * rest), so the widest intermediate 85·(…) stays below 0.9·n·Scale·100
 * — at n = 10^9 nodes that is ~10^23, past int64, so at that scale
 * [[Scale]] drops to 10^6 (same code; the constant is the knob). At
 * the test corpora (n ≤ 10^5) Scale = 10^12 keeps 12 significant
 * digits through the floors.
 *
 * Scale shape (100 TB): one iteration = one shuffle of the O(n) rank
 * frame keyed by node (join with the persisted degree table), one
 * shuffle of contributions keyed by dst (map-side combined hash agg),
 * and a 1-row dangling aggregate broadcast — the Pregel-by-DataFrames
 * loop. The edge table is persisted once and re-read per round; ranks
 * are `localCheckpoint(true)`-ed per round (the kmeans/CC loop
 * discipline) so the 10-iteration plan never accumulates lineage. On
 * a real cluster the edge table would be bucketed by src so the
 * per-round rank join co-locates without re-shuffling edges.
 */
object Graph {

  /** Per-node starting rank (scaled-integer basis). */
  val Scale = 1000000000000L
  /** 15% of [[Scale]] — the teleport term at damping 0.85. */
  val Teleport = Scale * 15L / 100L
  /** Fixed iteration count: deterministic output (a convergence test
    * would make the row count data-dependent), and 10 rounds is past
    * the point where top-rank ORDER stabilizes on these corpora. */
  val Iters = 10

  /** Integer basis the most recent [[pagerank]]/[[pagerankSeeded]] run
    * actually used — [[Scale]] unless the n-derived overflow guard
    * dropped decades (ADVICE r12: the DuckDB twin always embeds the
    * fixed [[Scale]], so oracle comparisons must assert this equals
    * Scale; GraphSpec does). Driver-eager like Dedup.lastCcRounds. */
  @volatile var lastPagerankBasis: Long = Scale

  /** Integer-arithmetic PageRank over a distinct directed edge list
    * (src, dst) — both long-typed node ids. Returns (node, rank) with
    * rank on the [[Scale]] basis. See the object doc for the exact
    * per-iteration spelling (shared with the DuckDB oracle). */
  def pagerank(edges: DataFrame, iters: Int = Iters): DataFrame =
    pagerankImpl(edges, iters, None)

  /** WEIGHTED integer PageRank (r14 — VERDICT r13 #4): edges carry a
    * positive long weight column `w` (co-occurrence counts, trade
    * volumes) and each round splits a node's recycled rank across its
    * out-edges IN PROPORTION to weight instead of uniformly:
    *
    *   contrib(s→d) = (rank(s) div outW(s)) · w(s→d),  outW = Σ w
    *
    * — floor-divide FIRST, then multiply: every term stays a
    * non-negative long (engine-exact, like the uniform spelling), and
    * per source the contributions sum to (rank div outW)·outW ≤ rank,
    * so total mass conservation — and therefore the n-derived int64
    * headroom guard — is IDENTICAL to [[pagerank]]'s. With all weights
    * equal to 1 the recurrence degenerates to the uniform one term for
    * term (outW = outdeg), which GraphSpec asserts as exact parity.
    * The DuckDB twin ([[pagerankSql]] with weighted = true) spells the
    * same floor-first product, so the fixpoint hash-matches end-to-end. */
  def pagerankWeighted(edges: DataFrame, iters: Int = Iters): DataFrame =
    pagerankImpl(edges, iters, None, weighted = true)

  /** PERSONALIZED integer PageRank (r12): the same fixpoint with the
    * teleport mass and the dangling redistribution anchored on a SEED
    * set instead of spread uniformly — rank flows outward from the
    * seeds through the edges and decays with graph distance, the
    * seeded-relevance expansion retrieval curation runs (rank a corpus
    * by topical closeness to a probe set, then keep/weight by rank).
    * Integer spelling: the TOTAL injected teleport per round equals
    * the uniform variant's n·Teleport — tShare = (15·n·scale div 100)
    * div n_seeds per seed per round, dangling mass returns to seeds as
    * dm div n_seeds — so mass conservation (≤ n·scale) and therefore
    * the n-derived overflow headroom are IDENTICAL to [[pagerank]]'s,
    * and every term is a floor division on non-negative longs: the
    * fixpoint hash-matches the unrolled DuckDB twin like its uniform
    * sibling. Ranks start uniform at scale (not at the seeds): the
    * fixed 10 rounds make the start state a bounded-influence choice,
    * and a uniform start keeps r0 shared with the plain oracle chain.
    * `seeds` is a one-column (node) frame, deduplicated here; seeds
    * outside the graph's node set contribute nothing (inner-join
    * semantics on the flag, their teleport share is still reserved —
    * documented, matching the SQL twin's IN-subquery spelling). */
  def pagerankSeeded(edges: DataFrame, seeds: DataFrame,
      iters: Int = Iters): DataFrame =
    pagerankImpl(edges, iters, Some(seeds))

  /** Weighted PERSONALIZED PageRank (r15 — VERDICT r14 #1):
    * [[pagerankSeeded]]'s seed-anchored teleport/dangling terms composed
    * with [[pagerankWeighted]]'s floor-first proportional rank split.
    * The two switches are orthogonal inside [[pagerankImpl]] — seeding
    * rewrites the per-node injection terms on the node spine, weighting
    * rewrites the per-edge contribution term — and this entry point's
    * registry row (graph_ppr_weighted) is the proof they COMPOSE rather
    * than merely coexist: seed-anchored relevance over a weighted
    * co-occurrence graph, the ranking shape retrieval curation runs
    * (anchor a probe set, rank the corpus by weighted proximity). Mass
    * conservation and the int64 headroom guard are inherited unchanged
    * (each parent's argument holds term-for-term; see their Scaladocs),
    * every term stays a floor division or product of non-negative
    * longs, and the DuckDB twin ([[pagerankSql]] with BOTH seedsSql and
    * weighted set) hash-matches end-to-end. */
  def pagerankSeededWeighted(edges: DataFrame, seeds: DataFrame,
      iters: Int = Iters): DataFrame =
    pagerankImpl(edges, iters, Some(seeds), weighted = true)

  private def pagerankImpl(edges: DataFrame, iters: Int,
      seeds: Option[DataFrame], weighted: Boolean = false): DataFrame = {
    // Persisted PRE-PARTITIONED by src (r17 optimization round; guide
    // §2.4 — the Scaladoc's "on a real cluster the edge table would be
    // bucketed by src" realized in-session): every one of the `iters`
    // contribution joins keys on src, and a cache that already carries
    // hash(src) partitioning satisfies that join's distribution — the
    // pre-r17 plan re-exchanged the whole cached edge table EVERY
    // round (the only O(|E|) shuffle in the loop; the rank/info sides
    // were already co-partitioned by node). One up-front shuffle at
    // persist time buys `iters` exchange-free reads; outdeg's
    // groupBy(src) reuses the same layout. Values are untouched —
    // physical layout only, every oracle hash unchanged.
    val e = Q.ownPersist(
      (if (weighted) edges.select(col("src"), col("dst"), col("w"))
      else edges.select(col("src"), col("dst")))
        .repartition(col("src")))
    // Weighted mode: outdeg becomes the node's total out-WEIGHT, and
    // the per-edge contribution multiplies the floored per-weight-unit
    // share by the edge weight. Positive weights are a correctness
    // precondition (w = 0 would silently drop an edge from the rank
    // split while still defining the node spine; w < 0 breaks the
    // non-negative-long floor arithmetic) — enforced with one cheap
    // driver-side agg on the already-persisted edge frame, the
    // triangles id-domain require() precedent.
    if (weighted) {
      val wMin = e.df.agg(min(col("w"))).first()
      require(!wMin.isNullAt(0) && wMin.getLong(0) >= 1L,
        s"pagerankWeighted: edge weights must be positive longs — " +
          s"got min ${wMin.get(0)}")
    }
    val outdeg =
      if (weighted) e.df.groupBy(col("src").as("node"))
        .agg(sum(col("w")).as("outdeg"))
      else e.df.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("outdeg"))
    val info = Q.ownPersist(
      e.df.select(col("src").as("node"))
        .union(e.df.select(col("dst").as("node"))).distinct()
        .join(outdeg, Seq("node"), "left")
        .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg")))
    val n = info.df.count()
    require(n > 0, "pagerank over an empty edge list")
    // Enforce the documented int64 headroom at runtime (ADVICE r11) by
    // DERIVING the basis from n — the Scaladoc's "the constant is the
    // knob", made automatic: the adversarial worst case (all mass
    // flowing into one node) bounds the widest intermediate by
    // 85·n·basis, and Spark long sums WRAP silently outside ANSI mode,
    // so the basis drops a decade at a time until that bound clears
    // int64. Every oracle corpus (n ≤ ~16 k) keeps the documented
    // 10^12 basis — the hash-matched rows are untouched — while a
    // 200 k-node NND corpus runs on 10^11 instead of refusing to run
    // (the first cut of this check required n ≤ 108 510 outright and
    // rejected the r11-measured graph_pagerank_nnd s10 corpus). The
    // 10^3 floor keeps ≥ 3 significant digits; past it (n > ~10^14)
    // integer PageRank genuinely needs a wider accumulator.
    var scale = Scale
    while (scale > 1000L && scale > Long.MaxValue / (85L * n)) scale /= 10
    require(scale <= Long.MaxValue / (85L * n),
      s"pagerank: $n nodes exceeds the int64 headroom even at the " +
        s"minimum 10^3 basis")
    // ADVICE r12: the DuckDB twin (pagerankSql) always embeds the
    // compile-time $Scale, so oracle hash-parity is CONDITIONAL on the
    // basis not adapting (n ≤ ~108 510; every verify corpus is ≤16 k
    // nodes). Make the divergence loud instead of a confusing future
    // hash mismatch: record the basis for harnesses to assert on
    // (GraphSpec pins Scale on the oracle-compared rows) and warn on
    // the adapted path.
    lastPagerankBasis = scale
    if (scale != Scale)
      System.err.println(
        s"[graft] pagerank basis adapted to $scale for $n nodes — " +
          s"output is NOT comparable to the fixed-$Scale DuckDB oracle")
    val teleport = scale * 15L / 100L
    // Seeded variant: the seed flag rides the node spine (a broadcast
    // join against the deduplicated seed frame), the per-seed teleport
    // share preserves the uniform variant's total injected mass, and
    // the dangling mass returns to seeds instead of everyone.
    val seedInfo = seeds.map { sd =>
      // ADVICE r12: taking columns.head of an arbitrary frame would
      // silently read wrong seeds from a multi-column frame with the
      // node elsewhere — require an unambiguous spelling: either a
      // single column, or a column literally named "node".
      val seedCol =
        if (sd.columns.length == 1) sd.columns.head
        else sd.columns.find(_ == "node").getOrElse(throw
          new IllegalArgumentException(
            "pagerankSeeded: seeds must be a single-column frame or " +
              s"carry a column named 'node' (got ${sd.columns.mkString(", ")})"))
      val sdDistinct = sd.select(col(seedCol).as("node")).distinct()
      val nS = sdDistinct.count()
      require(nS > 0, "pagerankSeeded with an empty seed set")
      val tShare = (15L * n * scale / 100L) / nS
      (Q.ownPersist(sdDistinct.withColumn("is_seed", lit(true))), nS, tShare)
    }
    val nodeSpine = seedInfo match {
      case Some((sdOwned, _, _)) =>
        info.df.select(col("node"))
          .join(broadcast(sdOwned.df), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => info.df.select(col("node"), lit(false).as("is_seed"))
    }
    val teleCol = seedInfo match {
      case Some((_, _, tShare)) =>
        when(col("is_seed"), lit(tShare)).otherwise(lit(0L))
      case None => lit(teleport)
    }
    val dangExpr = seedInfo match {
      case Some((_, nS, _)) =>
        s"(CASE WHEN is_seed THEN dm div ${nS}L ELSE 0L END)"
      case None => s"(dm div ${n}L)"
    }
    // r17 optimization round (guide §1.2 "remove unnecessary passes"):
    // the STATIC node attributes (outdeg, is_seed) ride the iterated
    // rank frame instead of being re-joined every round — the pre-r17
    // loop paid two joins per round (ranks ⋈ info for the degree,
    // nodeSpine ⋈ contribs for the verdict spine, where nodeSpine
    // itself re-ran the seed broadcast join each round); now each
    // round is ONE join of the rank frame with the edge cache plus the
    // spine attach of the contribution aggregate. The recurrence is
    // untouched — identical operands, identical floor arithmetic —
    // so every oracle hash is unchanged; the checkpointed frame is
    // two longs wider, a size: n·16-byte cost traded for ~2 plan
    // stages (one broadcast build + one join) per round.
    val hasDangling = info.df.filter(col("outdeg") === 0).limit(1).count() > 0
    // r18 (VERDICT r17 #3): the rank frame is seeded hash(node)-
    // partitioned and every round's checkpoint PRESERVES that layout
    // (GraftShims.localCheckpointKeepPartitioning — a stock
    // localCheckpoint leaf reports UnknownPartitioning, so each round
    // re-exchanged the n-row rank frame it had just written out on the
    // very key it was already laid out on). With the claim in place the
    // round's two rank-side consumers — the contribution join against
    // the hash(src) edge cache and the spine attach of the hash(node)
    // contribution aggregate — are exchange-free on the rank side when
    // they plan as shuffle joins (the 100 TB shape; at sf0.1 they
    // broadcast and the claim simply rides along). One up-front n-row
    // exchange buys `iters` exchange-free rounds.
    //
    // The seed count is EXPLICIT (the session shuffle-partition conf,
    // never a literal): an N-less repartition is AQE-coalescible, and
    // at test scale it collapsed the tiny rank frame to ~1 partition —
    // a layout the claim then faithfully PRESERVED across all ten
    // rounds, serializing every round's window/join work (measured:
    // graph_ppr +1.5 s). An explicit count is exempt from coalescing,
    // so the claim carries full parallelism instead; at 100 TB the
    // conf is sized to the cluster and the same spelling holds.
    val seedParts = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    var ranks = org.apache.spark.sql.GraftShims.localCheckpointKeepPartitioning(
      nodeSpine.join(info.df, Seq("node"))
        .select(col("node"), col("outdeg"), col("is_seed"),
          lit(scale).as("rank"))
        .repartition(seedParts, col("node")))
    for (_ <- 1 to iters) {
      val contribs = ranks.filter(col("outdeg") > 0)
        .join(e.df, col("node") === col("src"))
        .select(col("dst"), expr(
          if (weighted) "(rank div outdeg) * w" else "rank div outdeg")
          .as("c"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
      val spine = ranks.select(col("node"), col("outdeg"), col("is_seed"))
        .join(contribs, Seq("node"), "left")
      // Dangling-free graphs (every kNN graph — outdeg is structurally
      // k — and the symmetric co-purchase graphs) skip the per-round
      // dangling aggregate + 1-row broadcast outright: with no node at
      // outdeg 0, dm is identically 0 every round, so a constant 0
      // column is bit-identical to the aggregate (r17; guide §1.2
      // "don't compute things you throw away"). Graphs with real
      // dangling mass (the purchase digraph's supplier side) keep the
      // exact aggregate.
      val withDm =
        if (hasDangling) {
          val dangling = ranks.filter(col("outdeg") === 0)
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
          spine.crossJoin(broadcast(dangling))
        } else spine.withColumn("dm", lit(0L))
      // Eager per-round checkpoint truncates the iterative lineage
      // (else the 10-round plan explodes, as every fixpoint here
      // learned); the partitioning-preserving spelling keeps the
      // spine join's hash(node) layout on the leaf (r18 — see the
      // seed checkpoint above).
      val next = org.apache.spark.sql.GraftShims.localCheckpointKeepPartitioning(
        withDm.select(col("node"), col("outdeg"), col("is_seed"), (teleCol +
          expr(s"(85 * (coalesce(s, 0L) + $dangExpr)) div 100")).as("rank")))
      // `next` is eagerly materialized (a complete snapshot), so the
      // previous round's checkpoint blocks are dead — unpersist them
      // instead of leaking one rank frame per round for the session
      // lifetime (ADVICE r13; clearCache can't see checkpoint blocks).
      org.apache.spark.sql.GraftShims.unpersistLeafRdd(ranks)
      ranks = next
    }
    seedInfo.foreach(_._1.release())
    e.release(); info.release()
    // The FINAL checkpoint backs the returned (lazy) frame — reaped by
    // the runner's post-materialization drain, not here; the static
    // columns are projected away so the returned shape is unchanged.
    Q.registerCheckpoint(ranks).select(col("node"), col("rank"))
  }

  /** Hop cap for [[bfsFrom]]: fixed so the output is deterministic and
    * the DuckDB twin's recursive CTE terminates — a (node, dist ≤ cap)
    * row universe is finite even on cyclic graphs, unbounded dist is
    * not. 10 matches [[Iters]]: past ~10 hops the link-distance signal
    * curation consumes is saturated anyway (PPR mass at that radius is
    * ≤ 0.85¹⁰ ≈ 0.2 of a hop-1 neighbor's). */
  val BfsMaxHops = 10

  /** Multi-source hop-limited BFS (r15 — VERDICT r14 #4): minimum hop
    * distance from a SEED set over a directed (src, dst) edge list —
    * the link-distance-from-trusted-seeds quality signal web-curation
    * pipelines stack beside PPR (how many links from a curated root;
    * the harmonic-centrality/TrustRank-adjacent feature). Output:
    * (node, dist) for EVERY node of the edge universe — dist 0 = seed,
    * −1 = unreached within [[BfsMaxHops]] hops. Pure integers
    * end-to-end, so the recursive-CTE oracle hash-matches with no
    * float hazard at all.
    *
    * Scale shape: one frontier-join + distinct + anti-join per round,
    * every shuffle keyed by node, rounds bounded by the HOP CAP (never
    * by graph size); frontier-only propagation means round h probes
    * |layer h−1| rows, not |reached|. The frontier side of the edge
    * join goes through [[graft.Q.maybeBroadcast]]: a BFS layer is
    * usually far smaller than the edge table, and broadcasting it
    * turns the round into one scan + hash probe of the persisted edges
    * — no per-round edge shuffle/sort (an SMJ here re-sorts the whole
    * edge table EVERY round; at 100 TB that sort is the round's entire
    * cost). A giant layer (worst case O(n)) fails the conf gate and
    * falls back to the shuffle join keyed on src — the scale-safe
    * shape, same policy as every other gated broadcast in the repo.
    * Per-round materialization is FRONTIER-ONLY too (VERDICT r15 #4):
    * each round `localCheckpoint`s just the NEW layer — O(|layer h|)
    * checkpoint I/O, total Σ|layers| = |reached| over the whole run —
    * and the reached set is the logical UNION of the ≤ cap+1 layer
    * snapshots (plan depth bounded by the hop cap, never by data). The
    * r15 shape re-checkpointed the full reached set every round:
    * O(|V|·hops) write volume for the same answer. Every layer
    * checkpoint registers with [[graft.Q.registerCheckpoint]] for the
    * runner drain (all layers stay live — they ARE the result). Early
    * exit on an empty layer is safe (BFS closure: an empty layer stays
    * empty) and rides the count each round already runs — one job per
    * round, the CC fixpoint's documented accounting.
    * [[lastBfsLayerSizes]] records each round's checkpointed row count
    * so GraphSpec can pin that materialization matches the layer, not
    * the reached set.
    *
    * Seed-frame spelling rule and outside-the-graph semantics follow
    * [[pagerankSeeded]]: single column or a column named `node`; seeds
    * outside the edge universe are dropped (semi join) and contribute
    * nothing. */
  /** Per-round checkpointed row counts of the last [[bfsFrom]] run —
    * layerSizes(h) = |layer h|. Driver-eager like Dedup.lastCcRounds;
    * GraphSpec pins Σ = reached count (materialization is layer-sized,
    * never reached-sized — VERDICT r15 #4). */
  @volatile var lastBfsLayerSizes: Seq[Long] = Nil

  def bfsFrom(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = BfsMaxHops): DataFrame = {
    val e = Q.ownPersist(edges.select(col("src"), col("dst")))
    val nodes = Q.ownPersist(
      e.df.select(col("src").as("node"))
        .union(e.df.select(col("dst").as("node"))).distinct())
    val seedCol =
      if (seeds.columns.length == 1) seeds.columns.head
      else seeds.columns.find(_ == "node").getOrElse {
        e.release(); nodes.release()
        throw new IllegalArgumentException(
          "bfsFrom: seeds must be a single-column frame or carry a " +
            s"column named 'node' (got ${seeds.columns.mkString(", ")})")
      }
    val seedLayer = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes.df, Seq("node"), "left_semi")
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    val seedCnt = seedLayer.count()
    if (seedCnt == 0) {
      // ADVICE r15: the empty-seed error path used to fire AFTER the
      // seed checkpoint materialized and e/nodes persisted but BEFORE
      // registration — leaking all three until GC. Clean up first.
      try org.apache.spark.sql.GraftShims.unpersistLeafRdd(seedLayer)
      catch { case scala.util.control.NonFatal(_) => }
      e.release(); nodes.release()
      throw new IllegalArgumentException(
        "requirement failed: bfsFrom: no seed lies in the edge universe")
    }
    // layers(h) = the checkpointed (node, dist=h) frame; reached is
    // their logical union (≤ cap+1 legs — plan bounded by the hop cap).
    val layers = scala.collection.mutable.ArrayBuffer(seedLayer)
    val sizes = scala.collection.mutable.ArrayBuffer(seedCnt)
    Q.registerCheckpoint(seedLayer)
    def reached: DataFrame = layers.reduce(_ union _)
    var hop = 0
    var growing = true
    while (hop < maxHops && growing) {
      hop += 1
      // Layer h = out-neighbors of layer h−1 not yet reached. Only this
      // NEW layer is checkpointed (frontier-only materialization); the
      // eager checkpoint both bounds the plan and materializes the
      // count that drives early exit.
      val frontier = Q.maybeBroadcast(layers.last.select(col("node")))
      val layer = e.df.join(frontier, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(reached, Seq("node"), "left_anti")
        .select(col("node"), lit(hop.toLong).as("dist"))
        .localCheckpoint(true)
      val n = layer.count()
      if (n == 0) {
        growing = false
        try org.apache.spark.sql.GraftShims.unpersistLeafRdd(layer)
        catch { case scala.util.control.NonFatal(_) => }
      } else {
        layers += layer
        sizes += n
        Q.registerCheckpoint(layer)
      }
    }
    lastBfsLayerSizes = sizes.toSeq
    e.release()
    // nodes' handle intentionally leaked to the runner's per-query
    // clearCache (the lazy verdict below reads it — the documented
    // convention); the layer checkpoints are runner-drained.
    nodes.df.join(reached, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** Node-order key base for [[triangles]]: ord = deg·OrdScale + node
    * encodes the (degree, node) total order in ONE sortable BIGINT (the
    * join key both engines compare identically). Node ids must stay
    * below OrdScale — 10^12 leaves 10^6 of degree headroom in int64,
    * the same headroom split [[Scale]] uses. */
  val OrdScale = 1000000000000L

  /** Per-node triangle count + local clustering coefficient over an
    * undirected graph given as a (src, dst) edge list (direction and
    * duplicates are erased first). The MapReduce-classic degree-ordered
    * algorithm (Suri & Vassilvitskii, WWW 2011: orient every edge from
    * its lower-(degree, id) endpoint to its higher one, so each
    * triangle is counted exactly once from its lowest corner and no
    * reducer sees more than the oriented out-neighborhood of one node
    * — Σ d_out² stays near the m^1.5 optimum instead of the hub's d²).
    * That orientation is what makes the op survive hubs at 100 TB: the
    * wedge join fans out by oriented out-degree (bounded), never by raw
    * in-degree (unbounded).
    *
    * Pure integer arithmetic end-to-end (counts, floor-div basis
    * points), so the result is engine-exact and the registry row below
    * hash-matches DuckDB. Output: (node, degree, tri_cnt, clust_bp)
    * with clust_bp = 2·tri·10⁴ div (deg·(deg−1)) — the local clustering
    * coefficient in basis points, the neighborhood-redundancy signal
    * graph curation ranks on. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = Q.ownPersist(edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    // Undirected degree, then the (deg, node)-order key ord.
    val info = Q.ownPersist(
      und.df.select(col("a").as("node"))
        .union(und.df.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .select(col("node"), col("deg"),
          (col("deg") * OrdScale + col("node")).as("ord")))
    // Enforce the documented id domain (0 ≤ node < OrdScale): outside
    // it, ord stops encoding the (deg, node) order and `% OrdScale`
    // recovers a WRONG node — every tri_cnt would silently read 0 via
    // the failed join-back rather than erroring. One cheap agg over
    // the already-cached info frame (the pagerank require() precedent).
    val dom = info.df.agg(min(col("node")), max(col("node"))).head()
    require(dom.isNullAt(0) ||
        (dom.getLong(0) >= 0L && dom.getLong(1) < OrdScale),
      s"triangles: node ids must lie in [0, $OrdScale) — got " +
        s"[${dom.get(0)}, ${dom.get(1)}]")
    val ia = info.df.select(col("node").as("a"), col("ord").as("oa"))
    val ib = info.df.select(col("node").as("b"), col("ord").as("ob"))
    val oriented = Q.ownPersist(
      und.df.join(ia, "a").join(ib, "b")
        .select(least(col("oa"), col("ob")).as("lo"),
          greatest(col("oa"), col("ob")).as("hi")))
    // Wedges from each lowest corner; a triangle iff the closing
    // (h1, h2) pair — already in orientation order — is itself an edge.
    val o1 = oriented.df.select(col("lo"), col("hi").as("h1"))
    val o2 = oriented.df.select(col("lo"), col("hi").as("h2"))
    val tris = o1.join(o2, Seq("lo")).filter(col("h1") < col("h2"))
      .join(oriented.df.withColumnRenamed("lo", "h1")
        .withColumnRenamed("hi", "h2"), Seq("h1", "h2"))
    val perNode = tris.select(explode(array(col("lo"), col("h1"), col("h2")))
        .as("ord"))
      .select(expr(s"ord % ${OrdScale}L").as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
    // und/info/oriented handles intentionally kept: the lazy result
    // frame is built OVER the caches (oriented is read three times by
    // the wedge + closing joins), so they must live until the caller
    // materializes it — released by the runner's per-query clearCache
    // (the knnGraphBlocked lifecycle).
    info.df.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        when(col("deg") >= 2,
          expr("(2 * coalesce(tri_cnt, 0L) * 10000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("clust_bp"))
  }

  /** The customer→supplier purchase digraph: an edge per distinct
    * (customer, supplier) trade relation. Customer and supplier key
    * spaces overlap numerically, so nodes are parity-encoded
    * (cust → 2k, supp → 2k+1). Suppliers have no out-edges — the whole
    * supplier side is dangling mass, which is exactly what makes this
    * corpus a real test of the dangling correction. */
  private[graft] def purchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  /** Shared body of the graph_ppr registry row (ADVICE r13): seeded
    * PageRank over the purchase digraph with the given seed frame,
    * projected to the row's output shape. The registry row and
    * StressBench's stress arm (whose corpus has no customer table, so
    * it derives the same ten anchors from orders) both call this — one
    * spelling, so drift between what the registry runs and what the
    * benchmark series prices fails to compile. */
  def pprOver(s: org.apache.spark.sql.SparkSession, d: String,
      seeds: DataFrame): DataFrame =
    pagerankSeeded(purchaseEdges(s, d), seeds)
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp"))
          .as("ntype"),
        expr("node div 2").as("ref_id"), col("rank"))
      .orderBy(col("node_id"))

  /** Co-purchase edge list (r13/r14): one row per unordered part pair
    * bought together in ≥ 2 DISTINCT orders, doc_a < doc_b, with the
    * distinct-order count as the edge weight `w`. Shared by
    * graph_components_copurchase (which thresholds and then drops the
    * weight) and graph_pagerank_copurchase (which carries it into the
    * weighted rank split) — one spelling of the pair fan for both rows.
    * Scale shape: the within-order self-join fans by bounded order
    * size (~7 lineitems), so the pair stream is a constant factor of
    * the lineitem scan, never n²; the distinct + count agg shuffles by
    * pair key with map-side partials (PlanShapeSpec pins hash/merge on
    * l_orderkey, never a cartesian). */
  private[graft] def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
    // Plan-audited r17 (optimization round, guide §2.4) and left in the
    // ORIGINAL spelling deliberately: the (ok, doc_a, doc_b) distinct
    // already runs EXCHANGE-FREE — the within-order join's
    // hash(l_orderkey) output clustering satisfies the distinct's
    // (ok, …) requirement by the key-subset rule — so the fan is
    // DEDUPED before the only real exchange (hash(doc_a, doc_b) into
    // the weight agg). An attempted repartition(doc_a, doc_b)-shared
    // spelling shipped the RAW fan through that exchange instead of
    // the deduped one (plans/r17/copurchase_edges_{before,after}.txt:
    // 3 exchanges either way, strictly more bytes repartitioned) and
    // was reverted.
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey").as("ok"),
        col("a.l_partkey").as("doc_a"), col("b.l_partkey").as("doc_b"))
      .distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
  }

  val queries: Map[String, QFn] = Map(
    // Source-graph centrality: who the influential buyers/suppliers are
    // under rank recycling — the domain-ranking shape on the TPC-H-ish
    // corpus. Full DuckDB oracle (integer arithmetic hash-matches).
    "graph_pagerank" -> ((s, d) =>
      pagerank(purchaseEdges(s, d))
        .select(col("node").as("node_id"),
          when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp"))
            .as("ntype"),
          expr("node div 2").as("ref_id"), col("rank"))
        .orderBy(col("node_id"))),

    // PERSONALIZED PageRank over the purchase digraph (r12): rank
    // every trade-graph participant by closeness to ten ANCHOR
    // customers — the seeded-relevance expansion retrieval curation
    // runs (anchor on a probe set, rank the corpus by topical
    // proximity, keep/weight by rank). The all-dangling supplier side
    // makes this corpus the real test of the SEEDED dangling
    // redistribution (mass parked at suppliers returns to the anchors,
    // not to everyone). Full DuckDB oracle via the seeded chain.
    "graph_ppr" -> ((s, d) =>
      pprOver(s, d,
        Tables.customer(s, d).filter(col("c_custkey") <= 10)
          .select((col("c_custkey") * 2).as("node")))),

    // Prototypicality over the EXACT kNN similarity digraph (k = 3,
    // the oracle-checked knn_graph edges): rank flows toward vectors
    // many others call "near", the centrality score SemDeDup/D4-style
    // diversity selection consumes. Every node has outdeg k, so the
    // dangling term is exercised as a structural zero here and a
    // structural non-zero in graph_pagerank.
    "graph_pagerank_knn" -> ((s, d) =>
      pagerank(Similarity.knnGraph(Tables.embeddings(s, d), 3)
          .select(col("src"), col("dst")))
        .select(col("node").as("vec_id"), col("rank"))
        .orderBy(col("vec_id"))),

    // Local clustering over the same exact kNN digraph: how redundant
    // each vector's neighborhood is (triangle-dense regions = near-dup
    // clusters / over-represented modes — the complement of pagerank's
    // prototypicality ranking). Pure integer output hash-matches the
    // DuckDB spelling of the same degree-ordered algorithm.
    "graph_triangles" -> ((s, d) =>
      triangles(Similarity.knnGraph(Tables.embeddings(s, d), 3)
          .select(col("src"), col("dst")))
        .select(col("node").as("vec_id"), col("degree"), col("tri_cnt"),
          col("clust_bp"))
        .orderBy(col("vec_id"))),

    // The 100 TB arm of kNN-graph centrality: the SAME integer
    // PageRank over the end-to-end LINEAR NN-descent graph
    // (knn_graph_nnd's edges, 0.94 edge recall vs exact at sf0.01)
    // instead of the n² exact graph that backs the two oracle rows
    // above. The oracle arms pin the OPERATOR; this row prices the
    // composition a cluster would actually run. Rows-only like its
    // edge source (band widths are stats-sized); GraphSpec gates
    // top-decile rank agreement against the exact-graph arm.
    "graph_pagerank_nnd" -> ((s, d) =>
      pagerank(Similarity.knnGraphNnd(Tables.embeddings(s, d), 3)
          .select(col("src"), col("dst")))
        .select(col("node").as("vec_id"), col("rank"))
        .orderBy(col("vec_id"))),

    // D4-style diversity selection (Tirumala et al. 2023: SemDeDup
    // then drop the most PROTOTYPICAL items) composed from this
    // round's oracle-checked pieces: (1) near-dup drop — a vector is
    // dropped iff a smaller-id partner has rounded cos ≥ 0.35
    // (embed_neardup's exact predicate, the canonical-survivor rule);
    // (2) prototype drop — the top ⌊m/4⌋ SURVIVORS by kNN-PageRank
    // (ties by vec_id) are the over-represented modes diversity
    // selection removes. Every term is a long or a deterministic
    // window, so the composed PIPELINE hash-matches DuckDB end-to-end
    // — not just its parts. The global row_number/count windows are
    // the oracle arm's price (bounded here by the n² exact-kNN base
    // it already sits on); the scale arm swaps in knn_graph_nnd edges
    // + an approx-quantile rank threshold, both measured elsewhere.
    "graph_diversity_select" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val pr = pagerank(Similarity.knnGraph(emb, 3)
          .select(col("src"), col("dst")))
        .select(col("node").as("vec_id"), col("rank"))
      val dup = Similarity.exactPairs(emb, Similarity.NeardupCos)
        .select(col("vec_b").as("vec_id")).distinct()
        .withColumn("dup", lit(1L))
      // Persisted: the final join reads `base` in BOTH branches (the
      // verdict spine and the survivor window), and relying on
      // ReuseExchange to dedupe the O(n²) exactPairs subplan would be
      // plan-shape-dependent. Handle intentionally leaked to the
      // runner's per-query clearCache (the knnGraphBlocked lifecycle:
      // the lazy result frame is built over the cache).
      val base = Q.ownPersist(pr.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("rank"),
          coalesce(col("dup"), lit(0L)).as("is_dup"))).df
      val surv = base.filter(col("is_dup") === 0)
        .withColumn("rn",
          row_number().over(Window.orderBy(col("rank").desc, col("vec_id")))
            .cast("long"))
        .withColumn("m", count(lit(1)).over(Window.partitionBy()))
        .select(col("vec_id"),
          (col("rn") <= expr("m div 4")).cast("long").as("is_proto"))
      base.join(surv, Seq("vec_id"), "left")
        .select(col("vec_id"), col("rank"), col("is_dup"),
          coalesce(col("is_proto"), lit(0L)).as("is_proto"),
          (col("is_dup") === 0 &&
            coalesce(col("is_proto"), lit(0L)) === 0)
            .cast("long").as("selected"))
        .orderBy(col("vec_id"))
    }),

    // The 100 TB arm of D4 diversity selection (clearing VERDICT r11
    // #1): the same three-stage pipeline as graph_diversity_select
    // with every scale-killer swapped for a linear sibling, and ONE
    // graph build feeding both drops — prototypicality from PageRank
    // over the LINEAR NN-descent graph (graph_pagerank_nnd's
    // composition) instead of the n² exact kNN graph; the near-dup
    // drop from that SAME graph's edges (SemDeDup's move: near-dups
    // are by definition nearest neighbors, so an edge at rounded cos ≥
    // NeardupCos marks its larger endpoint — a strict SUBSET of the
    // exact pair relation, both arms sharing cos4Pre's rounding, with
    // misses only where ALL of a node's ≥-thresh partners on BOTH
    // edge directions fall outside top-k; hyperplane-LSH banding was
    // measured useless here — P(bit agree) ≈ 0.61 at the 0.35-cos
    // angle collapses band collisions, ~10 of ~190 dups found at
    // sf0.001); and the survivor cutoff from ONE approx_percentile
    // aggregate (a broadcast 1-row frame) instead of a global
    // row_number window — the m/4 cut needs a quantile, not a total
    // order, so nothing in this arm ever sorts or windows the corpus
    // on a single partition. Rows-only like its edge source (band
    // widths are stats-sized); GraphSpec gates the selected-set
    // Jaccard vs the oracle arm at sf0.001, and BENCH_stress prices
    // s1–s10 relative to knn_graph_nnd.
    "graph_diversity_select_nnd" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // Persisted: both the pagerank edge input and the near-dup drop
      // read the (expensive) NND graph; handle leaked to the runner's
      // per-query clearCache, the documented convention.
      val edges = Q.ownPersist(Similarity.knnGraphNnd(emb, 3)
        .select(col("src"), col("dst"), col("cos_sim"))).df
      val pr = pagerank(edges.select(col("src"), col("dst")))
        .select(col("node").as("vec_id"), col("rank"))
      val dup = edges.filter(col("cos_sim") >= Similarity.NeardupCos)
        .select(greatest(col("src"), col("dst")).as("vec_id")).distinct()
        .withColumn("dup", lit(1L))
      // Persisted for the same two-branch reason as the oracle arm's
      // base (the cutoff agg + the verdict spine both read it).
      val base = Q.ownPersist(pr.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("rank"),
          coalesce(col("dup"), lit(0L)).as("is_dup"))).df
      val cut = base.filter(col("is_dup") === 0)
        .agg(expr("approx_percentile(rank, 0.75)").as("cut"))
      base.crossJoin(broadcast(cut))
        .select(col("vec_id"), col("rank"), col("is_dup"),
          (col("is_dup") === 0 && col("rank") > col("cut"))
            .cast("long").as("is_proto"),
          (col("is_dup") === 0 && col("rank") <= col("cut"))
            .cast("long").as("selected"))
        .orderBy(col("vec_id"))
    }),

    // Semantic ISLANDS (r12): connected components over the kNN
    // similarity graph thresholded at embed_neardup's calibrated
    // cosine — the cluster step of SemDeDup-style curation as a
    // first-class GRAPH op (the CC machinery existed only behind the
    // document near-dup pipeline, dedup_components; a user clustering
    // an embedding corpus had no entry point). Every vector gets a
    // verdict: members carry their component's min vec_id, vectors
    // whose whole top-k falls below the threshold are singletons
    // (component = self, size 1). The fixpoint is the SHARED
    // [[Dedup.connectedComponents]] (one join+agg shuffle per round,
    // rounds bounded by component DIAMETER — flat at 2 for near-dup
    // graphs through s30 in BENCH_stress; for THIS graph class — a
    // thresholded kNN graph over a smeared manifold can form chains
    // whose diameter grows with n — the fixpoint self-bounds via the
    // r13 Shiloach–Vishkin arm: after `spark.graft.ccJumpAfter`
    // rounds of pure min-label, pointer-jump-to-closure alternates
    // with root-to-root hook rounds, so a planted 1024-chain
    // converges in ~14 steps instead of ~1024 and the id-permuted
    // stress s1 kNN graph in a measured 21, output parity-identical
    // to min-label — see the [[Dedup.connectedComponents]] Scaladoc
    // and LlmSpec's planted-chain test); the
    // oracle is the same recursive-CTE transitive closure
    // dedup_components hash-matches, over knnGraphCtes' edges.
    "graph_components_knn" -> ((s, d) =>
      componentsOver(
        Similarity.knnGraph(Tables.embeddings(s, d), 3),
        Tables.embeddings(s, d))),

    // The linear arm: the same islands over knn_graph_nnd's edges —
    // the composition a cluster actually runs (edge build linear,
    // CC steps log-bounded, zero n² stages). Rows-only like its edge
    // source; GraphSpec gates intra-component-pair agreement vs the
    // exact arm at sf0.01.
    //
    // sf0.1 cost attribution (VERDICT r12 #6, listener-measured idle
    // at r13 HEAD): this row walls 15.7 s over 166 jobs / 793 AQE
    // stages, of which the SHARED knn_graph_nnd edge build alone is
    // 13.6 s / 90 jobs — the CC fixpoint itself is 13 steps ≈ 2 s.
    // Task-time parallel efficiency is 0.33–0.45 across the NND
    // family (sum of executorRunTime over wall·32 cores): at 2 000
    // vectors each of the ~800 stages carries too little work to fill
    // 32 cores, so the rows are STAGE-LATENCY-bound — the known sf0.1
    // floor, not a plan defect (every fixpoint step is one action;
    // AQE materializes each shuffle stage as its own scheduler job,
    // which is where the high job counts come from — LlmSpec pins one
    // job per step with AQE off). graph_pagerank_nnd reads the same:
    // 15.2 s / 172 jobs, 82 beyond the shared build for 10 bounded
    // Pregel rounds. At stress scales the same plans fill the machine
    // (s30 knn_graph_nnd cpu_share 0.9+) — the floor is sf0.1's size,
    // not the operators'.
    "graph_components_nnd" -> ((s, d) =>
      componentsOver(
        Similarity.knnGraphNnd(Tables.embeddings(s, d), 3),
        Tables.embeddings(s, d))),

    // Co-purchase part clusters (r13): connected components over the
    // graph of parts bought together in ≥ 2 DISTINCT orders — the
    // bundle/substitute-cluster mining shape (frequent-co-occurrence
    // graph → communities), and the third graph FAMILY through the
    // shared CC fixpoint (token near-dup, thresholded kNN, now
    // transactional co-occurrence — at sf0.01 this one carries a
    // 1 875-node near-giant component, real work for the
    // Shiloach–Vishkin arm). Scale shape: the within-order pair
    // self-join fans by order SIZE (bounded ~7 lineitems, so the pair
    // stream is a constant factor of the lineitem scan, never n²);
    // the distinct + HAVING agg shuffles by pair key with map-side
    // partials; then the shared O(log n)-step fixpoint. Output covers
    // exactly the parts with a kept edge (the dedup_components
    // convention: the pair relation defines the node universe).
    // Full DuckDB oracle: recursive-CTE transitive closure over the
    // same thresholded edge set, hash-matched including sizes.
    "graph_components_copurchase" -> ((s, d) =>
      Dedup.connectedComponents(
          copurchaseEdges(s, d).select(col("doc_a"), col("doc_b")))
        .select(col("doc_id").as("part_id"), col("component_id"),
          col("component_size"))
        .orderBy(col("part_id"))),

    // Weighted co-purchase centrality (r14 — VERDICT r13 #4): the
    // co-purchase graph's edge weights (distinct-order counts, which
    // the components row thresholds and then discards) carried into
    // PageRank — rank splits across a part's co-purchase partners in
    // proportion to HOW OFTEN they co-occur, the weighted-centrality
    // shape co-occurrence mining ranks bundles with. Edges are the
    // symmetric closure of the undirected pair list (both directions,
    // same weight), so the walk is the natural random walk on the
    // weighted co-occurrence graph. Still all-long floor arithmetic
    // (floor-first contribution split — see pagerankWeighted), so the
    // unrolled-CTE oracle extends verbatim: full DuckDB hash match.
    // The pair frame is persisted here because the symmetric union
    // reads it twice and the pair fan is the expensive stage (handle
    // leaked to the runner's per-query clearCache, the documented
    // convention).
    "graph_pagerank_copurchase" -> ((s, d) => {
      val e = Q.ownPersist(copurchaseEdges(s, d)).df
      val sym = e.select(col("doc_a").as("src"), col("doc_b").as("dst"),
          col("w"))
        .union(e.select(col("doc_b").as("src"), col("doc_a").as("dst"),
          col("w")))
      pagerankWeighted(sym)
        .select(col("node").as("part_id"), col("rank"))
        .orderBy(col("part_id"))
    }),

    // Weighted PERSONALIZED PageRank (r15 — VERDICT r14 #1): the
    // seeds and weighted flags COMPOSED over the co-purchase graph —
    // ten anchor parts (the graph's smallest part ids, a pure function
    // of the corpus like sim_topk's probe rule) receive all teleport
    // and dangling mass, and rank flows outward ∝ co-purchase counts:
    // "which bundles sit closest, by weighted co-occurrence, to this
    // probe set" — the seeded-relevance expansion over a weighted
    // co-occurrence graph that retrieval curation runs. Same persisted
    // pair fan and symmetric union as the uniform/weighted siblings;
    // the seed frame is 10 rows off the same spine (TakeOrdered, no
    // global sort). Full DuckDB oracle: pagerankSql with BOTH seedsSql
    // and weighted set — every term still a floor division or product
    // of non-negative longs.
    "graph_ppr_weighted" -> ((s, d) => {
      val e = Q.ownPersist(copurchaseEdges(s, d)).df
      val sym = e.select(col("doc_a").as("src"), col("doc_b").as("dst"),
          col("w"))
        .union(e.select(col("doc_b").as("src"), col("doc_a").as("dst"),
          col("w")))
      val seeds = sym.select(col("src").as("node")).distinct()
        .orderBy(col("node")).limit(10)
      pagerankSeededWeighted(sym, seeds)
        .select(col("node").as("part_id"), col("rank"))
        .orderBy(col("part_id"))
    }),

    // Multi-source hop distance (r15 — VERDICT r14 #4): BFS from the
    // SAME ten anchor parts graph_ppr_weighted ranks from, over the
    // same symmetric co-purchase graph — the pair of rows is the
    // link-distance + seeded-rank signal stack curation pipelines
    // combine (PPR decays with distance; BFS reports the distance
    // itself, −1 for parts in other components). Pure integer output;
    // the oracle is a recursive-CTE min-hop fixpoint capped at
    // BfsMaxHops, hash-matched including the unreached sentinel.
    "graph_bfs_seeds" -> ((s, d) => {
      val e = Q.ownPersist(copurchaseEdges(s, d)).df
      val sym = e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val seeds = sym.select(col("src").as("node")).distinct()
        .orderBy(col("node")).limit(10)
      bfsFrom(sym, seeds)
        .select(col("node").as("part_id"), col("dist"))
        .orderBy(col("part_id"))
    }))

  /** Shared body of the graph_components_* rows: threshold the edge
    * list at [[Similarity.NeardupCos]], run the shared CC fixpoint,
    * and complete the verdict over EVERY vector (singletons = self).
    * The size window partitions by component_id — never global. */
  private def componentsOver(edges: DataFrame, emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = edges
      .filter(col("cos_sim") >= Similarity.NeardupCos)
      .select(least(col("src"), col("dst")).as("doc_a"),
        greatest(col("src"), col("dst")).as("doc_b"))
      .distinct()
    val cc = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("vec_id"), col("component_id"))
    emb.select(col("vec_id"))
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component_id"), col("vec_id")).as("component_id"))
      .select(col("vec_id"), col("component_id"),
        count(lit(1)).over(Window.partitionBy(col("component_id")))
          .as("component_size"))
      .orderBy(col("vec_id"))
  }

  /** Unrolled integer-PageRank CTE chain (DuckDB). CTEs must be
    * MATERIALIZED: DuckDB inlines plain CTEs, and each iteration
    * references the previous one three times, so the inlined tree is
    * 3^iters — the materialization hint is what makes 10 unrolled
    * rounds linear. `edgesSql` must yield distinct BIGINT (src, dst).
    * `extraCtes` (optional) are appended after the rank chain so
    * composed oracles (diversity selection) can post-process r$Iters.
    * `seedsSql` (optional, r12) switches the chain to the PERSONALIZED
    * spelling [[pagerankSeeded]] mirrors: the teleport term becomes
    * per-seed ((15·Scale·n div 100) div n_seeds, preserving the
    * uniform variant's total injected mass) and the dangling term
    * returns to seeds — both spelled with the same floor-division
    * order the Spark arm computes driver-side. With seedsSql empty the
    * generated SQL is byte-identical to the pre-r12 builder (asserted
    * against the committed oracle hashes when the change landed).
    * `weighted` (r14) switches to [[pagerankWeighted]]'s spelling:
    * edgesSql must then also yield a positive BIGINT `w`, outdeg
    * becomes SUM(w), and the contribution is the floor-first product
    * (rank // outdeg) · w. With weighted = false the generated SQL is
    * byte-identical to the r13 builder (the interpolated fragments
    * reproduce the old text exactly — GraphSpec asserts it). */
  private def pagerankSql(edgesSql: String, finalSelect: String,
      extraCtes: String = "", seedsSql: String = "",
      weighted: Boolean = false): String = {
    val seeded = seedsSql.nonEmpty
    val odExpr = if (weighted) "CAST(SUM(w) AS BIGINT)" else "COUNT(*)"
    val contribExpr =
      if (weighted) "(r.rank // i.outdeg) * e.w" else "r.rank // i.outdeg"
    val tele =
      if (seeded) s"CASE WHEN sd.node IS NOT NULL THEN " +
        s"((15 * $Scale * (SELECT n FROM nn)) // 100) // " +
        s"(SELECT c FROM sdc) ELSE 0 END"
      else s"$Teleport"
    def dang(t: Int) =
      if (seeded) s"CASE WHEN sd.node IS NOT NULL THEN " +
        s"(SELECT dm FROM d$t) // (SELECT c FROM sdc) ELSE 0 END"
      else s"(SELECT dm FROM d$t) // (SELECT n FROM nn)"
    val seedJoin = if (seeded) " LEFT JOIN sds sd ON i.node = sd.node" else ""
    val seedCtes =
      if (seeded) s" sds AS MATERIALIZED (SELECT DISTINCT node FROM " +
        s"($seedsSql)),\n sdc AS (SELECT COUNT(*) AS c FROM sds),\n"
      else ""
    val iterCtes = (0 until Iters).map { t =>
      s""" d$t AS MATERIALIZED (SELECT COALESCE(CAST(SUM(r.rank) AS BIGINT), 0) AS dm
         |   FROM r$t r JOIN info i ON r.node = i.node WHERE i.outdeg = 0),
         | c$t AS MATERIALIZED (SELECT e.dst AS node,
         |     CAST(SUM($contribExpr) AS BIGINT) AS s
         |   FROM r$t r JOIN info i ON r.node = i.node AND i.outdeg > 0
         |   JOIN edges e ON e.src = r.node GROUP BY e.dst),
         | r${t + 1} AS MATERIALIZED (SELECT i.node,
         |     $tele + (85 * (COALESCE(c.s, 0)
         |       + ${dang(t)})) // 100 AS rank
         |   FROM info i LEFT JOIN c$t c ON i.node = c.node$seedJoin)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       | nodes AS (SELECT src AS node FROM edges
       |           UNION SELECT dst FROM edges),
       | od AS (SELECT src AS node, $odExpr AS outdeg
       |        FROM edges GROUP BY src),
       | info AS MATERIALIZED (SELECT n.node, COALESCE(o.outdeg, 0) AS outdeg
       |   FROM nodes n LEFT JOIN od o ON n.node = o.node),
       | nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM info),
       |$seedCtes r0 AS MATERIALIZED (SELECT node, CAST($Scale AS BIGINT) AS rank
       |   FROM info),
       |$iterCtes${if (extraCtes.nonEmpty) ",\n" + extraCtes else ""}
       |$finalSelect""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql(
      """SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,
      s"""SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS ntype,
         |  node // 2 AS ref_id, rank
         |FROM r$Iters ORDER BY node""".stripMargin),

    "graph_ppr" -> pagerankSql(
      """SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,
      s"""SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS ntype,
         |  node // 2 AS ref_id, rank
         |FROM r$Iters ORDER BY node""".stripMargin,
      seedsSql =
        "SELECT c_custkey * 2 AS node FROM customer WHERE c_custkey <= 10"),

    "graph_pagerank_knn" -> pagerankSql(
      s"""WITH ${Similarity.knnGraphCtes}
         |SELECT src, dst FROM r WHERE rn <= 3""".stripMargin,
      s"SELECT node AS vec_id, rank FROM r$Iters ORDER BY node"),

    // Same degree-ordered orientation, spelled relationally: und →
    // (deg, ord) → oriented lo→hi → wedge join closed by a third
    // oriented edge; every term is a BIGINT count or floor division.
    "graph_triangles" ->
      s"""WITH ${Similarity.knnGraphCtes},
         | ed AS (SELECT src, dst FROM r WHERE rn <= 3),
         | und AS (SELECT DISTINCT LEAST(src, dst) AS a,
         |                GREATEST(src, dst) AS b
         |         FROM ed WHERE src <> dst),
         | dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM (SELECT a AS node FROM und
         |              UNION ALL SELECT b FROM und) GROUP BY node),
         | info AS (SELECT node, deg,
         |          deg * $OrdScale + node AS ord FROM dg),
         | orient AS (SELECT LEAST(ia.ord, ib.ord) AS lo,
         |                   GREATEST(ia.ord, ib.ord) AS hi
         |            FROM und u
         |            JOIN info ia ON u.a = ia.node
         |            JOIN info ib ON u.b = ib.node),
         | tri AS (SELECT o1.lo AS x, o1.hi AS y, o2.hi AS z
         |         FROM orient o1
         |         JOIN orient o2 ON o1.lo = o2.lo AND o1.hi < o2.hi
         |         JOIN orient o3 ON o3.lo = o1.hi AND o3.hi = o2.hi),
         | tn AS (SELECT x % $OrdScale AS node FROM tri
         |        UNION ALL SELECT y % $OrdScale FROM tri
         |        UNION ALL SELECT z % $OrdScale FROM tri),
         | tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
         |        FROM tn GROUP BY node)
         |SELECT i.node AS vec_id, i.deg AS degree,
         |  COALESCE(tc.tri_cnt, 0) AS tri_cnt,
         |  CASE WHEN i.deg >= 2 THEN
         |    (2 * COALESCE(tc.tri_cnt, 0) * 10000) // (i.deg * (i.deg - 1))
         |  ELSE 0 END AS clust_bp
         |FROM info i LEFT JOIN tc ON i.node = tc.node
         |ORDER BY vec_id""".stripMargin,

    // The composed selection: the pagerank chain post-processed by the
    // near-dup drop (embed_neardup's rounded-cosine predicate, fresh
    // nested CTEs — knnGraphCtes' names are scoped inside the edges
    // CTE) and the survivor-quartile prototype drop (row_number/count
    // windows, ties by vec_id — identical spelling on both engines).
    "graph_diversity_select" -> pagerankSql(
      s"""WITH ${Similarity.knnGraphCtes}
         |SELECT src, dst FROM r WHERE rn <= 3""".stripMargin,
      s"""SELECT b.vec_id, b.rank, b.is_dup,
         |  CAST(CASE WHEN s.rn IS NOT NULL AND s.rn <= s.m // 4
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_proto,
         |  CAST(CASE WHEN b.is_dup = 0 AND s.rn > s.m // 4
         |       THEN 1 ELSE 0 END AS BIGINT) AS selected
         |FROM basev b LEFT JOIN sv s ON b.vec_id = s.vec_id
         |ORDER BY b.vec_id""".stripMargin,
      extraCtes =
        s""" dupv AS MATERIALIZED (
           |   WITH e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           |               FROM embeddings),
           |    n2 AS (SELECT vec_id, emb,
           |      LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> emb[i] * emb[i]))
           |        AS sq
           |     FROM e2)
           |   SELECT DISTINCT b.vec_id AS vec_id
           |   FROM n2 a JOIN n2 b ON a.vec_id < b.vec_id
           |   WHERE ROUND(
           |     LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> a.emb[i] * b.emb[i]))
           |     / (SQRT(a.sq) * SQRT(b.sq)), 4) >= ${Similarity.NeardupCos}),
           | basev AS (SELECT r.node AS vec_id, r.rank,
           |     CASE WHEN d.vec_id IS NULL THEN CAST(0 AS BIGINT)
           |          ELSE CAST(1 AS BIGINT) END AS is_dup
           |   FROM r$Iters r LEFT JOIN dupv d ON r.node = d.vec_id),
           | sv AS (SELECT vec_id,
           |     ROW_NUMBER() OVER (ORDER BY rank DESC, vec_id) AS rn,
           |     COUNT(*) OVER () AS m
           |   FROM basev WHERE is_dup = 0)""".stripMargin),

    // Exact transitive closure (the dedup_components oracle pattern)
    // over knnGraphCtes' thresholded edges, completed to every vector
    // via the LEFT JOIN singleton fallback — DuckDB's recursive-CTE
    // fixpoint must agree vector-for-vector with Spark's label
    // propagation, sizes included.
    "graph_components_knn" ->
      s"""WITH RECURSIVE ${Similarity.knnGraphCtes},
         | ed AS (SELECT DISTINCT LEAST(src, dst) AS a,
         |                GREATEST(src, dst) AS b
         |         FROM r WHERE rn <= 3 AND cos_sim >= ${Similarity.NeardupCos}),
         | sym AS (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
         | rc(a, b) AS (SELECT a, b FROM sym
         |              UNION
         |              SELECT rc.a, sym.b FROM rc JOIN sym ON rc.b = sym.a),
         | lab AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS component_id
         |         FROM rc GROUP BY a),
         | fullv AS (SELECT v.vec_id,
         |             COALESCE(l.component_id, v.vec_id) AS component_id
         |           FROM (SELECT vec_id FROM embeddings) v
         |           LEFT JOIN lab l ON v.vec_id = l.vec_id)
         |SELECT vec_id, component_id,
         |  COUNT(*) OVER (PARTITION BY component_id) AS component_size
         |FROM fullv ORDER BY vec_id""".stripMargin,

    // Weighted chain over the symmetric co-purchase edge set: the same
    // DISTINCT (order, pair) + HAVING >= 2 derivation as the components
    // oracle, with the distinct-order count kept as w and both edge
    // directions emitted (the Spark arm's symmetric union).
    "graph_pagerank_copurchase" -> pagerankSql(
      """WITH pp AS (SELECT DISTINCT a.l_orderkey AS ok,
        |                a.l_partkey AS p1, b.l_partkey AS p2
        |         FROM lineitem a JOIN lineitem b
        |           ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey),
        | te AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS w FROM pp
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p1 AS src, p2 AS dst, w FROM te
        |UNION ALL SELECT p2, p1, w FROM te""".stripMargin,
      s"SELECT node AS part_id, rank FROM r$Iters ORDER BY node",
      weighted = true),

    // The composed chain: the weighted co-purchase edge derivation
    // (identical fragment to graph_pagerank_copurchase's) + the seeded
    // teleport/dangling spelling (identical to graph_ppr's), seeds =
    // the ten smallest nodes of the edge universe (the `edges` CTE is
    // in scope for seedsSql — CTEs see their predecessors).
    "graph_ppr_weighted" -> pagerankSql(
      """WITH pp AS (SELECT DISTINCT a.l_orderkey AS ok,
        |                a.l_partkey AS p1, b.l_partkey AS p2
        |         FROM lineitem a JOIN lineitem b
        |           ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey),
        | te AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS w FROM pp
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p1 AS src, p2 AS dst, w FROM te
        |UNION ALL SELECT p2, p1, w FROM te""".stripMargin,
      s"SELECT node AS part_id, rank FROM r$Iters ORDER BY node",
      seedsSql =
        "SELECT DISTINCT src AS node FROM edges ORDER BY node LIMIT 10",
      weighted = true),

    // Min-hop fixpoint as a recursive CTE: the recursion carries
    // (node, dist) pairs with dist capped at BfsMaxHops, so the row
    // universe is finite on the cyclic graph and UNION-dedup
    // terminates; MIN(dist) per node then equals Spark's
    // first-discovery layer (first discovery IS the min hop). Same
    // DISTINCT-(order, pair) + HAVING >= 2 edge derivation as the
    // other co-purchase oracles; seeds = the ten smallest nodes.
    "graph_bfs_seeds" ->
      s"""WITH RECURSIVE
         | pp AS (SELECT DISTINCT a.l_orderkey AS ok,
         |                a.l_partkey AS p1, b.l_partkey AS p2
         |         FROM lineitem a JOIN lineitem b
         |           ON a.l_orderkey = b.l_orderkey
         |          AND a.l_partkey < b.l_partkey),
         | te AS (SELECT p1, p2 FROM pp
         |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         | sym AS (SELECT p1 AS src, p2 AS dst FROM te
         |         UNION ALL SELECT p2, p1 FROM te),
         | nd AS (SELECT DISTINCT src AS node FROM sym),
         | sd AS (SELECT node FROM nd ORDER BY node LIMIT 10),
         | bfs(node, dist) AS (
         |   SELECT node, 0 FROM sd
         |   UNION
         |   SELECT s.dst, b.dist + 1 FROM bfs b JOIN sym s ON b.node = s.src
         |   WHERE b.dist < $BfsMaxHops),
         | md AS (SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node)
         |SELECT n.node AS part_id,
         |  CAST(COALESCE(md.dist, -1) AS BIGINT) AS dist
         |FROM nd n LEFT JOIN md ON n.node = md.node
         |ORDER BY part_id""".stripMargin,

    // Same transitive-closure spelling over the co-purchase edge set:
    // DISTINCT (order, pair) first so the threshold counts ORDERS, not
    // line pairs (a part can ride two lineitems of one order).
    "graph_components_copurchase" ->
      """WITH RECURSIVE
        | pp AS (SELECT DISTINCT a.l_orderkey AS ok,
        |                a.l_partkey AS p1, b.l_partkey AS p2
        |         FROM lineitem a JOIN lineitem b
        |           ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey),
        | te AS (SELECT p1 AS a, p2 AS b FROM pp
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        | sym AS (SELECT a, b FROM te UNION ALL SELECT b, a FROM te),
        | rc(a, b) AS (SELECT a, b FROM sym
        |              UNION
        |              SELECT rc.a, sym.b FROM rc JOIN sym ON rc.b = sym.a),
        | lab AS (SELECT a AS part_id, LEAST(a, MIN(b)) AS component_id
        |         FROM rc GROUP BY a)
        |SELECT part_id, component_id,
        |  COUNT(*) OVER (PARTITION BY component_id) AS component_size
        |FROM lab ORDER BY part_id""".stripMargin)
}
