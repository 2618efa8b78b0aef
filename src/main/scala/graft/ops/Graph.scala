package graft.ops

import graft.{GraftQuery, Materialize, QueryModule, Sizing, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph traversal — the general recursive-query surface.
  *
  * Spark 4.1's recursive CTEs support only UNION ALL, which diverges on
  * cyclic graphs (the limitation named in SqlRegistrySweepSpec), so the
  * fixpoint shape that a warehouse writes as `WITH RECURSIVE` is provided
  * here as a library operator instead: level-synchronous multi-source BFS
  * over an edge frame. Connected components (ConnectedComponents.run) is
  * the other recursive workhorse; between them they cover the reachability
  * / transitive-closure / hierarchy-walk family.
  *
  * Scale shape: each round is ONE equi-join shuffle (frontier × edges on
  * the source node id) plus one anti-join against the visited set — no
  * driver-side graph state, no adjacency collect. The edge frame is staged
  * once (at 100 TB it would live bucketed on `u`, making the per-round
  * join co-located); the frontier is the only frame that changes, and on
  * high-degree nodes AQE skew-splits the join. Rounds are bounded by
  * min(graph diameter, maxHops) — level-synchronous discovery guarantees
  * the first hop count assigned to a node is its minimum, which is exactly
  * the `MIN(hops) GROUP BY node` a recursive-CTE oracle computes.
  */
object Graph extends QueryModule {

  /** Hop distances from `seeds` along directed `edges`, bounded by
    * `maxHops`.
    *
    * @param edges   directed edge frame, two numeric columns (u, v);
    *                callers symmetrize first for undirected semantics
    * @param seeds   one-column frame of start nodes (may itself be the
    *                result of a query — never collected to the driver)
    * @param maxHops inclusive traversal bound (recursion depth in the
    *                WITH RECURSIVE equivalent)
    * @return (node, hops:int) — every node reachable within maxHops,
    *         hops = minimum hop count (0 for seeds)
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // Staged ONCE, hash-partitioned on the join key: plain stage()
    // (InMemoryRelation) preserves the repartition's HashPartitioning,
    // so every round's frontier-expansion join exchanges ONLY the
    // frontier side and reads the edge cache co-partitioned — without
    // this the (100 TB-scale) edge table re-shuffles every round.
    // stageIterative would cut the plan to a LogicalRDD and LOSE the
    // partitioning; the edge plan is referenced once per round without
    // nesting, so the uncut plan stays analyzer-safe.
    val e = Materialize.stage(edges.toDF("u", "v").repartition(col("u")))
    var dist = Materialize.stageIterative(
      seeds.toDF("node").distinct().select(col("node"), lit(0).cast("int").as("hops")))
    dist.count()
    var frontier = dist
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      // neighbors of the frontier not yet visited get distance `hop`;
      // distinct() before the anti-join so a node reached via many
      // frontier edges shuffles once, not per-edge
      val next = Materialize.stageIterative(
        frontier.join(e, frontier("node") === e("u"))
          .select(e("v").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .select(col("node"), lit(hop).cast("int").as("hops")))
      if (next.isEmpty) {
        exhausted = true
        next.unpersist(blocking = false)
      } else {
        val grown = Materialize.stageIterative(dist.union(next))
        grown.count() // materialize before freeing the frames it reads
        if (!(frontier eq dist)) frontier.unpersist(blocking = false)
        dist.unpersist(blocking = false)
        dist = grown
        frontier = next
      }
    }
    dist
  }

  /** Fixed-point integer PageRank: `iters` damped rounds over directed
    * `edges`, ranks carried as BIGINT pico-units (1e12 = total mass 1).
    *
    * Every operation is integer (floor division via SQL `DIV`, exact
    * long sums), so the result is BIT-EXACT regardless of partitioning
    * or engine — float PageRank cannot be value-compared across
    * engines because double summation is order-dependent. The classic
    * "leaky" formulation: rank' = (1−d)/N + d·Σ_in rank(u) DIV deg(u),
    * dangling mass not redistributed (both sides of the oracle agree
    * by construction; production PageRank tolerates far larger error
    * than the leak).
    *
    * Scale shape: per round, one equi-join shuffle (ranks × edges on
    * the source id — the edge frame is staged once, hash-partitioned
    * on `u`, so only the rank side moves) plus one aggregation on the
    * destination id; the rank frame is O(nodes), never O(edges). N
    * reaches the plan as a broadcast 1-row aggregate — no driver
    * collect. Rounds are a fixed small constant (power iteration
    * converges geometrically; 3–20 in practice).
    */
  def pagerank(edges: DataFrame, iters: Int,
               width: Option[Int] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val UNIT = 1000000000000L // 1e12: rank mass 1.0 in pico-units
    // `width`: sized count for the staged edge exchange — every round's
    // contribution join sorts the edge mass in place (graph_hits's §19
    // pattern); None keeps the engine default for small ad-hoc graphs
    // stageEager, not stage: the first action materializes round 1's
    // contribution join, whose BOTH sides (edge scan and the rank side,
    // which derives from nodes -> e) race to build this lazy cache and
    // serialize on block locks holding task slots — the documented
    // banded-self-join pathology, measured as multi-x run-to-run
    // variance across the graph family (OPTIMIZATION_r11.md).
    val e = Materialize.stageEager(width
      .fold(edges.toDF("u", "v").repartition(col("u")))(n =>
        edges.toDF("u", "v").repartition(n, col("u"))))
    val nodes = Materialize.stageEager(
      e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .distinct())
    val outdeg = Materialize.stage(
      e.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val n1 = nodes.agg(count(lit(1)).as("n")) // 1 row, broadcast below
    var rank = nodes.join(broadcast(n1))
      .select(col("node"), expr(s"${UNIT}L DIV n").as("pr"))
    for (_ <- 1 to iters) {
      val contribs = rank.join(e, rank("node") === e("u"))
        .join(outdeg, Seq("u"))
        .select(col("v").as("node"), expr("pr DIV deg").as("c"))
      val incoming = contribs.groupBy(col("node")).agg(sum(col("c")).as("inc"))
      rank = nodes.join(incoming, Seq("node"), "left")
        .join(broadcast(n1))
        .select(col("node"),
          expr(s"(15 * ${UNIT}L) DIV (100 * n) + (coalesce(inc, 0L) * 85) DIV 100")
            .as("pr"))
    }
    rank
  }

  /** Weighted single-source shortest paths: `rounds` synchronous
    * Bellman-Ford relaxations over directed `edges` (u, v, w) with
    * non-negative integer weights. After k rounds every node holds the
    * exact shortest distance among paths of ≤ k edges — the bounded-
    * horizon contract (matching bfs's maxHops), and the full shortest
    * path once `rounds` ≥ graph diameter. All-integer arithmetic
    * (BIGINT adds, MIN merges), so the result is bit-exact on any
    * engine or partitioning — the property float edge weights can
    * never give.
    *
    * Scale shape: parallel edges collapse to their min weight up front
    * (one edge-key agg); each round is ONE equi-join shuffle (dist ×
    * edges on the source id — the edge frame is staged hash-partitioned
    * on `u`, so only the O(nodes) dist side moves) plus one MIN
    * aggregation on the node id. No driver-side state; rounds is a
    * fixed small constant, so the unrolled plan stays analyzer-cheap
    * without iterative truncation.
    */
  def sssp(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = Materialize.stage(
      edges.toDF("u", "v", "w")
        .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
        .repartition(col("u")))
    var dist = seeds.toDF("node").distinct()
      .select(col("node"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      // by-NAME column references throughout: after round 1 the dist
      // plan embeds the edge frame, so dataset-qualified refs like
      // e("v") trip DetectAmbiguousSelfJoin; the joined frame's column
      // names (node, dist) ⊎ (u, v, w) are disjoint, so names are exact
      val relaxed = dist.join(e, col("node") === col("u"))
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Per-node triangle counts over an undirected simple graph (edges
    * given in either or both directions; self-loops and multi-edges
    * dropped). Returns (node, triangles) for every node in ≥1 triangle.
    *
    * The classic degree-ordered orientation (Cohen 2009 / Suri &
    * Vassilvitskii WWW'11 MapReduce triangle counting): orient each
    * edge from its lower-(degree, id) endpoint to the higher, so every
    * node's out-degree is O(√m); enumerate wedges as two out-edges at
    * their (lowest-rank) apex; close each wedge with one semi-join
    * against the oriented edge set. Each triangle is found exactly
    * once. The wedge fanout Σ outdeg² — the term a naive neighbor join
    * blows up on for hub nodes — is provably minimized by this
    * orientation; the three shuffles (degree agg, wedge join, closing
    * semi-join) are all key-equi with no driver state, so the plan is
    * the one you'd run on a 10¹¹-edge graph.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.toDF("x", "y").filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // staged EAGERLY once: the wedge self-join's two sides are
    // concurrent first consumers — a lazy cache makes them race to
    // build the same partitions (multi-x variance); eager builds once
    val oriented = Materialize.stageEager(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg")))
    val e1 = oriented.toDF("srcA", "v", "dv")
    val e2 = oriented.toDF("srcB", "w", "dw")
    val wedges = e1.join(e2, e1("srcA") === e2("srcB") &&
        (e1("dv") < e2("dw") ||
          (e1("dv") === e2("dw") && e1("v") < e2("w"))))
      .select(col("srcA").as("apex"), col("v"), col("w"))
    // the closing edge is oriented v→w (v is the lower-rank endpoint by
    // the wedge ordering above), so one semi-join closes every wedge
    val tri = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    tri.select(col("apex").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }


  /** The co-line adjacency every registered graph query walks: parts on
    * ADJACENT lines of the same order (sparser than all-pairs
    * co-purchase, whose edge count is Σ k² per order). One definition —
    * the ln+1 window and the u ≠ v guard live HERE only; `weighted`
    * adds the destination line's quantity as an integer edge weight.
    */
  private[graft] def coLineAdj(s: SparkSession, d: String,
                        weighted: Boolean = false): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
    // Sizing seam: the self-join's two exchanges carry the whole
    // lineitem projection, and EVERY graph query pays them — at the
    // 250× rung the default-width (32-task) sort-merge join was the
    // single biggest graph spill (19.3 GB, SCALE.md §19). Both sides
    // pin a width sized to the EXACT row count (a parquet
    // footer-metadata count, no data pages move) × the ~96 B/row both
    // UnsafeRow sides put into one join task — the scan ESTIMATE
    // under-sizes here by the parquet-compression factor (~6 B/row on
    // disk vs 48 B shuffled). The pin must name the join's FULL key
    // tuple in order — (ok, ln+1) / (ok2, ln2) — because co-partition
    // checks require all cluster keys
    // (spark.sql.requireAllClusterKeysForCoPartition): a hash(ok)-only
    // pin was rewritten back to the conf width in place, measured as an
    // unchanged 9.7 GB spill. Floor-clamped to the engine default at
    // test scale (plan unchanged where the oracles run).
    val n = Sizing.partitionsForRows(s, liRowCount(s, d), 96)
    val a = li.toDF("ok", "ln", "u", "q")
      .repartition(n, col("ok"), col("ln") + lit(1))
    val b = li.toDF("ok2", "ln2", "v", "qv")
      .repartition(n, col("ok2"), col("ln2"))
    val adj = a.join(b,
      a("ok") === b("ok2") && b("ln2") === a("ln") + lit(1) &&
        a("u") =!= b("v"))
    if (weighted) adj.select(col("u"), col("v"), col("qv").cast("long").as("w"))
    else adj.select(col("u"), col("v"))
  }

  /** Exact lineitem row count for this dir — a parquet footer-metadata
    * aggregate (zero data pages), memoized per dir so the graph family's
    * repeated `coLineAdj`/`edgeWidth` calls pay it once per corpus.
    */
  private val liRows = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def liRowCount(s: SparkSession, d: String): Long =
    liRows.computeIfAbsent(d, _ => Tables.lineitem(s, d).count()).longValue

  /** Width for an exchange carrying the co-line EDGE mass (≈ one edge
    * per lineitem row) — shared by the downstream edge-dedup/symmetrize
    * exchanges that would otherwise re-exchange the edge stream at the
    * engine default (9.9 GB of 32-task distinct spill at 250×, §19).
    */
  private def edgeWidth(s: SparkSession, d: String): Int =
    Sizing.partitionsForRows(s, liRowCount(s, d), 48)

  override def queries: Seq[GraftQuery] = Seq(

    // ───── bounded reachability over a derived co-line graph ─────
    // Parts are linked when they sit on ADJACENT lines of the same order
    // (sparser than the all-pairs co-purchase graph, whose edge count is
    // Σ k² per order); hop distances from the smallest part key, 4 hops.
    // The oracle is the textbook WITH RECURSIVE walk — the exact query a
    // warehouse user would write, runnable in DuckDB but not Spark SQL
    // (UNION-distinct recursion), which is why the operator exists.
    GraftQuery(
      "graph_reach",
      (s, d) => {
        val adj = coLineAdj(s, d)
        val undirected = adj.union(adj.select(col("v").as("u"), col("u").as("v")))
        val seeds = Tables.lineitem(s, d)
          .agg(min(col("l_partkey")).as("node"))
        bfs(undirected, seeds, maxHops = 4)
          .select(col("node").as("part"), col("hops"))
          .orderBy(col("part"))
      },
      Some("""
        WITH RECURSIVE adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey
        ),
        edges AS (SELECT u, v FROM adj UNION ALL SELECT v AS u, u AS v FROM adj),
        seed AS (SELECT MIN(l_partkey) AS node FROM lineitem),
        walk(node, hops) AS (
          SELECT node, 0 FROM seed
          UNION
          SELECT e.v, w.hops + 1 FROM walk w JOIN edges e ON e.u = w.node
          WHERE w.hops < 4
        )
        SELECT node AS part, CAST(MIN(hops) AS INT) AS hops
        FROM walk GROUP BY node ORDER BY part
      """)),

    // ───── fixed-point PageRank over the directed co-line graph ─────
    // 3 damped power-iteration rounds in BIGINT pico-units: every step
    // is integer floor division / exact long summation, so Spark and
    // DuckDB agree bit-for-bit (float PageRank is order-dependent and
    // can never hash-match). The oracle is the SAME recurrence unrolled
    // as plain SQL — no recursion needed for a fixed iteration count,
    // so this one ALSO runs in the Spark SQL sweep.
    GraftQuery(
      "graph_pagerank",
      (s, d) => {
        val adj = coLineAdj(s, d)
        pagerank(adj, iters = 3, width = Some(edgeWidth(s, d)))
          .select(col("node").as("part"), col("pr"))
          .orderBy(col("part"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        nodes AS (SELECT u AS node FROM adj UNION SELECT v AS node FROM adj),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        outdeg AS (SELECT u, COUNT(*) AS deg FROM adj GROUP BY u),
        r0 AS (SELECT node, 1000000000000 // n AS pr
               FROM nodes CROSS JOIN nn),
        s1 AS (SELECT e.v AS node, CAST(SUM(r.pr // d.deg) AS BIGINT) AS inc
               FROM r0 r JOIN adj e ON e.u = r.node
               JOIN outdeg d ON d.u = e.u GROUP BY e.v),
        r1 AS (SELECT nd.node, 15000000000000 // (100 * n) +
                      (COALESCE(s.inc, 0) * 85) // 100 AS pr
               FROM nodes nd CROSS JOIN nn
               LEFT JOIN s1 s ON s.node = nd.node),
        s2 AS (SELECT e.v AS node, CAST(SUM(r.pr // d.deg) AS BIGINT) AS inc
               FROM r1 r JOIN adj e ON e.u = r.node
               JOIN outdeg d ON d.u = e.u GROUP BY e.v),
        r2 AS (SELECT nd.node, 15000000000000 // (100 * n) +
                      (COALESCE(s.inc, 0) * 85) // 100 AS pr
               FROM nodes nd CROSS JOIN nn
               LEFT JOIN s2 s ON s.node = nd.node),
        s3 AS (SELECT e.v AS node, CAST(SUM(r.pr // d.deg) AS BIGINT) AS inc
               FROM r2 r JOIN adj e ON e.u = r.node
               JOIN outdeg d ON d.u = e.u GROUP BY e.v),
        r3 AS (SELECT nd.node, 15000000000000 // (100 * n) +
                      (COALESCE(s.inc, 0) * 85) // 100 AS pr
               FROM nodes nd CROSS JOIN nn
               LEFT JOIN s3 s ON s.node = nd.node)
        SELECT node AS part, pr FROM r3 ORDER BY part
      """)),

    // ───── one message-passing round: neighbor feature aggregation ─────
    // The GraphSAGE/GCN layer shape on an engine: every node aggregates
    // its in-neighbors' feature (here the part's total shipped
    // quantity, integer cents) into (count, sum, integer mean) — ONE
    // join shuffle (features × edges on the source id) + one
    // aggregation on the destination id, the exact dataflow a
    // distributed GNN featurizer runs per layer; stacking L layers = L
    // such rounds. All-integer, so the round is bit-exact on any
    // engine or partitioning. At 100 TB the edge frame is the big
    // side and shuffles once per layer on its join key; features are
    // O(nodes) and move with map-side combine.
    GraftQuery(
      "graph_neighbor_agg",
      (s, d) => {
        val adj = coLineAdj(s, d)
        val feat = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("node"))
          .agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)")
            .as("f"))
        adj.join(feat, adj("u") === feat("node"))
          .groupBy(col("v").as("part"))
          .agg(count(lit(1)).as("n_in"), sum(col("f")).as("sum_in"))
          .select(col("part"), col("n_in"), col("sum_in"),
            expr("sum_in DIV n_in").as("mean_in"))
          .orderBy(col("part"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        feat AS (
          SELECT l_partkey AS node,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS f
          FROM lineitem GROUP BY l_partkey)
        SELECT adj.v AS part, COUNT(*) AS n_in,
               CAST(SUM(feat.f) AS BIGINT) AS sum_in,
               CAST(SUM(feat.f) AS BIGINT) // COUNT(*) AS mean_in
        FROM adj JOIN feat ON feat.node = adj.u
        GROUP BY adj.v ORDER BY part
      """)),

    // ───── native recursive CTE: per-order chain walk ─────
    // Spark 4.1 DOES run WITH RECURSIVE … UNION ALL (what it cannot run
    // is UNION-distinct recursion — the cycle-termination form the
    // dialectExceptions document); this query exercises that surface
    // end-to-end as LITERAL SQL on both engines: walk each order's
    // line-number chain from line 1, accumulating quantity in integer
    // cents. Recursion depth = max lines per order (7 in TPC-H), far
    // under the engine's recursion limit, and the anchor/step are plain
    // equi-joins — each recursion level is one shuffle of the frontier
    // against the staged lineitem view, the same per-round shape as
    // bfs(). Acyclic by construction (ln strictly increases), so UNION
    // ALL terminates on both engines. Semantically this equals the
    // running-sum window (win_running_sum's shape) — the point is the
    // RECURSIVE SPELLING: a warehouse client's hierarchy walk runs
    // unmodified.
    GraftQuery(
      "graph_chain_walk",
      (s, d) => {
        // staged once: every recursion level joins the frontier against
        // this view, and without the cache each level re-scans parquet.
        // A PRIVATE view name — replacing the catalog's `lineitem` view
        // with this 3-column projection would silently narrow the table
        // for every later literal-SQL consumer in the same session
        Materialize.stage(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
          .createOrReplaceTempView("graft_walk_lineitem")
        // the recursion ROW limit is sized engine-wide in GraftSession
        // (the 1M debug default trips at 10× sf0.1 already; a per-query
        // conf.set would leak to the shared session)
        s.sql("""
          WITH RECURSIVE walk AS (
            SELECT l_orderkey AS o_orderkey, l_linenumber,
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cum_qty_cents
            FROM graft_walk_lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT w.o_orderkey, l.l_linenumber,
                   w.cum_qty_cents +
                     CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM walk w JOIN graft_walk_lineitem l
              ON l.l_orderkey = w.o_orderkey
             AND l.l_linenumber = w.l_linenumber + 1)
          SELECT o_orderkey, l_linenumber, cum_qty_cents
          FROM walk ORDER BY o_orderkey, l_linenumber
        """)
      },
      Some("""
        WITH RECURSIVE walk AS (
          SELECT l_orderkey AS o_orderkey, l_linenumber,
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cum_qty_cents
          FROM lineitem WHERE l_linenumber = 1
          UNION ALL
          SELECT w.o_orderkey, l.l_linenumber,
                 w.cum_qty_cents +
                   CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
          FROM walk w JOIN lineitem l
            ON l.l_orderkey = w.o_orderkey
           AND l.l_linenumber = w.l_linenumber + 1)
        SELECT o_orderkey, l_linenumber, cum_qty_cents
        FROM walk ORDER BY o_orderkey, l_linenumber
      """)),

    // ───── weighted shortest paths over the co-line graph ─────
    // 3 Bellman-Ford rounds from the smallest part key, edge weight =
    // the destination line's quantity (an integral double in TPC-H —
    // cast to BIGINT so every relaxation is exact integer math). The
    // oracle is the same recurrence unrolled as plain SQL — like
    // graph_pagerank it needs no recursion for a fixed horizon, so it
    // ALSO runs in the Spark SQL sweep. Distances after k rounds =
    // exact min over ≤k-edge paths, the bounded-horizon contract that
    // makes a fixed-round answer well-defined (a fixpoint oracle would
    // disagree wherever the diameter exceeds the horizon).
    GraftQuery(
      "graph_sssp",
      (s, d) => {
        val adj = coLineAdj(s, d, weighted = true)
        val seeds = Tables.lineitem(s, d)
          .agg(min(col("l_partkey")).as("node"))
        sssp(adj, seeds, rounds = 3)
          .select(col("node").as("part"), col("dist"))
          .orderBy(col("part"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v,
                 CAST(b.l_quantity AS BIGINT) AS w
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        e AS (SELECT u, v, MIN(w) AS w FROM adj GROUP BY u, v),
        d0 AS (SELECT MIN(l_partkey) AS node, CAST(0 AS BIGINT) AS dist
               FROM lineitem),
        r1 AS (SELECT node, MIN(dist) AS dist FROM (
                 SELECT node, dist FROM d0
                 UNION ALL
                 SELECT e.v AS node, d.dist + e.w AS dist
                 FROM d0 d JOIN e ON e.u = d.node) GROUP BY node),
        r2 AS (SELECT node, MIN(dist) AS dist FROM (
                 SELECT node, dist FROM r1
                 UNION ALL
                 SELECT e.v AS node, d.dist + e.w AS dist
                 FROM r1 d JOIN e ON e.u = d.node) GROUP BY node),
        r3 AS (SELECT node, MIN(dist) AS dist FROM (
                 SELECT node, dist FROM r2
                 UNION ALL
                 SELECT e.v AS node, d.dist + e.w AS dist
                 FROM r2 d JOIN e ON e.u = d.node) GROUP BY node)
        SELECT node AS part, dist FROM r3 ORDER BY part
      """)),

    // ───── degree-oriented triangle counting on the co-line graph ─────
    // Per-part triangle participation counts. The operator orients edges
    // low-rank→high-rank so wedge fanout is bounded (no hub blowup); the
    // oracle is the textbook x<y<z three-way self-join, which counts
    // each triangle once — per-node counts are scheme-independent, so
    // the two formulations must agree exactly.
    GraftQuery(
      "graph_triangles",
      (s, d) => {
        val adj = coLineAdj(s, d)
        triangles(adj)
          .select(col("node").as("part"), col("triangles"))
          .orderBy(col("part"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        ce AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
          FROM adj),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM ce e1
          JOIN ce e2 ON e2.a = e1.b
          JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
        pern AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        SELECT node AS part, COUNT(*) AS triangles
        FROM pern GROUP BY node ORDER BY part
      """)),

    // ───── partition-quality metric: directed modularity by brand ─────
    // Newman modularity of a GIVEN node partition (here p_brand) over the
    // co-line graph — the evaluation metric for any community assignment
    // (the detection side lives in dedup_clusters/ConnectedComponents;
    // this scores a labeling without iterating). Directed multigraph
    // form: Q = (1/m)·Σ_c [e_c − dout_c·din_c/m], held exactly as
    // q_num_c = m·e_c − dout_c·din_c per community (DECIMAL(38,0): at
    // 10¹² edges the degree product squares past int64), ONE double
    // division per row for the contribution. Σ_c q_contrib = Q — the
    // spec pins it against a driver brute force; a positive Q means
    // orders co-locate same-brand parts more than degree chance.
    //
    // Scale shape: two broadcast label joins (part is a dimension) onto
    // the edge frame, then three count aggregates on the ≤|communities|
    // domain merged by full outer join — every shuffle after the label
    // join carries community keys, not edges. The 1-row m scalar rides
    // the watermark-filter broadcast pattern.
    GraftQuery(
      "graph_modularity",
      (s, d) => {
        val lab = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))
        val e = coLineAdj(s, d)
          .join(broadcast(lab.toDF("uk", "cu")), col("u") === col("uk"))
          .join(broadcast(lab.toDF("vk", "cv")), col("v") === col("vk"))
          .select(col("cu"), col("cv"))
        // ONE edge-scale shuffle: the (cu, cv) pair counts (≤|C|² rows,
        // partial-agg combined). m / e_in / dout / din all derive from
        // this metadata-class frame — deriving them from `e` directly
        // would recompute the co-line join per aggregate branch
        // (measured 4× shuffle-read vs write at 10×)
        val pair = e.groupBy(col("cu"), col("cv")).agg(count(lit(1)).as("n"))
        val m = pair.agg(sum(col("n")).as("m"))
        val eIn = pair.filter(col("cu") === col("cv"))
          .groupBy(col("cu").as("community")).agg(sum(col("n")).as("e_in"))
        val dOut = pair.groupBy(col("cu").as("community"))
          .agg(sum(col("n")).as("dout"))
        val dIn = pair.groupBy(col("cv").as("community"))
          .agg(sum(col("n")).as("din"))
        dOut.join(dIn, Seq("community"), "full_outer")
          .join(eIn, Seq("community"), "full_outer")
          .select(col("community"),
            coalesce(col("e_in"), lit(0L)).as("e_in"),
            coalesce(col("dout"), lit(0L)).as("dout"),
            coalesce(col("din"), lit(0L)).as("din"))
          .crossJoin(broadcast(m))
          .select(col("community"), col("m"), col("e_in"), col("dout"),
            col("din"),
            (col("m").cast(DecimalType(38, 0)) * col("e_in") -
              col("dout").cast(DecimalType(38, 0)) * col("din"))
              .cast("double").as("q_num"))
          .withColumn("q_contrib",
            col("q_num") / (col("m").cast("double") * col("m").cast("double")))
          .orderBy(col("community"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        e AS (
          SELECT pu.p_brand AS cu, pv.p_brand AS cv
          FROM adj JOIN part pu ON adj.u = pu.p_partkey
                   JOIN part pv ON adj.v = pv.p_partkey),
        mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
        ein AS (
          SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS e_in
          FROM e WHERE cu = cv GROUP BY cu),
        dout AS (
          SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS dout
          FROM e GROUP BY cu),
        din AS (
          SELECT cv AS community, CAST(COUNT(*) AS BIGINT) AS din
          FROM e GROUP BY cv),
        j AS (
          SELECT community,
                 COALESCE(e_in, 0) AS e_in,
                 COALESCE(dout, 0) AS dout,
                 COALESCE(din, 0) AS din
          FROM dout
          FULL OUTER JOIN din USING (community)
          FULL OUTER JOIN ein USING (community))
        SELECT community, m, e_in, dout, din,
               CAST(CAST(m AS HUGEINT) * e_in -
                    CAST(dout AS HUGEINT) * din AS DOUBLE) AS q_num,
               CAST(CAST(m AS HUGEINT) * e_in -
                    CAST(dout AS HUGEINT) * din AS DOUBLE) /
                 (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS q_contrib
        FROM j CROSS JOIN mt
        ORDER BY community
      """)),

    // ───── k-core: the degeneracy peel — who survives dense-subgraph cut ─────
    // The robustness screen a graph pipeline runs before community or
    // embedding work: repeatedly delete every node with degree < k until
    // none remains; what survives is the k-core (Seidman 1983), the
    // maximal subgraph of minimum degree k. k = 20 sits just under this
    // graph's degeneracy (k = 21 dissolves it entirely at sf0.01), so
    // the peel cascades through a genuinely deep round ladder (14 rounds
    // at sf0.01) rather than terminating trivially.
    //
    // Round spelling is chosen for the ORACLE's sake: each round keeps
    // the edges whose BOTH endpoint degrees (two COUNT windows over the
    // symmetrized edge list — deg(v) is v's row count as a source, by
    // symmetry) are ≥ k. That references the previous round exactly
    // ONCE, so the unrolled oracle is a LINEAR chain of CTEs — the
    // textbook peel ("bad nodes" anti-joined twice) references it three
    // times and explodes exponentially under CTE inlining. The Spark
    // side peels the same rounds DELTA-DEGREE (see [[kcore]]): degrees
    // are aggregated once, then maintained by subtracting each round's
    // frontier-incident edge counts — the same fixpoint, reached with
    // one cached-edge pass per round instead of the oracle's full
    // re-windows (driver convergence loop, plan truncated per round via
    // stageIterative); the oracle unrolls 18 rounds — fixpoint + margin
    // at sf0.01, and extra rounds past convergence are identities.
    //
    // Scale: ONE full-edge exchange total (the initial degree
    // aggregate); per round, one scan of the cached edge frame against
    // the broadcast frontier whose aggregate carries only the
    // frontier-incident edges, plus node-sized maintenance joins — the
    // edge mass is never re-exchanged and never rewritten. No driver
    // state beyond the one convergence count per round, nothing
    // quadratic. At 10¹¹ edges the same loop runs with the edge frame
    // bucketed on u so the initial degree aggregate is exchange-free.
    GraftQuery(
      "graph_k_core",
      (s, d) => {
        val adj = coLineAdj(s, d)
        kcore(adj, k = 20, width = Some(edgeWidth(s, d)))
          .select(col("u").as("part"), col("core_deg"))
          .orderBy(col("part"))
      },
      Some {
        val k = 20
        val rounds = (1 to 18).map { r =>
          s"""e$r AS (
            SELECT u, v FROM (
              SELECT u, v,
                     COUNT(*) OVER (PARTITION BY u) AS du,
                     COUNT(*) OVER (PARTITION BY v) AS dv
              FROM e${r - 1}) t$r
            WHERE du >= $k AND dv >= $k)"""
        }.mkString(",\n")
        s"""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        und AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM adj),
        e0 AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL
          SELECT b AS u, a AS v FROM und),
        $rounds
        SELECT u AS part, CAST(COUNT(*) AS BIGINT) AS core_deg
        FROM e18 GROUP BY u ORDER BY part
      """
      }),

    // ───── synchronous label propagation: community detection ─────
    // Raghavan et al. 2007, the linear-time community detector every
    // graph warehouse ships: init label(v)=v, then K synchronous rounds
    // of label(v) ← the most frequent label among v's neighbors
    // (tie-break: smallest label — float-free, order-free, so the round
    // is bit-identical on any engine or partitioning). 3 fixed rounds,
    // the async/convergent variant being order-dependent by definition.
    //
    // Scale: the edge mass exchanges ONCE — the symmetric edge frame
    // stages hash-partitioned on the join key v (sized via edgeWidth),
    // so every round's (edge ⋈ label) join reuses the cached layout and
    // only the node-sized label frame moves. Per round that leaves one
    // (node, label) count aggregate plus a per-node argmax as a HASH
    // aggregate (max(struct(c, -label)) — no sort anywhere in the
    // round), and the staged label frame keeps round N's plan from
    // re-running rounds 1..N-1.
    // The oracle unrolls the same recurrence: each round references the
    // previous label table exactly ONCE, so the CTE chain stays linear
    // under inlining (the k-core lesson).
    GraftQuery(
      "graph_label_propagation",
      (s, d) => {
        val adj = coLineAdj(s, d)
        labelPropagation(adj, rounds = 3, width = Some(edgeWidth(s, d)))
          .select(col("node").as("part"), col("label"))
          .orderBy(col("part"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""c$r AS (
            SELECT e.u, l.label, CAST(COUNT(*) AS BIGINT) AS c
            FROM e0 e JOIN l${r - 1} l ON l.node = e.v
            GROUP BY e.u, l.label),
          l$r AS (
            SELECT u AS node, label FROM (
              SELECT u, label,
                     ROW_NUMBER() OVER (PARTITION BY u
                       ORDER BY c DESC, label ASC) AS rn
              FROM c$r) t$r
            WHERE rn = 1)"""
        }.mkString(",\n")
        s"""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        und AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM adj),
        e0 AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL
          SELECT b AS u, a AS v FROM und),
        l0 AS (SELECT DISTINCT u AS node, u AS label FROM e0),
        $rounds
        SELECT node AS part, label FROM l3 ORDER BY part
      """
      }),

    // ───── Jaccard link prediction over 2-hop candidates ─────
    // The classic "users also bought" / link-prediction score: for every
    // NON-adjacent pair (u, v) sharing at least one neighbor, Jaccard =
    // |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in exact ppm (integer floor
    // division — no floats anywhere). Candidates come from WEDGES
    // (u—w—v), so only pairs with a witness are ever materialized —
    // never the n² pair space — and the wedge fan-out is bounded by a
    // mid-degree cap (deg(w) ≤ 64, stated identically in both engines):
    // Σ_w deg(w)² ≤ cap·m, the same celebrity-node bound the dedup
    // family uses. cn therefore counts CAPPED witnesses (documented
    // contract) while |∪| uses the true degrees. Top-50 by (score DESC,
    // u, v) via a TakeOrdered heap — no global sort.
    GraftQuery(
      "graph_jaccard_links",
      (s, d) => {
        val adj = coLineAdj(s, d)
        // the edge dedup re-exchanges the whole edge stream: pin the
        // sized width (9.9 GB of 32-task distinct spill at 250×, §19)
        val und = Materialize.stage(adj
          .select(least(col("u"), col("v")).as("a"),
            greatest(col("u"), col("v")).as("b"))
          .repartition(edgeWidth(s, d), col("a"), col("b"))
          .distinct())
        val sym = Materialize.stage(
          und.select(col("a").as("u"), col("b").as("v"))
            .union(und.select(col("b").as("u"), col("a").as("v"))))
        val deg = Materialize.stage(
          sym.groupBy(col("u")).agg(count(lit(1)).as("deg")))
        // `spark.graft.graph.wedgeCap` overrides the mid-degree cap (the
        // oracle pins the default 64; Verify refuses the knob). `auto`
        // derives it from the degree distribution's own tail (AutoKnob
        // scaladoc): 2 × p99(deg), floor 8 — mids inside twice the
        // 99th-percentile degree are normal graph mass, beyond it the
        // celebrity tail whose deg² wedge term the cap exists to bound.
        // The pre-aggregate rides the already-staged degree frame.
        val capRaw = s.conf.get("spark.graft.graph.wedgeCap", "").trim
        val wedgeCap =
          if (capRaw.isEmpty) 64
          else if (capRaw == "auto")
            AutoKnob.fromP99(deg, "deg", mult = 2, floor = 8, fallback = 64)
          else {
            val c = capRaw.toIntOption.getOrElse(sys.error(
              s"spark.graft.graph.wedgeCap must be a positive int or " +
                s"'auto', got '$capRaw'"))
            require(c >= 1, s"spark.graft.graph.wedgeCap must be >= 1, got $c")
            c
          }
        val capped = deg.filter(col("deg") <= lit(wedgeCap))
        // Sizing seam (SCALE.md §4b): the self-join emits exactly
        // Σ_w C(deg(w), 2) wedge pairs, and at the 100× rung the default
        // 32-partition aggregation of that stream spilled 265 GB — 83 GB
        // in the partial aggregate's sort fallback and 111 GB AGAIN in
        // the final (the hash maps overflow on both sides of the
        // exchange, so map-side combine was costing more IO than the
        // 6× shuffle reduction it bought). The pair mass is exact and
        // metadata-cheap (1-row aggregate over the staged degree frame,
        // bounded by cap·m), so instead: shuffle the RAW pair stream
        // ONCE, hash(u, v) at a width sized to the mass, and aggregate
        // exactly once on the sized side — no sort fallback anywhere,
        // streaming map tasks, and each reduce task's hash map is
        // bounded by the byte target. The staged wedge frame itself pins
        // hash(w, n) so both self-join sides read it co-partitioned at
        // the same width (join CPU ∝ pair mass — width must scale with
        // it, not with cores).
        val wedgeMass = Option(
          capped.agg(sum(expr("deg * (deg - 1) div 2")).as("wm"))
            .first().getAs[java.lang.Long]("wm"))
          .map(_.longValue).getOrElse(0L)
        // 48 B/pair: two 8 B longs + UnsafeRow header + agg-map pointer
        val n = Sizing.partitionsForRows(s, wedgeMass, 48)
        // wedges through capped mid nodes only: the staged frame is
        // self-joined on w, so the quadratic term is per-mid-bucket
        // capped is the node DIMENSION (≤ part universe, 8 B/row) — the
        // build join must broadcast it, like the degree joins below: the
        // estimate-driven planner was instead exchanging the whole edge
        // mass on w at the conf width (9.9 GB of 32-task SMJ sort spill
        // at the 250× rung, §19)
        val wed = Materialize.stageEager(
          sym.select(col("u").as("w"), col("v").as("x"))
            .join(broadcast(capped.select(col("u").as("w"))), Seq("w"))
            .repartition(n, col("w")))
        val pairs = wed.as("l").join(wed.as("r"),
            col("l.w") === col("r.w") && col("l.x") < col("r.x"))
          .select(col("l.x").as("u"), col("r.x").as("v"))
          .repartition(n, col("u"), col("v"))
          .groupBy(col("u"), col("v"))
          .agg(count(lit(1)).as("cn"))
        // Tail discipline: the cn frame is the pair mass — it must never
        // re-exchange at the engine default (measured 32+39 GB of SMJ
        // sort spill at the 100× rung doing exactly that). The anti-join
        // reads it in place (cn is already hash(u, v, n); the edge side
        // pins the SAME width so co-partitioning needs no negotiation),
        // and the two degree joins BROADCAST: deg is the node dimension
        // — bounded by the part universe, ~16 B/node — so the pair mass
        // crosses zero further exchanges between the aggregate and the
        // TakeOrdered heap. (A graph whose node set outgrows broadcast
        // would swap these for sized hash(u)/hash(v) repartitions — the
        // same seam, one line each.)
        pairs
          .join(und.repartition(n, col("a"), col("b")),
            pairs("u") === und("a") && pairs("v") === und("b"),
            "left_anti")
          .join(broadcast(deg.select(col("u"), col("deg").as("du"))), Seq("u"))
          .join(broadcast(deg.select(col("u").as("v"), col("deg").as("dv"))),
            Seq("v"))
          .select(col("u"), col("v"), col("cn"),
            (col("du") + col("dv") - col("cn")).as("uni"),
            expr("cn * 1000000L div (du + dv - cn)").as("jacc_ppm"))
          .orderBy(col("jacc_ppm").desc, col("u").asc, col("v").asc)
          .limit(50)
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        und AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM adj),
        sym AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL
          SELECT b AS u, a AS v FROM und),
        deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u),
        wed AS (
          SELECT s.u AS w, s.v AS x FROM sym s
          JOIN (SELECT u AS w FROM deg WHERE deg <= 64) m ON m.w = s.u),
        pr AS (
          SELECT l.x AS u, r.x AS v, CAST(COUNT(*) AS BIGINT) AS cn
          FROM wed l JOIN wed r ON l.w = r.w AND l.x < r.x
          GROUP BY l.x, r.x),
        cand AS (
          SELECT p.u, p.v, p.cn FROM pr p
          LEFT JOIN und e ON e.a = p.u AND e.b = p.v
          WHERE e.a IS NULL),
        sc AS (
          SELECT c.u, c.v, c.cn,
                 du.deg + dv.deg - c.cn AS uni,
                 (c.cn * 1000000) // (du.deg + dv.deg - c.cn) AS jacc_ppm
          FROM cand c
          JOIN deg du ON du.u = c.u
          JOIN deg dv ON dv.u = c.v)
        SELECT u, v, cn, uni, jacc_ppm FROM sc
        ORDER BY jacc_ppm DESC, u ASC, v ASC LIMIT 50
      """)),

    // ───── HITS hubs/authorities — the second eigenvector family ─────
    // Kleinberg's HITS over the directed co-line graph: authority =
    // in-mass of hub scores, hub = out-mass of authority scores, two
    // mutual power-iteration rounds. PageRank (above) normalizes by
    // construction (the damping redistribution preserves total mass);
    // HITS does NOT — unnormalized scores square per half-round
    // (deg²·10¹² after one round, deg⁴ after two: int64 dies) — so each
    // half-round MAX-normalizes back to the 10¹² unit, the classic
    // L∞ HITS variant whose ranking fixpoint equals the L2 textbook
    // form's. The max is a 1-row broadcast scalar (watermark-filter
    // pattern, same as pagerank's node-count frame); the per-node raw
    // sums accumulate directly in DECIMAL(38,0)/HUGEINT (scores are
    // ≤10¹², so a BIGINT sum would cap safe in-degree at ~9.2·10⁶ —
    // real graphs exceed that) and the raw·10¹² rescale product stays
    // inside the wide type (≤10³⁸ up to in-degree 10¹⁴), floor-dividing
    // back to BIGINT on non-negative values only, so both engines agree
    // bit-for-bit.
    // The oracle unrolls the same two rounds as plain SQL CTEs — like
    // graph_pagerank, no recursion for a fixed horizon, so it also
    // runs in the Spark SQL sweep.
    //
    // Scale shape: the edge frame stages ONCE hash-partitioned on u
    // (the v-keyed join exchanges the O(nodes) score side; edges are
    // re-used co-partitioned); each half-round is one equi-join + one
    // map-side-combined SUM on the destination key. Score frames are
    // O(nodes) and the only per-round exchange.
    GraftQuery(
      "graph_hits",
      (s, d) => {
        val UNIT = 1000000000000L
        // edge frame staged at the sized width (not the conf default):
        // each half-round's score join sorts the edge mass in place, and
        // the 250× probe measured ~5 GB of spill spread across the
        // 32-task round stages before the pin (SCALE.md §19)
        // stageEager: round 1's score join reads adj on BOTH sides
        // (edge scan + hub side via nodes -> adj), so a lazy cache made
        // the concurrent stages race to build the same partitions — the
        // 9-38 s run-to-run variance measured this round collapses once
        // the cache is built by one upfront pass
        val adj = Materialize.stageEager(
          coLineAdj(s, d).repartition(edgeWidth(s, d), col("u")))
        val nodes = Materialize.stageEager(
          adj.select(col("u").as("node"))
            .union(adj.select(col("v").as("node"))).distinct())
        // max-normalize a raw (key, raw) frame onto the node set
        def rescale(raw: DataFrame, key: String): DataFrame = {
          val mx = raw.agg(max(col("raw")).as("mx")) // 1 row, broadcast
          nodes.join(raw, nodes("node") === raw(key), "left")
            .join(broadcast(mx))
            .select(nodes("node"),
              expr(s"CAST(coalesce(raw, 0L) AS DECIMAL(38,0)) * ${UNIT}L DIV mx")
                .cast("long").as("score"))
        }
        var hub = nodes.select(col("node"), lit(UNIT).as("score"))
        var auth = hub
        for (_ <- 1 to 2) {
          val araw = adj
            .join(hub.select(col("node").as("hu"), col("score").as("hs")),
              col("u") === col("hu"))
            .groupBy(col("v"))
            .agg(sum(col("hs").cast(DecimalType(38, 0))).as("raw"))
          // stage each half-round's O(nodes) score frame: hub₂ and
          // auth₂ share the earlier rounds as a common subtree, and
          // unstaged the final hub⋈auth re-SORTED that shared exchange
          // once per reader — 14 identical 32-task sort stages, ~0.3 GB
          // of spill each, at the 250× rung (SCALE.md §19); cached the
          // chain is computed once and the repeats vanish
          auth = Materialize.stage(rescale(araw, "v"))
          val hraw = adj
            .join(auth.select(col("node").as("av"), col("score").as("ascore")),
              col("v") === col("av"))
            .groupBy(col("u"))
            .agg(sum(col("ascore").cast(DecimalType(38, 0))).as("raw"))
          hub = Materialize.stage(rescale(hraw, "u"))
        }
        hub.select(col("node"), col("score").as("hub_fp"))
          .join(auth.select(col("node"), col("score").as("auth_fp")),
            Seq("node"))
          .select(col("node").as("part"), col("hub_fp"), col("auth_fp"))
          .orderBy(col("part"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        nodes AS (SELECT u AS node FROM adj UNION SELECT v AS node FROM adj),
        h0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS score FROM nodes),
        ar1 AS (SELECT e.v, SUM(CAST(h.score AS HUGEINT)) AS raw
                FROM adj e JOIN h0 h ON h.node = e.u GROUP BY e.v),
        am1 AS (SELECT MAX(raw) AS mx FROM ar1),
        a1 AS (SELECT n.node,
                      CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000000000
                        // mx AS BIGINT) AS score
               FROM nodes n LEFT JOIN ar1 r ON r.v = n.node CROSS JOIN am1),
        hr1 AS (SELECT e.u, SUM(CAST(a.score AS HUGEINT)) AS raw
                FROM adj e JOIN a1 a ON a.node = e.v GROUP BY e.u),
        hm1 AS (SELECT MAX(raw) AS mx FROM hr1),
        h1 AS (SELECT n.node,
                      CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000000000
                        // mx AS BIGINT) AS score
               FROM nodes n LEFT JOIN hr1 r ON r.u = n.node CROSS JOIN hm1),
        ar2 AS (SELECT e.v, SUM(CAST(h.score AS HUGEINT)) AS raw
                FROM adj e JOIN h1 h ON h.node = e.u GROUP BY e.v),
        am2 AS (SELECT MAX(raw) AS mx FROM ar2),
        a2 AS (SELECT n.node,
                      CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000000000
                        // mx AS BIGINT) AS score
               FROM nodes n LEFT JOIN ar2 r ON r.v = n.node CROSS JOIN am2),
        hr2 AS (SELECT e.u, SUM(CAST(a.score AS HUGEINT)) AS raw
                FROM adj e JOIN a2 a ON a.node = e.v GROUP BY e.u),
        hm2 AS (SELECT MAX(raw) AS mx FROM hr2),
        h2 AS (SELECT n.node,
                      CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000000000
                        // mx AS BIGINT) AS score
               FROM nodes n LEFT JOIN hr2 r ON r.u = n.node CROSS JOIN hm2)
        SELECT h2.node AS part, h2.score AS hub_fp, a2.score AS auth_fp
        FROM h2 JOIN a2 ON a2.node = h2.node
        ORDER BY part
      """)),

    // ───── degree assortativity: do hubs link to hubs? ─────
    // Newman's degree-correlation coefficient over the directed co-line
    // graph: the Pearson correlation, across edge INSTANCES, of the
    // source's out-degree with the target's in-degree. r > 0 =
    // assortative (hubs wire to hubs — social-graph shape), r < 0 =
    // disassortative (hubs wire to leaves — dependency/star shape);
    // the single number that says which skew mitigations the other
    // graph operators will need (a disassortative graph concentrates
    // join fanout on few keys). Degrees are exact integer counts; one
    // factor of each product is widened to DECIMAL(38,0)/HUGEINT BEFORE
    // the multiply (a post-product cast would leave deg·deg in BIGINT,
    // capping safe degrees at ~3·10⁹ per endpoint), so per-term and
    // sum headroom are both the wide type's; the close is the
    // stats_corr pinned double/sqrt chain with a zero-variance NULL
    // guard.
    //
    // Scale shape: two degree aggregates (map-side combined) + two
    // equi-joins of the edge frame against O(nodes) degree frames +
    // ONE 1-row aggregate. The edge frame is the only corpus-sized
    // exchange, and it moves twice (once per degree key).
    GraftQuery(
      "graph_assortativity",
      (s, d) => {
        val adj = Materialize.stage(coLineAdj(s, d))
        val outdeg = adj.groupBy(col("u")).agg(count(lit(1)).as("du"))
        val indeg = adj.groupBy(col("v")).agg(count(lit(1)).as("dv"))
        adj.join(outdeg, Seq("u")).join(indeg, Seq("v"))
          .agg(count(lit(1)).as("n_edges"),
            sum(col("du").cast(DecimalType(38, 0))).as("sx"),
            sum(col("dv").cast(DecimalType(38, 0))).as("sy"),
            sum(col("du").cast(DecimalType(38, 0)) * col("dv")).as("sxy"),
            sum(col("du").cast(DecimalType(38, 0)) * col("du")).as("sxx"),
            sum(col("dv").cast(DecimalType(38, 0)) * col("dv")).as("syy"))
          .select(col("n_edges"),
            expr("""CASE WHEN CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE) -
                             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
                         OR CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE) -
                             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
                         THEN NULL
                         ELSE (CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE) -
                               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                              (sqrt(CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE) -
                                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                               sqrt(CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE) -
                                    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                    END""").as("assortativity"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        od AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS du FROM adj GROUP BY u),
        id AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dv FROM adj GROUP BY v),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                 SUM(CAST(du AS HUGEINT)) AS sx,
                 SUM(CAST(dv AS HUGEINT)) AS sy,
                 SUM(CAST(du AS HUGEINT) * dv) AS sxy,
                 SUM(CAST(du AS HUGEINT) * du) AS sxx,
                 SUM(CAST(dv AS HUGEINT) * dv) AS syy
          FROM adj JOIN od USING (u) JOIN id USING (v))
        SELECT n_edges,
               CASE WHEN CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE) -
                         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
                    OR CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE) -
                        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
                    THEN NULL
                    ELSE (CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                         (sqrt(CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE) -
                               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                          sqrt(CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE) -
                               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               END AS assortativity
        FROM g
      """)),

    // ───── degree histogram: the graph-profiling pass ─────
    // Log₂-bucketed in/out-degree distribution — with graph_assortativity
    // the two-number-and-a-shape profile run BEFORE committing to a
    // partitioning strategy: the top occupied bucket bounds the hottest
    // join key (what AQE's skew split will face), the bucket slope says
    // whether the tail is power-law (budget the cap bound, §15's
    // jaccard-links lesson) or exponential (the 10× measurement already
    // generalizes). Bucket = ⌊log₂ deg⌋ via the length(bin(·))−1
    // spelling both engines share (IntMath's ilog2 — degrees are ≥ 1 by
    // construction, no zero guard needed). Exact counts only.
    //
    // Scale shape: two degree aggregates (map-side combined) + one
    // ≤2·64-row bucket aggregate. Output is metadata-sized at any
    // corpus.
    GraftQuery(
      "graph_degree_histogram",
      (s, d) => {
        val adj = Materialize.stageEager(coLineAdj(s, d))
        def hist(keyCol: String, side: String) = adj
          .groupBy(col(keyCol).as("node")).agg(count(lit(1)).as("deg"))
          .select(lit(side).as("side"),
            expr("length(bin(deg)) - 1").cast("long").as("bucket"),
            col("deg"))
          .groupBy(col("side"), col("bucket"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
        hist("u", "out").unionByName(hist("v", "in"))
          .orderBy(col("side"), col("bucket"))
      },
      Some("""
        WITH adj AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON b.l_orderkey = a.l_orderkey
           AND b.l_linenumber = a.l_linenumber + 1
           AND a.l_partkey <> b.l_partkey),
        od AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
               FROM adj GROUP BY u),
        id AS (SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS deg
               FROM adj GROUP BY v),
        b AS (
          SELECT 'out' AS side, CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
                 deg FROM od
          UNION ALL
          SELECT 'in' AS side, CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
                 deg FROM id)
        SELECT side, bucket, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(deg) AS min_deg, MAX(deg) AS max_deg
        FROM b GROUP BY side, bucket
        ORDER BY side, bucket
      """))
  )

  /** The k-core of an undirected simple graph (edges in either or both
    * directions; self-loops/multi-edges dropped): iteratively delete
    * nodes of degree < k until a fixpoint. Returns (u, core_deg) — the
    * surviving nodes with their degree inside the core (≥ k by
    * definition, unless the core is empty).
    *
    * Peeling is DELTA-DEGREE (Matula–Beck by rounds): the node-sized
    * (node, deg) frame is computed ONCE from the full edge mass, and
    * each round subtracts, from every survivor, its count of edges into
    * the round's under-k frontier. Per round that is ONE pass over the
    * cached edges (a semi join against the broadcast-small frontier
    * feeding a map-side-combined count whose agg input is only the
    * frontier-incident edges) plus node-sized maintenance joins; the
    * old spelling's full degree re-aggregate and two edge-mass
    * anti-joins (three O(E) passes plus an O(E) cache write EVERY
    * round) are gone. Subtraction against a stale edge frame stays
    * exact — an edge whose far endpoint died in an EARLIER round can
    * never decrement again (that endpoint is not in the current
    * frontier; frontiers are disjoint) — which is what makes the edge
    * cache rewrite OPTIONAL, so it happens geometrically, not per
    * round: the frame is compacted to both-endpoints-alive edges only
    * when the alive-node count has HALVED since the last compaction.
    * Total compaction work telescopes to O(E) over the whole peel
    * (each compaction reads a frame at most ~2× its output), while a
    * fast-collapsing graph (the common case: one huge first peel, then
    * a small cascading core) pays one compaction and scans a tiny
    * frame for every later round. The ORACLE spells the identical
    * round as two COUNT windows over the shrinking edge CTE (the
    * single-reference recurrence a linear CTE chain needs): deg(x) < k
    * there ⇔ x enters the frontier here, so both spellings peel
    * exactly the same nodes each round. An empty frontier IS the
    * fixpoint, and the surviving (node, deg) frame IS the answer — deg
    * was maintained exactly, so no final re-aggregate over the edges
    * either. Each round's node frame is materialized via stageIterative
    * (truncating the logical plan, so round N's analysis cost does not
    * grow with N) and the previous round's cache is freed as soon as
    * its successor is materialized.
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 64,
            width: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // `width`: sized partition count for the edge-mass dedup exchange
    // (the caller knows the edge count; 11.3 GB of 32-task distinct
    // spill at the 250× rung without it — SCALE.md §19)
    val undRaw = edges.toDF("x", "y").filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    val und = width.fold(undRaw)(n =>
      undRaw.repartition(n, col("a"), col("b"))).distinct()
    var cur = Materialize.stageIterative(
      und.select(col("a").as("u"), col("b").as("v"))
        .union(und.select(col("b").as("u"), col("a").as("v"))))
    cur.count()
    // the ONLY full degree aggregate: from here deg is maintained by
    // per-round frontier-edge subtraction, never recomputed
    var deg = Materialize.stageIterative(
      cur.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    var alive = deg.count()
    var lastCompact = alive
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      // ONE fused job per round. The frontier (deg < k) is a filter
      // over the CACHED node frame — never staged, never a join: the
      // survivors are just deg >= k, and a survivor x loses exactly
      // its edges INTO the frontier — in the both-directions edge
      // frame the rows (u=x, v∈frontier). Edges between two frontier
      // nodes die with both endpoints and decrement no survivor, and
      // edges whose far endpoint died in an EARLIER round can't fire
      // again (disjoint frontiers) — so a stale, lazily-compacted cur
      // is exact. Spelling the subtraction as survivors ∪ (-1 per
      // frontier-incident edge) → sum groups the whole maintenance
      // into ONE node-keyed exchange (the `_base` tag drops groups
      // that are only decrements — frontier u's own rows); the edge
      // mass itself moves nowhere (AQE broadcasts the frontier for
      // the semi join).
      val badV = deg.filter(col("deg") < k).select(col("u").as("v"))
      val next = Materialize.stageIterative(
        deg.filter(col("deg") >= k)
          .select(col("u"), col("deg"), lit(1).as("_base"))
          .unionByName(
            cur.join(badV, Seq("v"), "left_semi")
              .select(col("u"), lit(-1L).as("deg"), lit(0).as("_base")))
          .groupBy(col("u"))
          .agg(sum(col("deg")).as("deg"), max(col("_base")).as("_b"))
          .filter(col("_b") === 1).select(col("u"), col("deg")))
      val nextAlive = next.count() // materialize before freeing inputs
      deg.unpersist(blocking = false)
      deg = next
      // the frontier was empty iff no node left the alive set — the
      // materialization count doubles as the convergence probe, so no
      // separate per-round frontier job exists
      converged = nextAlive == alive
      alive = nextAlive
      // geometric compaction: once the alive set has halved since the
      // last rewrite, drop dead edges so later rounds scan a frame
      // proportional to the SURVIVORS — total rewrite work across the
      // peel telescopes to O(E)
      if (!converged && alive * 2 <= lastCompact) {
        val compacted = Materialize.stageIterative(
          cur.join(deg.select(col("u")), Seq("u"), "left_semi")
            .join(deg.select(col("u").as("v")), Seq("v"), "left_semi"))
        compacted.count()
        cur.unpersist(blocking = false)
        cur = compacted
        lastCompact = alive
      }
    }
    cur.unpersist(blocking = false)
    // a silent non-fixpoint would emit a superset of the core — fail loudly
    require(converged, s"k-core did not converge within $maxRounds rounds")
    deg.select(col("u"), col("deg").as("core_deg"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * undirected simple graph (edges normalized as in [[kcore]]): every
    * node starts labeled with its own id; each round relabels EVERY node
    * with the most frequent label among its neighbors, ties broken by
    * the smallest label. Synchronous + min-tie-break makes the round a
    * pure function of the previous labeling — deterministic on any
    * engine, partitioning, or schedule (the asynchronous variant the
    * original paper runs is order-dependent and could never hash-match).
    *
    * Per round: one key-equi join of the edge frame against the (node,
    * label) frame on the NEIGHBOR id, one (node, label) count, and a
    * per-node argmax window over ≤deg(v) candidate rows. The label frame
    * is staged per round so round N's plan does not re-run rounds
    * 1..N-1; isolated nodes cannot exist (every node is an edge
    * endpoint).
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      width: Option[Int] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the edge dedup re-exchanges the whole edge stream — pin the sized
    // width when the caller knows the mass (the jaccard/k-core lesson:
    // 9.9 GB of default-width distinct spill at the 250× rung)
    val undRaw = edges.toDF("x", "y").filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    val und = width.fold(undRaw)(w =>
      undRaw.repartition(w, col("a"), col("b"))).distinct()
    // stage the symmetric edge frame HASH-PARTITIONED ON v — the
    // per-round join key. The cached partitioning survives the persist,
    // so every round's (edge ⋈ label) reuses it and only the node-sized
    // label frame exchanges: the edge mass moves ONCE for all rounds
    // instead of once per round.
    val symRaw = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
    // eager: round 1's join reads sym on both sides (lab derives from
    // sym), so the lazy cache raced against itself (see pagerank note)
    val sym = Materialize.stageEager(
      width.fold(symRaw.repartition(col("v")))(w =>
        symRaw.repartition(w, col("v"))))
    var lab = Materialize.stage(
      sym.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    for (_ <- 1 to rounds) {
      val pairs = sym.join(lab, sym("v") === lab("node"))
        .select(sym("u").as("u"), col("label"))
      // The (u, label) count over round 1's pair stream is the wedge
      // lesson again (SCALE.md §4b): labels start near-unique per
      // neighbor, so map-side combine buys nothing and the default-width
      // partial+final aggregate overflows BOTH hash maps into sort
      // fallback (measured 19.3 GB + 18.5 GB of spill across rounds 1-2
      // at the 250× rung). Instead shuffle the RAW pair stream ONCE at
      // the edge-mass width and aggregate exactly once on the sized
      // side — the explicit hash(u, label) repartition satisfies the
      // aggregate's clustering, so no second exchange and no partial
      // pass exists to fall back.
      val pairsW = width.fold(pairs)(w =>
        pairs.repartition(w, col("u"), col("label")))
      val cnt = pairsW.groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("c"))
      // per-node argmax as a HASH aggregate, not a sort window: the
      // struct max carries (count, -label), so ties break on the
      // smallest label exactly like the oracle's ROW_NUMBER ordering
      // (c DESC, label ASC) — with no per-round sort of the pair frame
      lab = Materialize.stage(cnt
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label")))
    }
    lab
  }
}
