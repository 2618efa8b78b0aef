package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.3 notes the reference has NO joins — this is
  * the §7.3-step-4 capability bar): equi joins across the star schema,
  * semi/anti (EXISTS / NOT EXISTS), outer, and a theta-residual join.
  *
  * Scale notes (100 TB): the fact tables (lineitem, orders) shuffle on
  * their join keys — both sides are key-partitioned so AQE can coalesce
  * and skew-split; dimension tables (nation, region, customer at TPC-H
  * ratios) are explicitly `broadcast()` so the big side never shuffles
  * for them. On a real cluster the lineitem⋈orders join benefits from
  * bucketing both tables by orderkey at write time — the read path here
  * keys on the same columns so that optimization drops in without code
  * changes.
  */
object Joins extends QueryModule {
  import Parity.dsum

  override def queries: Seq[GraftQuery] = Seq(

    // star join: revenue per region/nation. Dims broadcast, facts shuffle
    // once on orderkey then once on custkey (the minimum possible).
    GraftQuery(
      "join_star_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        val n  = Tables.nation(s, d)
        val r  = Tables.region(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)),

    // left semi = EXISTS; no payload from the right side crosses the wire
    GraftQuery(
      "join_semi_exists",
      (s, d) => {
        val o  = Tables.orders(s, d)
        val hi = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 45)
          .select(col("l_orderkey"))
        o.join(hi, o("o_orderkey") === hi("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      """)),

    // left anti = NOT EXISTS
    GraftQuery(
      "join_anti_not_exists",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      """)),

    // left outer + agg: customers including those with zero orders
    GraftQuery(
      "join_outer_order_counts",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            dsum(col("o_totalprice")).as("total_spent"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey
      """)),

    // TPC-H Q5-shaped 6-way join: local-supplier revenue per nation in one
    // region/year. Exercises supplier + AQE join reordering. nation/region/
    // supplier are broadcast (dims); lineitem⋈orders shuffles on orderkey,
    // then custkey; the c_nationkey = s_nationkey residual rides the
    // supplier broadcast, so the facts shuffle exactly twice.
    GraftQuery(
      "join_q5_regional",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
        val c  = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val n  = Tables.nation(s, d)
        val r  = Tables.region(s, d).filter(col("r_name") === "ASIA")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(su),
            li("l_suppkey") === su("s_suppkey") &&
              c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """)),

    // equi join + theta residual (non-equi predicate evaluated post-probe)
    GraftQuery(
      "join_theta_residual",
      (s, d) => {
        val li = Tables.lineitem(s, d).as("l")
        val o  = Tables.orders(s, d).as("o")
        li.join(o,
            col("l.l_orderkey") === col("o.o_orderkey") &&
              col("l.l_shipdate") > col("o.o_orderdate"))
          .groupBy(col("o.o_orderstatus").as("o_orderstatus"))
          .agg(count(lit(1)).as("n_shipped_after_order"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_shipped_after_order
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
      """)),

    // ───── bloom-pruned semi join (explicit runtime filter) ─────
    // The build side's keys aggregate into a bloom filter
    // (order-independent OR-merge partials; graft.functions
    // .BloomFilterBuildAgg) delivered as a SCALAR SUBQUERY — the same
    // mechanism Spark's engine-internal runtime row-level filtering
    // uses: the subquery stage runs once and its one binary value lands
    // as a literal in a filter DIRECTLY OVER THE FACT SCAN, before the
    // semi-join exchange. (A crossJoin(broadcast(bloomFrame)) phrasing
    // reads equivalently but Catalyst's PushDownLeftSemiAntiJoin then
    // reorders the semi join BELOW the probe filter, un-pruning the
    // exchange — SketchSpec pins the subquery phrasing's plan.) At
    // 100 TB the fact shuffle carries ~selectivity × rows instead of
    // all rows. False positives pass through to the exact semi join
    // behind it, so the result is bit-identical to the plain semi join
    // the oracle states; false negatives are impossible.
    GraftQuery(
      "join_bloom_prune",
      (s, d) => {
        val dim = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        val view = s"graft_bloom_dim_${math.abs(d.hashCode)}"
        dim.createOrReplaceTempView(view)
        val li = Tables.lineitem(s, d)
        val pruned = li.filter(expr(
          s"bloom_probe((SELECT bloom_build(o_orderkey, 1048576, 6) FROM $view), l_orderkey)"))
        pruned.join(dim, pruned("l_orderkey") === dim("o_orderkey"),
            "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice"), 2).as("gross"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
        FROM lineitem
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)),

    // ───── banded range join (equi-join decomposition of a theta) ─────
    // All GLOBAL value-proximity pairs |va − vb| ≤ ε across purchases —
    // no blocking key like join_range_value_pairs' user_id exists, so a
    // naive phrasing is a full O(n²) nested-loop cross product. The
    // banding decomposition makes it an EQUI join: every value maps to
    // grid cell floor(v/ε); a qualifying pair's cells differ by at most
    // 1, so replicating ONE side into its 3 adjacent cells (fixed 3×
    // fanout) and equi-joining on the cell finds every candidate, and
    // each pair exactly once (the probe row's single cell meets exactly
    // one of the build row's three replicas). The exact |va − vb| ≤ ε
    // filter then drops the false candidates. Work is Σ per-cell
    // products — data-proximity-bounded, not n² — and the shuffle is a
    // plain hash exchange on the cell id; the oracle states the theta
    // join directly. floor(v/ε) is two IEEE ops in identical order on
    // both engines, so cell boundaries agree exactly.
    GraftQuery(
      "join_banded_range",
      (s, d) => {
        val eps = 0.05
        val p = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("value"))
        val a = p.select(col("event_id").as("ea"), col("value").as("va"))
          .withColumn("cell", floor(col("va") / eps))
        val b = p.select(col("event_id").as("eb"), col("value").as("vb"))
          .withColumn("c0", floor(col("vb") / eps))
          .withColumn("cell", explode(expr("array(c0 - 1L, c0, c0 + 1L)")))
        a.join(b, Seq("cell"))
          .filter(col("ea") < col("eb") &&
            abs(col("va") - col("vb")) <= eps)
          .select(col("ea"), col("eb"), col("va"), col("vb"))
          .orderBy(col("ea"), col("eb"))
      },
      Some("""
        WITH p AS (
          SELECT event_id, value FROM events WHERE event_type = 'purchase')
        SELECT a.event_id AS ea, b.event_id AS eb,
               a.value AS va, b.value AS vb
        FROM p a JOIN p b
          ON a.event_id < b.event_id AND abs(a.value - b.value) <= 0.05
        ORDER BY ea, eb
      """)),

    // ───── manually salted join (the skew fallback) ─────
    // The replicate-and-salt pattern for when ONE join key is so hot
    // that even AQE's skew split can't help (AQE splits oversized
    // sort-merge partitions, but a single key's rows still meet in one
    // task per split boundary rule — and broadcast isn't available
    // because the dim side is too big to ship whole). Fact rows get a
    // deterministic salt in [0, R) from an internal hash of their OWN
    // row key (murmur3 — engine-internal, never oracle-visible), so a
    // hot customer's orders spread over R reducers; the dim side
    // replicates each row R times so every (custkey, salt) cell finds
    // its match. Join output — and therefore the oracle — is
    // bit-identical to the plain join: salting only re-partitions the
    // work. Cost: R× the dim shuffle volume, the explicit price of
    // bounding the hottest reducer at 1/R of the key's rows.
    GraftQuery(
      "join_salted_skew",
      (s, d) => {
        val R = 8
        val o = Tables.orders(s, d)
          .withColumn("salt", pmod(hash(col("o_orderkey")), lit(R)))
        val c = Tables.customer(s, d)
          .withColumn("salt", explode(expr(s"sequence(0, ${R - 1})")))
        o.join(c, o("o_custkey") === c("c_custkey") &&
            o("salt") === c("salt"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("revenue"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """)),

    // ───── interval × interval overlap join, banded on the hour grid ─────
    // "Which user-days were touched by an incident?" — the ops query
    // behind SLA reports and the contamination question behind "drop
    // training windows that overlap an outage". Intervals on BOTH sides:
    // each user's daily activity span [first event, last event] against
    // incident windows (hours with > 5 error events — the alert
    // condition, derived from the same stream; a real deploy reads the
    // pager table). The overlap predicate a.lo < b.hi AND b.lo ≤ a.hi is
    // NOT an equi-join — naively it is a cartesian. Banding restores
    // the equi-join: a span covers the hour buckets lo÷H .. hi÷H (≤ 25
    // per day BY CONSTRUCTION — the bounded fanout that makes banding
    // safe), incidents are hour-aligned, and bucket equality is then
    // EXACTLY interval overlap (b in the covered range ⟺ bH ≤ hi and
    // lo < (b+1)H), so there is no residual predicate and no dedup —
    // each overlapping incident hour matches exactly one banded row.
    //
    // Scale: one agg per side (user-day spans; hour error counts), one
    // equi shuffle on the hour bucket with ≤25× span fanout of 4-column
    // rows, one left join back to spans (same user-day key, AQE
    // broadcasts the hit side when small). Same family as
    // join_banded_range, but interval×interval instead of point×range.
    GraftQuery(
      "join_interval_overlap",
      (s, d) => {
        val H = 3600000000L
        val b = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type"))
        // spans feeds TWO consumers (the hour explode and the final
        // left join) — staged so the span aggregate computes once and
        // both joins read it co-partitioned on (user_id, day); the
        // 100× probe measured the unstaged double recompute at 11×
        // cpu for 2.5× data. inc is staged EAGERLY so the banded join
        // plans against its TRUE hour-bounded size (broadcast) rather
        // than an events-scaled estimate.
        val spans = graft.Materialize.stage(
          b.groupBy(col("user_id"), expr("ts_us div 86400000000").as("day"))
            .agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi")))
        val inc = graft.Materialize.stageEager(
          b.filter(col("event_type") === "error")
            .groupBy(expr(s"ts_us div ${H}L").as("h"))
            .agg(count(lit(1)).as("errs"))
            .filter(col("errs") > 5)
            .select(col("h")))
        val cov = spans.select(col("user_id"), col("day"),
          explode(expr(s"sequence(lo div ${H}L, hi div ${H}L)")).as("hb"))
        val hit = cov.join(inc, col("hb") === col("h"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_inc"))
        spans.join(hit, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            expr(s"hi div ${H}L - lo div ${H}L + 1").as("n_hours"),
            coalesce(col("n_inc"), lit(0L)).as("n_incidents"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""
        WITH b AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
          FROM events),
        spans AS (
          SELECT user_id, ts_us // 86400000000 AS day,
                 MIN(ts_us) AS lo, MAX(ts_us) AS hi
          FROM b GROUP BY 1, 2),
        inc AS (
          SELECT ts_us // 3600000000 AS h FROM b
          WHERE event_type = 'error'
          GROUP BY 1 HAVING COUNT(*) > 5),
        cov AS (
          SELECT user_id, day,
                 UNNEST(generate_series(lo // 3600000000, hi // 3600000000)) AS hb
          FROM spans),
        hit AS (
          SELECT c.user_id, c.day, CAST(COUNT(*) AS BIGINT) AS n_inc
          FROM cov c JOIN inc i ON c.hb = i.h
          GROUP BY 1, 2)
        SELECT s.user_id, s.day,
               hi // 3600000000 - lo // 3600000000 + 1 AS n_hours,
               COALESCE(n_inc, 0) AS n_incidents
        FROM spans s LEFT JOIN hit USING (user_id, day)
        ORDER BY user_id, day
      """))
  )
}
