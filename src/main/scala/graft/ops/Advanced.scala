package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Advanced relational operators Spark has no single built-in for,
  * composed from primitives the Catalyst optimizer handles well: as-of
  * join, binned range join, sessionization, salted (skew-resistant)
  * aggregation, and exact median via windows.
  *
  * Scale notes (100 TB):
  *  - The as-of join is the union+window formulation: one shuffle on the
  *    key, one per-partition time sort — no range-condition nested loop,
  *    and state is a single running value per key (the same shape a
  *    streaming as-of would keep). The probe side never re-shuffles.
  *  - The range join bins the continuous axis so candidates come from an
  *    equi-join on (key, bin) — three bins per row bound the expansion;
  *    the exact predicate re-filters. This is the standard interval-join
  *    decomposition that avoids a cartesian range scan.
  *  - Salted aggregation demonstrates the two-stage skew pattern: salt
  *    the hot key-space into 16 shards for the partial, merge the shards
  *    in a second (tiny) agg. Decimal partials keep it bit-exact.
  *  - The median uses one window pass (rn + cnt per key) instead of a
  *    global percentile sort; per-key state is bounded.
  */
object Advanced extends QueryModule {
  import Parity.dsum

  /** events with µs-integer timestamps: integer time arithmetic is
    * bit-exact across engines (ns→µs truncation matches Tables.events).
    */
  private def eventsUs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))

  override def queries: Seq[GraftQuery] = Seq(

    // ───── as-of join: latest view at-or-before each click, per user ─────
    GraftQuery(
      "join_asof_click_view",
      (s, d) => {
        val e = eventsUs(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(1).as("is_click"), lit(null).cast("long").as("view_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(0).as("is_click"), col("event_id").as("view_id"))
        // views sort before clicks at equal ts (is_click asc) ⇒ a
        // same-instant view is visible to the click, matching v <= c
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("is_click").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(views)
          .withColumn("asof_view_id", last(col("view_id"), ignoreNulls = true).over(w))
          .withColumn("asof_view_ts",
            last(when(col("is_click") === 0, col("ts_us")), ignoreNulls = true).over(w))
          .filter(col("is_click") === 1)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("asof_view_id"),
            (col("ts_us") - col("asof_view_ts")).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type
          FROM events),
        u AS (
          SELECT event_id, user_id, ts_us, 1 AS is_click, NULL::BIGINT AS view_id
          FROM e WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, user_id, ts_us, 0 AS is_click, event_id AS view_id
          FROM e WHERE event_type = 'view'),
        w AS (
          SELECT event_id, user_id, ts_us, is_click,
                 last_value(view_id IGNORE NULLS) OVER win AS asof_view_id,
                 last_value(CASE WHEN is_click = 0 THEN ts_us END IGNORE NULLS)
                   OVER win AS asof_view_ts
          FROM u
          WINDOW win AS (PARTITION BY user_id
                         ORDER BY ts_us ASC, is_click ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, ts_us, asof_view_id,
               ts_us - asof_view_ts AS gap_us
        FROM w WHERE is_click = 1 ORDER BY event_id
      """)),

    // ───── as-of join with tolerance: stale matches void, not kept ─────
    // The pandas merge_asof(tolerance=...) surface: each click takes the
    // most recent view ONLY if it happened within the last 10 minutes;
    // an older view is no match at all (NULL id and gap), which is the
    // semantics a sessionized attribution pipeline actually wants — a
    // view from last week must not claim this click. Same union+window
    // single-shuffle formulation as join_asof_click_view (no range
    // nested-loop, per-user state = one running value); the tolerance
    // is one integer comparison applied AFTER the window, so the plan
    // shape is identical.
    GraftQuery(
      "join_asof_tolerance",
      (s, d) => {
        val e = eventsUs(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(1).as("is_click"), lit(null).cast("long").as("view_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(0).as("is_click"), col("event_id").as("view_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("is_click").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tolUs = 600000000L // 10 min
        clicks.unionByName(views)
          .withColumn("raw_view_id",
            last(col("view_id"), ignoreNulls = true).over(w))
          .withColumn("raw_view_ts",
            last(when(col("is_click") === 0, col("ts_us")),
              ignoreNulls = true).over(w))
          .filter(col("is_click") === 1)
          .withColumn("in_tol",
            col("raw_view_ts").isNotNull &&
              (col("ts_us") - col("raw_view_ts")) <= tolUs)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            when(col("in_tol"), col("raw_view_id")).as("asof_view_id"),
            when(col("in_tol"), col("ts_us") - col("raw_view_ts"))
              .as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type
          FROM events),
        u AS (
          SELECT event_id, user_id, ts_us, 1 AS is_click, NULL::BIGINT AS view_id
          FROM e WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, user_id, ts_us, 0 AS is_click, event_id AS view_id
          FROM e WHERE event_type = 'view'),
        w AS (
          SELECT event_id, user_id, ts_us, is_click,
                 last_value(view_id IGNORE NULLS) OVER win AS raw_view_id,
                 last_value(CASE WHEN is_click = 0 THEN ts_us END IGNORE NULLS)
                   OVER win AS raw_view_ts
          FROM u
          WINDOW win AS (PARTITION BY user_id
                         ORDER BY ts_us ASC, is_click ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, ts_us,
               CASE WHEN raw_view_ts IS NOT NULL
                     AND ts_us - raw_view_ts <= 600000000
                    THEN raw_view_id END AS asof_view_id,
               CASE WHEN raw_view_ts IS NOT NULL
                     AND ts_us - raw_view_ts <= 600000000
                    THEN ts_us - raw_view_ts END AS gap_us
        FROM w WHERE is_click = 1 ORDER BY event_id
      """)),

    // ───── as-of join, NEAREST direction (pandas direction='nearest') ─────
    // Each click matches its temporally closest view in EITHER
    // direction, ties to the earlier (backward) one — the calibration-
    // lookup semantics (sensor reading ↔ nearest reference sample).
    // Same single-shuffle union+window formulation run BOTH ways: the
    // backward candidate is the running last view, the forward
    // candidate the mirrored running first over the reversed frame; one
    // final comparison picks the winner. A same-instant view sorts
    // before the click, so backward sees it at gap 0 and the ≤ tie rule
    // lands it backward, which is also why forward missing it is
    // harmless. Per-user state stays two scalars.
    GraftQuery(
      "join_asof_nearest",
      (s, d) => {
        val e = eventsUs(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(1).as("is_click"), lit(null).cast("long").as("view_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            lit(0).as("is_click"), col("event_id").as("view_id"))
        val ord = Seq(col("ts_us").asc, col("is_click").asc, col("event_id").asc)
        val wBack = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFwd = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        clicks.unionByName(views)
          .withColumn("b_id", last(col("view_id"), ignoreNulls = true).over(wBack))
          .withColumn("b_ts", last(when(col("is_click") === 0, col("ts_us")),
            ignoreNulls = true).over(wBack))
          .withColumn("f_id", first(col("view_id"), ignoreNulls = true).over(wFwd))
          .withColumn("f_ts", first(when(col("is_click") === 0, col("ts_us")),
            ignoreNulls = true).over(wFwd))
          .filter(col("is_click") === 1)
          .withColumn("takeBack",
            col("b_ts").isNotNull && (col("f_ts").isNull ||
              (col("ts_us") - col("b_ts")) <= (col("f_ts") - col("ts_us"))))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            when(col("takeBack"), col("b_id")).otherwise(col("f_id"))
              .as("nearest_view_id"),
            when(col("takeBack"), col("ts_us") - col("b_ts"))
              .otherwise(col("f_ts") - col("ts_us")).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type
          FROM events),
        u AS (
          SELECT event_id, user_id, ts_us, 1 AS is_click, NULL::BIGINT AS view_id
          FROM e WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, user_id, ts_us, 0 AS is_click, event_id AS view_id
          FROM e WHERE event_type = 'view'),
        w AS (
          SELECT event_id, user_id, ts_us, is_click,
                 last_value(view_id IGNORE NULLS) OVER wb AS b_id,
                 last_value(CASE WHEN is_click = 0 THEN ts_us END IGNORE NULLS)
                   OVER wb AS b_ts,
                 first_value(view_id IGNORE NULLS) OVER wf AS f_id,
                 first_value(CASE WHEN is_click = 0 THEN ts_us END IGNORE NULLS)
                   OVER wf AS f_ts
          FROM u
          WINDOW wb AS (PARTITION BY user_id
                        ORDER BY ts_us ASC, is_click ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY user_id
                        ORDER BY ts_us ASC, is_click ASC, event_id ASC
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_id, user_id, ts_us,
               CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                          OR ts_us - b_ts <= f_ts - ts_us)
                    THEN b_id ELSE f_id END AS nearest_view_id,
               CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                          OR ts_us - b_ts <= f_ts - ts_us)
                    THEN ts_us - b_ts ELSE f_ts - ts_us END AS gap_us
        FROM w WHERE is_click = 1 ORDER BY event_id
      """)),

    // ───── range join via binning: same-user events with close values ─────
    GraftQuery(
      "join_range_value_pairs",
      (s, d) => {
        val e = eventsUs(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
        val width = 0.05
        val a = e.select(col("event_id").as("ea"), col("user_id"),
            col("value").as("va"))
          .withColumn("bin",
            explode(expr(s"array(floor(va / $width) - 1, floor(va / $width), floor(va / $width) + 1)")))
        val b = e.select(col("event_id").as("eb"), col("user_id").as("u2"),
            col("value").as("vb"))
          .withColumn("bin2", expr(s"floor(vb / $width)"))
        a.join(b,
            col("user_id") === col("u2") && col("bin") === col("bin2") &&
              col("ea") < col("eb") &&
              abs(col("va") - col("vb")) <= width)
          .select(col("ea"), col("eb"), col("user_id"),
            col("va"), col("vb"), abs(col("va") - col("vb")).as("diff"))
          .distinct() // a pair can fall in two adjacent-bin probes
          .orderBy(col("ea"), col("eb"))
      },
      Some("""
        SELECT a.event_id AS ea, b.event_id AS eb, a.user_id,
               a.value AS va, b.value AS vb, abs(a.value - b.value) AS diff
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(a.value - b.value) <= 0.05
        ORDER BY ea, eb
      """)),

    // ───── sessionization: 30-minute inactivity gap splits sessions ─────
    GraftQuery(
      "win_sessionize",
      (s, d) => {
        val e = eventsUs(s, d)
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        val gapUs = 30L * 60 * 1000000
        e.withColumn("prev_ts", lag(col("ts_us"), 1).over(wOrd))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
          .withColumn("session_seq",
            sum(col("new_session")).over(
              wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("session_seq"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id FROM events),
        g AS (
          SELECT event_id, user_id, ts_us,
                 CASE WHEN LAG(ts_us) OVER w IS NULL
                        OR ts_us - LAG(ts_us) OVER w > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC))
        SELECT event_id, user_id, ts_us,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts_us ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq
        FROM g ORDER BY event_id
      """)),

    // ───── gaps & islands: consecutive-activity streaks per user ─────
    // The retention metric ("longest run of consecutive active days")
    // via the classic island key day − DENSE_RANK(day): consecutive
    // days share a constant difference, so each maximal run collapses
    // to one group — no self-join, no iteration, exact integer day
    // arithmetic from the epoch-µs timestamps. One shuffle on the user
    // key carrying (user, day) pairs — events of a day collapse first,
    // so volume is active-days, not events.
    GraftQuery(
      "win_gap_islands",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        days.withColumn("isl", col("day") - dense_rank().over(w))
          .groupBy(col("user_id"), col("isl"))
          .agg(count(lit(1)).as("streak"))
          .groupBy(col("user_id"))
          .agg(sum(col("streak")).as("n_active_days"),
            count(lit(1)).as("n_islands"),
            max(col("streak")).as("longest_streak"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
          FROM events),
        isl AS (
          SELECT user_id, day,
                 day - DENSE_RANK() OVER (PARTITION BY user_id
                                          ORDER BY day ASC) AS isl
          FROM days),
        runs AS (
          SELECT user_id, isl, COUNT(*) AS streak
          FROM isl GROUP BY user_id, isl)
        SELECT user_id, CAST(SUM(streak) AS BIGINT) AS n_active_days,
               COUNT(*) AS n_islands,
               CAST(MAX(streak) AS BIGINT) AS longest_streak
        FROM runs GROUP BY user_id ORDER BY user_id
      """)),

    // ───── sequential pattern detection: strictly-rising value runs ─────
    // The MATCH_RECOGNIZE-shaped ask ("find users with three rising
    // readings in a row") expressed with lag windows — the pattern
    // length is a plan constant, so the k-step pattern is k−1 lag
    // columns and one conjunctive filter, all inside ONE window pass.
    // Doubles are only COMPARED (no arithmetic), so cross-engine
    // equality is exact. Scale: one shuffle on the user key, one
    // ordered scan per user — per-task state is the k-row lag buffer,
    // the streaming-friendly shape (the same detector runs on a stream
    // with flatMapGroupsWithState carrying the last k values).
    GraftQuery(
      "win_streak_detect",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("p1", lag(col("value"), 1).over(w))
          .withColumn("p2", lag(col("value"), 2).over(w))
          .filter(col("value") > col("p1") && col("p1") > col("p2"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_rising_triples"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH l AS (
          SELECT user_id, value,
                 LAG(value, 1) OVER w AS p1,
                 LAG(value, 2) OVER w AS p2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        SELECT user_id, COUNT(*) AS n_rising_triples
        FROM l WHERE value > p1 AND p1 > p2
        GROUP BY user_id ORDER BY user_id
      """)),

    // ───── salted two-stage aggregation (skew-resistant sum) ─────
    GraftQuery(
      "agg_salted_sum",
      (s, d) =>
        Tables.lineitem(s, d)
          .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("part_sum"),
            count(lit(1)).as("part_n"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("part_sum")).cast("double").as("sum_price"),
            sum(col("part_n")).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ───── exact median per group via two-pass bucketed selection ─────
    // A row_number window partitioned by the 3-value status column would
    // sort each status's ENTIRE row set in one task — a 3-straggler plan
    // with unbounded per-task spill at scale. Instead: pass 1 counts
    // rows per (status, price-range bucket) — a partial-agg shuffle to a
    // metadata-scale frame — and locates the bucket holding each median
    // rank via a cumulative sum (window over ~buckets rows, not data).
    // Pass 2 sorts ONLY the rows of those target buckets (joined via
    // broadcast of the tiny marker frame), so per-task state is bounded
    // by bucket width, never group size. Exact same selection as the
    // oracle's full row_number formulation: local rank + preceding-
    // bucket offset IS the global rank. The scale sibling for sloppier
    // needs is agg_approx_quantile.
    GraftQuery(
      "agg_median_manual",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"),
            floor(col("o_totalprice") / 1000).cast("long").as("bkt"))
        val counts = o.groupBy(col("o_orderstatus"), col("bkt"))
          .agg(count(lit(1)).as("c"))
        val marked = counts
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy(col("o_orderstatus")).orderBy(col("bkt"))))
          .withColumn("n", sum(col("c")).over(
            Window.partitionBy(col("o_orderstatus"))))
          .withColumn("lo", col("cum") - col("c") + 1)
          .withColumn("k1", expr("(n + 1) div 2"))
          .withColumn("k2", expr("(n + 2) div 2"))
          .filter(col("k1").between(col("lo"), col("cum")) ||
                  col("k2").between(col("lo"), col("cum")))
          .select(col("o_orderstatus").as("st"), col("bkt").as("tbkt"),
            (col("lo") - 1).as("offset"), col("k1"), col("k2"))
        o.join(broadcast(marked),
            col("o_orderstatus") === col("st") && col("bkt") === col("tbkt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("o_orderstatus"), col("bkt"))
              .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            + col("offset"))
          .filter(col("rn") === col("k1") || col("rn") === col("k2"))
          .groupBy(col("o_orderstatus"))
          .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            / count(lit(1))).as("median_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        WITH r AS (
          SELECT o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
          FROM orders)
        SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 AS median_price
        FROM r
        WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
      """)),

    // ───── approximate distinct (HLL++ sketch, self-validating) ─────
    // Raw sketch estimates are engine-specific by construction, so they
    // can never hash-match across engines. Instead each engine VALIDATES
    // ITS OWN estimator: it emits the exact distinct count (which both
    // engines agree on bit-for-bit) plus a boolean saying whether its own
    // HLL estimate landed within 10% of its own exact count. Any sane
    // estimator yields all-true on both sides, so rows+schema+hash match
    // — and the row still proves the sketch machinery ran and converged.
    // SketchSpec additionally bounds the raw relative error at 3× rsd.
    // Two-stage formulation: dedup (flag, partkey) FIRST with a narrow
    // count-only agg, then run the HLL over the already-distinct keys.
    // HLL is duplicate-insensitive so the estimate is identical, but the
    // single-stage plan shuffled the ~400-register sketch state per
    // (flag, partkey) group through the distinct pipeline — here sketch
    // state exists only at the 3-row flag granularity.
    // ───── approximate quantiles (positional sketch, self-validating) ─────
    // Same gate pattern as agg_approx_distinct: sketch values are
    // engine-specific (Spark runs a KLL-style positional sketch, DuckDB
    // t-digest), so each engine validates ITS OWN estimator against its
    // own exact median — the bit-exact columns are the exact median
    // (row_number formulation, integer math) and the boolean. accuracy
    // 10000 bounds rank error at ~n/10000, far inside the 5% gate.
    GraftQuery(
      "agg_approx_quantile",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val exact = Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            Window.partitionBy(col("o_orderstatus"))))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("o_orderstatus"), col("o_totalprice").as("exact_med"))
        val approx = Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(expr("percentile_approx(o_totalprice, 0.5, 10000)").as("apx"))
        exact.join(approx, Seq("o_orderstatus"))
          .select(col("o_orderstatus"), col("exact_med"),
            (abs(col("apx") - col("exact_med"))
              <= lit(0.05) * col("exact_med")).as("estimate_within_5pct"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        WITH r AS (
          SELECT o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
          FROM orders),
        e AS (
          SELECT o_orderstatus, o_totalprice AS exact_med
          FROM r WHERE rn = (cnt + 1) // 2),
        a AS (
          SELECT o_orderstatus, approx_quantile(o_totalprice, 0.5) AS apx
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, exact_med,
               ABS(apx - exact_med) <= 0.05 * exact_med AS estimate_within_5pct
        FROM e JOIN a USING (o_orderstatus)
        ORDER BY o_orderstatus
      """)),

    GraftQuery(
      "agg_approx_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_partkey"))
          .agg(count(lit(1)).as("key_rows"))
          .groupBy(col("l_returnflag"))
          // count(l_partkey), not count(1): a NULL partkey forms its own
          // stage-1 group row, which COUNT DISTINCT (and the HLL, which
          // skips NULL inputs) must not count — n_rows still counts
          // every underlying row via the summed per-key counts
          .agg(
            count(col("l_partkey")).as("exact_parts"),
            sum(col("key_rows")).as("n_rows"),
            (abs(approx_count_distinct(col("l_partkey"), 0.02)
              - count(col("l_partkey"))).cast("double")
              <= lit(0.1) * count(col("l_partkey")))
              .as("estimate_within_10pct"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(ABS(approx_count_distinct(l_partkey)
                        - COUNT(DISTINCT l_partkey)) AS DOUBLE)
                 <= 0.1 * COUNT(DISTINCT l_partkey) AS estimate_within_10pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)),

    // ───── heavy hitters: Misra–Gries candidates + exact verify ─────
    // One-pass bounded-memory frequent-tokens (graft.functions
    // .MisraGriesCandidates, k=28 over 31 distinct tokens so eviction
    // and the mergeable-summaries partial merge both genuinely
    // exercise). The sketch's deterministic guarantee — every token
    // with freq > n/(k+1) survives — makes it a CANDIDATE generator;
    // the ≤k-entry candidate array broadcasts back for an exact count
    // + exact integer-math threshold (cnt*(k+1) > n), so the output is
    // bit-equal to the oracle's plain GROUP BY/HAVING. Communication:
    // ≤k entries per partition up, ≤k keys broadcast down — no
    // full-token shuffle reaches the exact pass but the candidates'.
    GraftQuery(
      "agg_heavy_hitters",
      (s, d) => {
        val toks = Tables.documents(s, d).select(
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
        val cands = toks.agg(expr("mg_candidates(token, 28)").as("cands"))
        val total = toks.agg(count(lit(1)).as("total"))
        toks.crossJoin(broadcast(cands))
          .filter(array_contains(col("cands"), col("token")))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .filter(col("cnt") * 29 > col("total"))
          .select(col("token"), col("cnt"))
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""
        WITH toks AS (
          SELECT UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS token
          FROM documents),
        tot AS (SELECT COUNT(*) AS total FROM toks)
        SELECT token, COUNT(*) AS cnt
        FROM toks GROUP BY token
        HAVING COUNT(*) * 29 > (SELECT total FROM tot)
        ORDER BY cnt DESC, token
      """)),

    // ───── conversion funnel: view → click → purchase, time-ordered ─────
    // Stage timestamps derive sequentially (earliest view; earliest
    // click strictly after it; earliest purchase strictly after that),
    // so each stage is one keyed aggregation joined back on user_id —
    // three shuffles on the same key, which AQE plans as one partition
    // layout reused. No per-user event-list collect, no window over the
    // whole event stream: per-task state is an aggregation buffer, so
    // user count and event volume scale independently.
    GraftQuery(
      "win_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
      },
      Some("""
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s1) AS n_view,
               (SELECT COUNT(*) FROM s2) AS n_view_click,
               (SELECT COUNT(*) FROM s3) AS n_full_funnel
      """)),

    // ───── KMV distinct sketch: mergeable AND value-level checkable ─────
    // The k-minimum-values estimator (Bar-Yossef et al. RANDOM'02;
    // Beyer et al. SIGMOD'07 unbiased form (k−1)/U_k): keep the k
    // smallest hash values of a key set; the k-th smallest U_k of n
    // uniform hashes concentrates at k/n, so (k−1)·2⁶⁰/h_k estimates n.
    // Unlike the HLL in agg_approx_distinct (whose register state is
    // engine-private, hence that query's self-validating-boolean gate),
    // the KMV sketch is just md5 order statistics — both engines
    // compute the IDENTICAL sketch, so the ESTIMATE itself is
    // hash-compared, not merely bounded. The union row is computed by
    // MERGING the three per-group sketches (k smallest of the union of
    // the groups' k-smallest lists — never rescanning the data), which
    // is the mergeability that makes KMV a distributed sketch: partial
    // per-partition sketches combine exactly like these per-group ones.
    // Groups with fewer than k hashes are exact by construction
    // (est = m). Scale: the per-group state is ≤k rows via a
    // WindowGroupLimit heap; the merge input is ≤ groups·k rows.
    GraftQuery(
      "agg_kmv_distinct",
      (s, d) => {
        val k = 64
        // 63·2⁶⁰ is exactly representable (6-bit mantissa); both engines
        // fold the same literal product, then perform ONE division
        val scale = 63.0 * 1152921504606846976.0
        val h = Tables.orders(s, d)
          .select(col("o_orderstatus").as("grp"), col("o_custkey")).distinct()
          .select(col("grp"), expr(
            "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15), 16, 10) as bigint)")
            .as("h")).distinct()
        val sk = h
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("grp")).orderBy(col("h"))))
          .filter(col("rn") <= k)
        def estimate(df: DataFrame) = df
          .agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
          .select(col("m"),
            when(col("m") < k, col("m").cast("double"))
              .otherwise(lit(scale) / col("hk").cast("double"))
              .as("est_distinct"))
        val perGrp = sk.groupBy(col("grp"))
          .agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
          .select(col("grp"), col("m"),
            when(col("m") < k, col("m").cast("double"))
              .otherwise(lit(scale) / col("hk").cast("double"))
              .as("est_distinct"))
        // sketch MERGE: k smallest of the union of per-group sketches
        val merged = estimate(sk.select(col("h")).distinct()
          .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
          .filter(col("rn") <= k))
          .select(lit("__union").as("grp"), col("m"), col("est_distinct"))
        val exact = Tables.orders(s, d)
          .groupBy(col("o_orderstatus").as("grp"))
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        val exactAll = Tables.orders(s, d)
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
          .select(lit("__union").as("grp"), col("exact_distinct"))
        perGrp.unionByName(merged)
          .join(exact.unionByName(exactAll), Seq("grp"))
          .select(col("grp"), col("m"), col("est_distinct"),
            col("exact_distinct"))
          .orderBy(col("grp"))
      },
      Some("""
        WITH dk AS (
          SELECT DISTINCT o_orderstatus AS grp, o_custkey FROM orders),
        h AS (
          SELECT DISTINCT grp,
                 ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM dk),
        sk AS (
          SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h QUALIFY rn <= 64),
        per_grp AS (
          SELECT grp, COUNT(*) AS m,
                 CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
                      ELSE (63.0 * 1152921504606846976.0) / MAX(h)::DOUBLE
                 END AS est_distinct
          FROM sk GROUP BY grp),
        msk AS (
          SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
          FROM (SELECT DISTINCT h FROM sk) u QUALIFY rn <= 64),
        mrg AS (
          SELECT '__union' AS grp, COUNT(*) AS m,
                 CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
                      ELSE (63.0 * 1152921504606846976.0) / MAX(h)::DOUBLE
                 END AS est_distinct
          FROM msk),
        ex AS (
          SELECT o_orderstatus AS grp,
                 COUNT(DISTINCT o_custkey) AS exact_distinct
          FROM orders GROUP BY grp
          UNION ALL
          SELECT '__union', COUNT(DISTINCT o_custkey) FROM orders),
        allsk AS (
          SELECT grp, m, est_distinct FROM per_grp
          UNION ALL SELECT grp, m, est_distinct FROM mrg)
        SELECT a.grp, a.m, a.est_distinct, ex.exact_distinct
        FROM allsk a JOIN ex USING (grp)
        ORDER BY a.grp
      """)),

    // ───── count-min sketch: mergeable frequency estimation ─────
    // The frequency sibling of agg_kmv_distinct (Cormode & Muthukrishnan
    // 2005): depth-4 × width-1024 counter grid, each row incrementing
    // one bucket per depth (bucket = md5 of depth-salted key), point
    // estimate = MIN over depths of the probed counters. Like the KMV
    // sketch — and unlike engine-private HLL state — the grid is pure
    // md5 arithmetic, so both engines build the IDENTICAL sketch and
    // the ESTIMATES hash-match (the CMS guarantee est ≥ exact is also
    // emitted and must hold as ≥ 0 slack on both). Scale: the build is
    // one partial-agg shuffle whose post-combine volume is ≤ 4×1024
    // counters per partition REGARDLESS of row count — the sketch is
    // the mergeable state a streaming or federated frequency monitor
    // ships instead of raw keys. Probes read ≤ depth rows per key via
    // one broadcast-joined lookup of the known probe set.
    GraftQuery(
      "agg_cms_freq",
      (s, d) => {
        val (depth, width) = (4, 1024)
        def bucket(k: String, dn: String) =
          expr(s"cast(conv(substring(md5(concat(cast($dn as string), ':', $k)), 1, 8), 16, 10) as bigint) % $width")
        val rows = Tables.orders(s, d)
          .select(col("o_orderpriority").as("key"))
          .withColumn("d", explode(expr(s"sequence(0, ${depth - 1})")))
          .select(col("d"), bucket("key", "d").as("b"))
        val grid = rows.groupBy(col("d"), col("b"))
          .agg(count(lit(1)).as("cnt"))
        val probes = Tables.orders(s, d)
          .select(col("o_orderpriority").as("key")).distinct()
          .withColumn("d", explode(expr(s"sequence(0, ${depth - 1})")))
          .select(col("key"), col("d"), bucket("key", "d").as("b"))
        val est = probes.join(grid, Seq("d", "b"))
          .groupBy(col("key")).agg(min(col("cnt")).as("cms_est"))
        val exact = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("key"))
          .agg(count(lit(1)).as("exact_cnt"))
        est.join(exact, Seq("key"))
          .select(col("key"), col("cms_est"), col("exact_cnt"),
            (col("cms_est") - col("exact_cnt")).as("overcount"))
          .orderBy(col("key"))
      },
      Some("""
        WITH keyed AS (
          SELECT o_orderpriority AS key, d,
                 (('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || o_orderpriority), 1, 8))::BIGINT) % 1024 AS b
          FROM orders CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS d)),
        grid AS (
          SELECT d, b, COUNT(*) AS cnt FROM keyed GROUP BY d, b),
        probes AS (
          SELECT DISTINCT key, d, b FROM keyed),
        est AS (
          SELECT key, MIN(cnt) AS cms_est
          FROM probes JOIN grid USING (d, b) GROUP BY key),
        exact AS (
          SELECT o_orderpriority AS key, COUNT(*) AS exact_cnt
          FROM orders GROUP BY 1)
        SELECT key, cms_est, exact_cnt, cms_est - exact_cnt AS overcount
        FROM est JOIN exact USING (key)
        ORDER BY key
      """)),

    // ───── theta-sketch set algebra: |A∩B|, |A\B|, |B\A|, |A∪B| estimates ─────
    // The set-operation sibling of agg_kmv_distinct (Dasgupta et al.,
    // "Theta-Sketch Framework", and the Apache DataSketches theta design):
    // COUNT DISTINCT composes under union (merge the sketches) but NOT
    // under intersection or difference — audience-overlap questions
    // ("customers active in both F and O order states") normally force a
    // full join of the raw key sets. The theta trick: keep each side's k
    // smallest md5 hashes, set θ = min of the two k-th minima, trim both
    // sketches to h < θ; within that common sampled region membership is
    // exact, so |A∩B| ≈ |{h < θ in both}|·M/θ (M = 2^60, the hash range).
    // All candidate math is md5/integer-exact; the single double division
    // per estimate makes the artifact hash-matchable, and the exact
    // answers are emitted beside the estimates (the agg_approx_* gate
    // pattern). When a side holds fewer than k keys its threshold is M
    // (the sketch IS the set and the estimates collapse toward exact).
    //
    // Scale shape: the per-side sketch is a k-row TakeOrdered-class state
    // (window rank over the hashed distinct keys — partial-agg combines
    // per partition first); everything downstream of the sketches touches
    // ≤ 2k rows — the exchange a federated overlap monitor ships is 2·64
    // longs REGARDLESS of key cardinality. The exact arms are one
    // distinct + one full-outer equi-join, present only as the oracle's
    // in-row truth.
    GraftQuery(
      "agg_kmv_setops",
      (s, d) => {
        val k = 64
        val maxH = 1152921504606846976L // 2^60: hashes are 15 hex digits
        val base = Tables.orders(s, d)
          .filter(col("o_orderstatus").isin("F", "O"))
          .select(when(col("o_orderstatus") === "F", "a").otherwise("b")
            .as("side"), col("o_custkey"))
          .distinct()
        val h = base.select(col("side"), expr(
          "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h")).distinct()
        val sk = h.withColumn("rn", row_number().over(
            Window.partitionBy(col("side")).orderBy(col("h"))))
          .filter(col("rn") <= k)
        val theta = sk.groupBy(col("side"))
          .agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
          .select(when(col("m") < k, lit(maxH)).otherwise(col("hk")).as("thr"))
          .agg(min(col("thr")).as("theta"))
        val trimmed = sk.filter(col("side") === "a").select(col("h").as("ha"))
          .join(sk.filter(col("side") === "b").select(col("h").as("hb")),
            col("ha") === col("hb"), "full_outer")
          .select(coalesce(col("ha"), col("hb")).as("h"),
            col("ha").isNotNull.as("ina"), col("hb").isNotNull.as("inb"))
          .crossJoin(broadcast(theta))
          .filter(col("h") < col("theta"))
        val cnts = trimmed.groupBy(col("theta")).agg(
          sum(when(col("ina") && col("inb"), 1L).otherwise(0L)).as("c_intersect"),
          sum(when(col("ina") && !col("inb"), 1L).otherwise(0L)).as("c_diff_ab"),
          sum(when(!col("ina") && col("inb"), 1L).otherwise(0L)).as("c_diff_ba"),
          count(lit(1)).as("c_union"))
        val exact = base.filter(col("side") === "a")
          .select(col("o_custkey").as("ka"))
          .join(base.filter(col("side") === "b")
            .select(col("o_custkey").as("kb")),
            col("ka") === col("kb"), "full_outer")
          .agg(
            sum(when(col("ka").isNotNull && col("kb").isNotNull, 1L)
              .otherwise(0L)).as("e_intersect"),
            sum(when(col("ka").isNotNull && col("kb").isNull, 1L)
              .otherwise(0L)).as("e_diff_ab"),
            sum(when(col("ka").isNull && col("kb").isNotNull, 1L)
              .otherwise(0L)).as("e_diff_ba"),
            count(lit(1)).as("e_union"))
        val one = cnts.crossJoin(exact)
        def arm(name: String, cC: String, eC: String): DataFrame =
          one.select(lit(name).as("measure"), col(cC).as("c_trim"),
            ((col(cC).cast("double") * lit(maxH.toDouble)) /
              col("theta").cast("double")).as("est"),
            col(eC).as("exact"))
        arm("diff_ab", "c_diff_ab", "e_diff_ab")
          .unionByName(arm("diff_ba", "c_diff_ba", "e_diff_ba"))
          .unionByName(arm("intersect", "c_intersect", "e_intersect"))
          .unionByName(arm("union", "c_union", "e_union"))
          .orderBy(col("measure"))
      },
      Some("""
        WITH base AS (
          SELECT DISTINCT CASE WHEN o_orderstatus = 'F' THEN 'a' ELSE 'b' END AS side,
                 o_custkey
          FROM orders WHERE o_orderstatus IN ('F', 'O')),
        h AS (
          SELECT DISTINCT side,
                 ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM base),
        sk AS (
          SELECT side, h FROM (
            SELECT side, h,
                   ROW_NUMBER() OVER (PARTITION BY side ORDER BY h) AS rn
            FROM h) t WHERE rn <= 64),
        th AS (
          SELECT MIN(thr) AS theta FROM (
            SELECT CASE WHEN COUNT(*) < 64 THEN 1152921504606846976
                        ELSE MAX(h) END AS thr
            FROM sk GROUP BY side) x),
        trimmed AS (
          SELECT COALESCE(a.h, b.h) AS h,
                 a.h IS NOT NULL AS ina, b.h IS NOT NULL AS inb, theta
          FROM (SELECT h FROM sk WHERE side = 'a') a
          FULL OUTER JOIN (SELECT h FROM sk WHERE side = 'b') b ON a.h = b.h
          CROSS JOIN th
          WHERE COALESCE(a.h, b.h) < theta),
        cnts AS (
          SELECT theta,
                 CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS c_intersect,
                 CAST(SUM(CASE WHEN ina AND NOT inb THEN 1 ELSE 0 END) AS BIGINT) AS c_diff_ab,
                 CAST(SUM(CASE WHEN inb AND NOT ina THEN 1 ELSE 0 END) AS BIGINT) AS c_diff_ba,
                 CAST(COUNT(*) AS BIGINT) AS c_union
          FROM trimmed GROUP BY theta),
        ex AS (
          SELECT CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS e_intersect,
                 CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS e_diff_ab,
                 CAST(SUM(CASE WHEN ka IS NULL AND kb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS e_diff_ba,
                 CAST(COUNT(*) AS BIGINT) AS e_union
          FROM (SELECT o_custkey AS ka FROM base WHERE side = 'a') a
          FULL OUTER JOIN (SELECT o_custkey AS kb FROM base WHERE side = 'b') b
            ON a.ka = b.kb),
        one AS (SELECT * FROM cnts CROSS JOIN ex)
        SELECT measure, c_trim, est, exact FROM (
          SELECT 'diff_ab' AS measure, c_diff_ab AS c_trim,
                 (CAST(c_diff_ab AS DOUBLE) * 1152921504606846976.0) /
                   CAST(theta AS DOUBLE) AS est,
                 e_diff_ab AS exact FROM one
          UNION ALL
          SELECT 'diff_ba', c_diff_ba,
                 (CAST(c_diff_ba AS DOUBLE) * 1152921504606846976.0) /
                   CAST(theta AS DOUBLE), e_diff_ba FROM one
          UNION ALL
          SELECT 'intersect', c_intersect,
                 (CAST(c_intersect AS DOUBLE) * 1152921504606846976.0) /
                   CAST(theta AS DOUBLE), e_intersect FROM one
          UNION ALL
          SELECT 'union', c_union,
                 (CAST(c_union AS DOUBLE) * 1152921504606846976.0) /
                   CAST(theta AS DOUBLE), e_union FROM one) u
        ORDER BY measure
      """))
  )
}
