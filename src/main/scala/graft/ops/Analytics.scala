package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytic surface beyond plain group-by: multi-dimensional aggregation
  * (rollup / cube / grouping sets), HAVING, exact distinct counts, window
  * functions (rank family, lag, running aggregates), set operations, and
  * the scalar function library (string / date / math / conditional / JSON).
  *
  * Scale notes (100 TB): rollup/cube expand grouping sets BEFORE the
  * shuffle, so partial aggregation still applies per set; window functions
  * shuffle once on the partition key then sort within partitions — the
  * partition key (user_id / o_custkey) must be high-cardinality, which it
  * is here; scalar functions are all whole-stage-codegen built-ins, zero
  * shuffle. Every window ORDER BY carries a unique tiebreak column so
  * results are deterministic under any partitioning.
  */
object Analytics extends QueryModule {
  import Parity.dsum

  override def queries: Seq[GraftQuery] = Seq(

    // ───── multi-dimensional aggregation ─────
    GraftQuery(
      "agg_rollup",
      (s, d) =>
        Tables.orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """)),

    GraftQuery(
      "agg_cube",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
                   col("l_linestatus").asc_nulls_first),
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
      """)),

    GraftQuery(
      "agg_grouping_sets",
      // Spark 4 first-class groupingSets API — no temp-view catalog side
      // effect (round-1 verdict: the view raced under concurrent execution).
      (s, d) =>
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """)),

    GraftQuery(
      "agg_having",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spent"))
          .filter(col("n_orders") >= 10)
          .orderBy(col("o_custkey")),
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 10
        ORDER BY o_custkey
      """)),

    GraftQuery(
      "agg_count_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ───── exact distinct via fixed-size bitmaps ─────
    // COUNT(DISTINCT) plans an expand + two shuffles carrying every
    // distinct VALUE. The bitmap formulation (Spark's native
    // bitmap_construct_agg over 32k-bit buckets) shuffles a ≤4 KB
    // bitmap per (group, value-bucket) REGARDLESS of row count, with
    // map-side partial OR-merge — the bounded-memory exact-distinct
    // shape for high-cardinality keys at 100 TB (the same two-level
    // idea as agg_salted_sum, with bitmaps as the mergeable partial).
    // Exact, so the oracle is plain COUNT(DISTINCT).
    GraftQuery(
      "agg_bitmap_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"),
            expr("bitmap_bucket_number(l_partkey)").as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))")
            .as("bmp"))
          .groupBy(col("l_returnflag"))
          .agg(sum(expr("bitmap_count(bmp)")).as("n_parts"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ───── window functions ─────
    GraftQuery(
      "win_topn_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) t
        WHERE rn <= 3 ORDER BY o_custkey, rn
      """)),

    GraftQuery(
      "win_rank_family",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(
            col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("o_orderstatus"), col("rnk"), col("o_orderkey"))
      },
      Some("""
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4)     OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
        ORDER BY o_orderstatus, rnk, o_orderkey
      """)),

    GraftQuery(
      "win_lag_delta",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(
            col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, value,
               LAG(value, 1) OVER w AS prev_value,
               value - LAG(value, 1) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ORDER BY user_id, event_id
      """)),

    GraftQuery(
      "win_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(
            col("event_id"), col("user_id"),
            sum(col("value").cast(DecimalType(18, 2))).over(w)
              .cast("double").as("running_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
      """)),

    // ───── set operations ─────
    GraftQuery(
      "set_union_distinct",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
          .distinct()
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_custkey
      """)),

    GraftQuery(
      "set_intersect",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
      """)),

    GraftQuery(
      "set_except",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.select(col("c_custkey"))
          .except(o.select(col("o_custkey").as("c_custkey")))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
        ORDER BY c_custkey
      """)),

    GraftQuery(
      "distinct_values",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ───── scalar function library ─────
    GraftQuery(
      "scalar_string_funcs",
      (s, d) =>
        Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          reverse(col("p_brand")).as("brand_rev"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               SUBSTRING(p_name, 1, 5) AS name_pfx,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
               REVERSE(p_brand) AS brand_rev,
               LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
        FROM part ORDER BY p_partkey
      """)),

    GraftQuery(
      "scalar_date_funcs",
      (s, d) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_eoy"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
               CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               STRFTIME(o_orderdate, '%Y-%m') AS ym,
               CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy
        FROM orders ORDER BY o_orderkey
      """)),

    GraftQuery(
      "scalar_math_funcs",
      (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          abs(col("c_acctbal")).as("bal_abs"),
          floor(col("c_acctbal")).cast("double").as("bal_floor"),
          ceil(col("c_acctbal")).cast("double").as("bal_ceil"),
          sqrt(abs(col("c_acctbal"))).as("bal_sqrt"),
          signum(col("c_acctbal")).as("bal_sign"),
          (col("c_custkey") % 7).cast("long").as("key_mod7"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
          least(col("c_acctbal"), lit(0.0)).as("bal_neg"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey,
               ABS(c_acctbal) AS bal_abs,
               CAST(FLOOR(c_acctbal) AS DOUBLE) AS bal_floor,
               CAST(CEIL(c_acctbal) AS DOUBLE) AS bal_ceil,
               SQRT(ABS(c_acctbal)) AS bal_sqrt,
               CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
               CAST(c_custkey % 7 AS BIGINT) AS key_mod7,
               GREATEST(c_acctbal, 0.0) AS bal_pos,
               LEAST(c_acctbal, 0.0) AS bal_neg
        FROM customer ORDER BY c_custkey
      """)),

    GraftQuery(
      "scalar_conditional",
      (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER"))
            .as("segment_masked"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked
        FROM customer ORDER BY c_custkey
      """)),

    // ───── exact discrete quartiles (p25/p50/p75) per group ─────
    // The exact counterpart of agg_approx_quantile for when the SLA
    // says "the real p99, not an estimate": discrete quantile = the
    // value at 1-based rank ceil(q·n) under a total order. Ranks are
    // exact integers, values are PICKED (never summed), so the result
    // is engine-identical. One shuffle on the group key; the per-group
    // sort is the inherent cost of exact order statistics (that cost
    // is exactly why agg_approx_quantile exists for the common case).
    GraftQuery(
      "agg_quartiles_exact",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val ranked = Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("o_orderstatus"))))
        ranked
          .filter(col("rn") === expr("CAST(ceil(0.25 * n) AS BIGINT)") ||
            col("rn") === expr("CAST(ceil(0.50 * n) AS BIGINT)") ||
            col("rn") === expr("CAST(ceil(0.75 * n) AS BIGINT)"))
          .groupBy(col("o_orderstatus"))
          .agg(
            min(when(col("rn") === expr("CAST(ceil(0.25 * n) AS BIGINT)"),
              col("o_totalprice"))).as("p25"),
            min(when(col("rn") === expr("CAST(ceil(0.50 * n) AS BIGINT)"),
              col("o_totalprice"))).as("p50"),
            min(when(col("rn") === expr("CAST(ceil(0.75 * n) AS BIGINT)"),
              col("o_totalprice"))).as("p75"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        WITH ranked AS (
          SELECT o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
          FROM orders)
        SELECT o_orderstatus,
               MIN(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                   THEN o_totalprice END) AS p25,
               MIN(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                   THEN o_totalprice END) AS p50,
               MIN(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                   THEN o_totalprice END) AS p75
        FROM ranked
        WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)
           OR rn = CAST(ceil(0.50 * n) AS BIGINT)
           OR rn = CAST(ceil(0.75 * n) AS BIGINT)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
      """)),

    // ───── ntile: equal-frequency quartile assignment ─────
    // Quartiles of order value within each status, summarized per
    // bucket. NTILE's distribution rule (first n mod k buckets get one
    // extra row) is SQL-standard and engine-identical GIVEN a total
    // order, so the ORDER BY carries the orderkey tiebreak — without
    // it, equal prices could legally land in different buckets per
    // engine. One shuffle on the status key; the per-group sort is the
    // window's cost; the summary agg rides the same partitioning.
    GraftQuery(
      "win_ntile_buckets",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"))
          .groupBy(col("o_orderstatus"), col("quartile"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
          .orderBy(col("o_orderstatus"), col("quartile"))
      },
      Some("""
        WITH q AS (
          SELECT o_orderstatus, o_totalprice,
                 NTILE(4) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
                   AS quartile
          FROM orders)
        SELECT o_orderstatus, quartile, COUNT(*) AS n_orders,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        FROM q GROUP BY o_orderstatus, quartile
        ORDER BY o_orderstatus, quartile
      """)),

    // ───── running EXACT distinct count (first-occurrence flag) ─────
    // "How many distinct event types has this user exercised as of each
    // event" — the running COUNT(DISTINCT) window SQL engines refuse to
    // evaluate directly. The standard decomposition: flag each (user,
    // type)'s FIRST row (row_number = 1 under the event-time order),
    // then a running sum of flags under the same order. Both windows
    // key on the user (the second on a prefix of the first's key), so
    // the data shuffles once and per-task state is one counter — the
    // streaming-friendly shape, and exactly how a stream would
    // maintain it (seen-set per user bounded by the type domain).
    GraftQuery(
      "win_running_distinct",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
        val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        val wRun = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("is_first",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .withColumn("n_types_seen", sum(col("is_first")).over(wRun))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("n_types_seen"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_ns(ts) // 1000 AS ts_us
          FROM events),
        f AS (
          SELECT event_id, user_id, ts_us,
                 CASE WHEN ROW_NUMBER() OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts_us ASC, event_id ASC) = 1
                   THEN 1 ELSE 0 END AS is_first
          FROM e)
        SELECT event_id, user_id, ts_us,
               CAST(SUM(is_first) OVER (PARTITION BY user_id
                 ORDER BY ts_us ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_types_seen
        FROM f ORDER BY event_id
      """)),

    // ───── exact per-group mode with deterministic tie-break ─────
    // The modal l_quantity per return flag: highest occurrence count
    // wins, ties broken by the SMALLER value — spelled out on both
    // engines (DuckDB's mode() leaves ties unspecified, so the oracle
    // states the same two-level ranking instead). Scale: one partial-
    // agg shuffle on (group, value) — counts combine map-side — then a
    // per-group TakeOrdered of the tiny (group, value, cnt) frame; the
    // raw rows never shuffle twice. Quantities ride integer cents so
    // value ordering is exact.
    GraftQuery(
      "agg_mode_exact",
      (s, d) => {
        val counts = Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("qc"))
          .groupBy(col("l_returnflag"), col("qc"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cnt").desc, col("qc").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("qc").as("mode_qty_cents"),
            col("cnt").as("n_occurrences"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH counts AS (
          SELECT l_returnflag,
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        ranked AS (
          SELECT l_returnflag, qc, cnt,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY cnt DESC, qc ASC) AS rn
          FROM counts)
        SELECT l_returnflag, qc AS mode_qty_cents, cnt AS n_occurrences
        FROM ranked WHERE rn = 1
        ORDER BY l_returnflag
      """)),

    // ───── exact-stats Pearson correlation ─────
    // corr(quantity, extendedprice) per return flag from the six
    // sufficient statistics. Same exactness strategy as agg_regression
    // — integer-cent inputs, exact sums — with the headroom-limited
    // sums escalated to 128-bit exact integers (DECIMAL(38,0) in
    // Spark, HUGEINT in DuckDB — both exact, both cast to the same
    // IEEE double at the end). Per-row products fit int64 (xy ≤ 5e10,
    // x² ≤ 2.5e7, y² ≤ 1e14); it's their SUMS that outgrow it: Σy²
    // already at sf0.1, and Σxy (~5e22), Σx² (~2.5e19), Σy (~1e19)
    // within the ~1e12-row 100 TB regime — so all four ride 128-bit.
    // Σx tops out near 5e15 at that scale and stays int64. At 100 TB
    // the largest 128-bit sum ≈ 1e26, 12 orders inside the 38-digit
    // range. The final corr is one identical double expression tree
    // over the exact stats; sqrt is IEEE-correctly-rounded on both
    // JVMs and libm, so the value hash-matches. Scale: one partial-agg
    // shuffle carrying 6 numbers per group.
    GraftQuery(
      "stats_corr",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("xc"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("yc"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("xc")).as("sx"),
            sum(col("yc").cast(DecimalType(38, 0))).as("sy"),
            sum((col("xc") * col("yc")).cast(DecimalType(38, 0))).as("sxy"),
            sum((col("xc") * col("xc")).cast(DecimalType(38, 0))).as("sxx"),
            sum(col("yc").cast(DecimalType(38, 0)) * col("yc")).as("syy_dec"))
          .select(col("l_returnflag"), col("n"),
            expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                     sqrt(CAST(n AS DOUBLE) * CAST(syy_dec AS DOUBLE) -
                          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""")
              .as("corr_qty_price"))
          .orderBy(col("l_returnflag")),
      Some("""
        WITH pts AS (
          SELECT l_returnflag,
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
          FROM lineitem),
        sums AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xc) AS BIGINT) AS sx,
                 SUM(CAST(yc AS HUGEINT)) AS sy,
                 SUM(CAST(xc * yc AS HUGEINT)) AS sxy,
                 SUM(CAST(xc * xc AS HUGEINT)) AS sxx,
                 SUM(CAST(yc AS HUGEINT) * yc) AS syy_dec
          FROM pts GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                sqrt(CAST(n AS DOUBLE) * CAST(syy_dec AS DOUBLE) -
                     CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 AS corr_qty_price
        FROM sums ORDER BY l_returnflag
      """)),

    // ───── higher central moments: skewness / excess kurtosis ─────
    // Same exact-sufficient-statistics discipline as stats_corr pushed
    // to the 3rd/4th powers: per-row cube/quad of the integer cents fit
    // int64 (5000⁴ ≈ 6e14), their SUMS ride 128-bit exactness
    // (DECIMAL(38,0) / HUGEINT — Σx⁴ passes int64 at sf0.1 already and
    // Σx³ would at cluster scale), and the central-moment algebra is
    // one shared double expression tree over the exact sums. m2^(3/2)
    // is spelled m2·sqrt(m2) — sqrt is IEEE-correctly-rounded on both
    // engines; pow() is NOT guaranteed to be and never appears. One
    // partial-agg shuffle carrying 5 numbers per group.
    // ───── block-jackknife confidence interval for a pipeline metric ─────
    // Error bars without distributional assumptions — the resampling
    // tool a data-quality gate wants around ANY scalar it monitors
    // (here: mean order value). Delete-a-group jackknife (Quenouille/
    // Tukey; the block variant is what large-scale A/B systems ship):
    // orders partition into B = 16 key-residue blocks, each replicate
    // is the metric with one block deleted, and var̂(θ̂) =
    // (B−1)/B · Σ_b (m_b − m̄)². Exact-integer discipline: replicate
    // means are deci-cent floor divisions (the leave-out numerator
    // rides DECIMAL(38,0)/HUGEINT so Σx·10 never wraps), the
    // deviation sum uses the algebraic identity B·Σm² − (Σm)² lifted
    // to 128-bit exact integers (both terms graze int64; DECIMAL(38,0)
    // here, HUGEINT in the oracle — same integers, cast to the same
    // double), and the ONLY floating point is the
    // final sqrt/scale on those exact integers — IEEE-correctly-rounded
    // on identical inputs, the stats_corr contract. Headroom: Σm² ≤
    // B·(mean in deci-cents)² is scale-INDEPENDENT (means don't grow
    // with the corpus), so the bound holds at any row count — but caps
    // the METRIC at ~2.9e9 deci-cents (mean ≈ $2.9M/order) before m²
    // wraps; deci-cents also floor the detectable se at 0.1 cent.
    // Larger-valued or finer metrics re-scale the quantum (documented
    // knob, not data-dependent).
    //
    // Scale shape (100 TB): one map-side-combined groupBy collapses the
    // corpus to B = 16 (block, count, sum) rows; everything after is
    // arithmetic on those 16 rows + one broadcast 1-row total. Adding a
    // grouped variant (CI per segment) is the same plan keyed by
    // (segment, block).
    GraftQuery(
      "stats_jackknife_ci",
      (s, d) => {
        val B = 16
        val blocks = Tables.orders(s, d)
          .select((col("o_orderkey") % B).as("b"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("xc"))
          .groupBy(col("b"))
          .agg(count(lit(1)).as("nb"), sum(col("xc")).cast("long").as("sb"))
        val tot = blocks.agg(sum(col("nb")).cast("long").as("n"),
          sum(col("sb")).cast("long").as("s"))
        val reps = blocks.crossJoin(broadcast(tot))
          .select(col("n"), col("s"),
            expr("CAST(CAST((s - sb) AS DECIMAL(38,0)) * 10 " +
              "div (n - nb) AS BIGINT)").as("mb"))
        reps
          .agg(max(col("n")).as("n"), max(col("s")).as("s"),
            count(lit(1)).as("n_blocks"),
            sum(col("mb")).cast("long").as("sm"),
            sum(col("mb") * col("mb")).cast("long").as("sm2"))
          .select(col("n"), col("n_blocks"),
            expr("CAST(CAST(s AS DECIMAL(38,0)) * 10 div n AS BIGINT)")
              .as("theta_dc"),
            expr("CAST(CAST(n_blocks AS DECIMAL(38,0)) * sm2 " +
              "- CAST(sm AS DECIMAL(38,0)) * sm AS DOUBLE)").as("ssd_scaled"))
          .withColumn("se_dc", expr(
            "sqrt(ssd_scaled * CAST(n_blocks - 1 AS DOUBLE))" +
              " / CAST(n_blocks AS DOUBLE)"))
          .select(col("n"), col("n_blocks"), col("theta_dc"),
            col("ssd_scaled"), col("se_dc"),
            expr("CAST(theta_dc AS DOUBLE) - 1.96 * se_dc").as("ci_lo_dc"),
            expr("CAST(theta_dc AS DOUBLE) + 1.96 * se_dc").as("ci_hi_dc"))
      },
      Some("""
        WITH pts AS (
          SELECT o_orderkey % 16 AS b,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
          FROM orders),
        blocks AS (
          SELECT b, CAST(COUNT(*) AS BIGINT) AS nb,
                 CAST(SUM(xc) AS BIGINT) AS sb
          FROM pts GROUP BY b),
        tot AS (
          SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(sb) AS BIGINT) AS s
          FROM blocks),
        reps AS (
          SELECT n, s,
                 CAST(CAST((s - sb) AS HUGEINT) * 10 // (n - nb) AS BIGINT)
                   AS mb
          FROM blocks CROSS JOIN tot),
        agg AS (
          SELECT MAX(n) AS n, MAX(s) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 CAST(SUM(mb) AS BIGINT) AS sm,
                 CAST(SUM(mb * mb) AS BIGINT) AS sm2
          FROM reps),
        core AS (
          SELECT n, n_blocks,
                 CAST(CAST(s AS HUGEINT) * 10 // n AS BIGINT) AS theta_dc,
                 CAST(CAST(n_blocks AS HUGEINT) * sm2
                   - CAST(sm AS HUGEINT) * sm AS DOUBLE) AS ssd_scaled
          FROM agg),
        se AS (
          SELECT *, sqrt(ssd_scaled * CAST(n_blocks - 1 AS DOUBLE))
                   / CAST(n_blocks AS DOUBLE) AS se_dc
          FROM core)
        SELECT n, n_blocks, theta_dc, ssd_scaled, se_dc,
               CAST(theta_dc AS DOUBLE) - 1.96 * se_dc AS ci_lo_dc,
               CAST(theta_dc AS DOUBLE) + 1.96 * se_dc AS ci_hi_dc
        FROM se
      """)),

    GraftQuery(
      "stats_moments",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("xc"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("xc")).as("sx"),
            sum(col("xc") * col("xc")).as("s2"),
            sum((col("xc") * col("xc") * col("xc"))
              .cast(DecimalType(38, 0))).as("s3"),
            sum((col("xc") * col("xc") * col("xc") * col("xc"))
              .cast(DecimalType(38, 0))).as("s4"))
          .withColumn("mean",
            expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("m2",
            expr("CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean"))
          .withColumn("m3",
            expr("""CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) -
                    3 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) +
                    2 * mean * mean * mean"""))
          .withColumn("m4",
            expr("""CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) -
                    4 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) +
                    6 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) -
                    3 * mean * mean * mean * mean"""))
          .select(col("l_returnflag"), col("n"), col("mean"),
            expr("m3 / (m2 * sqrt(m2))").as("skewness"),
            expr("m4 / (m2 * m2) - 3").as("kurtosis"))
          .orderBy(col("l_returnflag")),
      Some("""
        WITH pts AS (
          SELECT l_returnflag,
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
          FROM lineitem),
        sums AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xc) AS BIGINT) AS sx,
                 CAST(SUM(xc * xc) AS BIGINT) AS s2,
                 SUM(CAST(xc * xc * xc AS HUGEINT)) AS s3,
                 SUM(CAST(xc * xc * xc * xc AS HUGEINT)) AS s4
          FROM pts GROUP BY l_returnflag),
        m AS (
          SELECT *, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean
          FROM sums),
        c AS (
          SELECT l_returnflag, n, mean,
                 CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean AS m2,
                 CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) -
                   3 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) +
                   2 * mean * mean * mean AS m3,
                 CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) -
                   4 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) +
                   6 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) -
                   3 * mean * mean * mean * mean AS m4
          FROM m)
        SELECT l_returnflag, n, mean,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) - 3 AS kurtosis
        FROM c ORDER BY l_returnflag
      """)),

    // ───── grouped closed-form OLS (price vs quantity per flag) ─────
    // The statistical-aggregate family beyond plain sums: per-group
    // slope/intercept from the five sufficient statistics. Exactness
    // strategy: x/y travel as INTEGER CENTS (double → DECIMAL(18,2) →
    // ×100 → BIGINT, exact at every step), so n/Sx/Sy/Sxy/Sxx are
    // exact longs that hash-match trivially; slope/intercept are then
    // ONE identical IEEE double expression tree on both engines over
    // those exact inputs — deterministic, no order-dependent float
    // summation anywhere. Scale: one partial-agg shuffle on the group
    // keys carrying 5 longs per group, the same cost as any sum.
    GraftQuery(
      "agg_regression",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("xc"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("yc"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
            sum(col("xc") * col("yc")).as("sxy"),
            sum(col("xc") * col("xc")).as("sxx"))
          .withColumn("slope",
            expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
              "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
              "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
              "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
          .withColumn("intercept",
            expr("(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / " +
              "CAST(n AS DOUBLE)"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        WITH pts AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
          FROM lineitem),
        sums AS (
          SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
                 CAST(SUM(xc * yc) AS BIGINT) AS sxy,
                 CAST(SUM(xc * xc) AS BIGINT) AS sxx
          FROM pts GROUP BY l_returnflag, l_linestatus),
        sl AS (
          SELECT *, (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
          FROM sums)
        SELECT l_returnflag, l_linestatus, n, sx, sy, sxy, sxx, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
               CAST(n AS DOUBLE) AS intercept
        FROM sl ORDER BY l_returnflag, l_linestatus
      """)),

    // JSON extraction from the events.props payload column
    GraftQuery(
      "json_extract_field",
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
               CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id
      """)),

    // ───── two-sample Kolmogorov–Smirnov drift gate (exact integer CDFs) ─────
    // Distribution drift between the English and the non-English corpus
    // slices on binned document length (bin = n_chars div 10) — the gate a
    // pipeline runs before training to catch a skewed refresh. KS over a
    // BINNED domain is the production form: the bin domain is bounded by
    // the value range, not the row count, so the final CDF walk costs the
    // same at 100 TB as at test scale. D = max over bins of |F_a − F_b|,
    // held as the integer cross-product |cum_a·nb − cum_b·na| in
    // DECIMAL(38,0) (1e12-row populations square to 1e24 — past int64, the
    // stats_corr doctrine), with ONE double division at the end, so the
    // statistic hash-matches bit-for-bit. ks_bin is the smallest bin
    // attaining the max (deterministic tie-break).
    //
    // Scale shape: one shuffle to count per bin (partial-agg combines to
    // ≤|bins| rows per partition), then a one-partition window over the
    // ≤|bins|-row grouped frame — metadata-class, not data-class. Totals
    // ride the same grouped frame; the 1-row frames broadcast.
    GraftQuery(
      "stats_ks_drift",
      (s, d) => {
        val bins = Tables.documents(s, d)
          .select(expr("n_chars div 10").as("bin"),
            when(col("lang") === "en", 1L).otherwise(0L).as("is_a"))
          .groupBy(col("bin"))
          .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
        val w = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bins.select(col("bin"),
          sum(col("ca")).over(w).cast(DecimalType(38, 0)).as("cum_a"),
          sum(col("cb")).over(w).cast(DecimalType(38, 0)).as("cum_b"))
        val tot = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val scored = cum.crossJoin(broadcast(tot))
          .select(col("bin"), col("na"), col("nb"),
            abs(col("cum_a") * col("nb") - col("cum_b") * col("na")).as("dev"))
        val mx = scored.agg(max(col("dev")).as("mdev"))
        scored.crossJoin(broadcast(mx))
          .filter(col("dev") === col("mdev"))
          .groupBy(col("na"), col("nb"))
          .agg(min(col("bin")).as("ks_bin"), max(col("dev")).as("dmax"))
          .select(col("na"), col("nb"), col("ks_bin"),
            col("dmax").cast("double").as("d_num"),
            (col("dmax").cast("double") /
              (col("na").cast("double") * col("nb").cast("double")))
              .as("d_stat"))
      },
      Some("""
        WITH b AS (
          SELECT n_chars // 10 AS bin,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
          FROM documents GROUP BY 1),
        c AS (
          SELECT bin,
                 CAST(SUM(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_a,
                 CAST(SUM(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_b
          FROM b),
        t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM b),
        sc AS (
          SELECT bin, na, nb, ABS(cum_a * nb - cum_b * na) AS dev
          FROM c CROSS JOIN t),
        m AS (SELECT MAX(dev) AS mdev FROM sc)
        SELECT na, nb, MIN(bin) AS ks_bin,
               CAST(MAX(dev) AS DOUBLE) AS d_num,
               CAST(MAX(dev) AS DOUBLE) /
                 (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d_stat
        FROM sc CROSS JOIN m
        WHERE dev = mdev
        GROUP BY na, nb
      """)),

    // ───── Mann–Whitney U (rank-sum) drift test — exact doubled ranks ─────
    // The location-shift sibling of stats_ks_drift: KS catches any CDF
    // gap, U asks specifically "does one slice stochastically dominate?"
    // (AUC = P(random en doc longer than random non-en doc)). Tied values
    // take midranks, which are half-integers — so everything rides the
    // DOUBLED rank: dm(v) = 2·cum_before + cnt + 1 is an exact integer,
    // R2 = Σ c·dm is 2× the classical rank sum, and 2U = R2 − n(n+1).
    // The per-value products reach n² (1e24 at 1e12 rows) — DECIMAL(38,0)
    // per the stats_corr doctrine. The only floats are the final casts
    // and ONE division for the AUC, shape-pinned on both engines.
    // Identity 2U_a + 2U_b = 2·na·nb is the in-spec exactness witness.
    //
    // Scale shape: identical to stats_ks_drift — one count-per-value
    // shuffle (partial-agg), then a one-partition walk over the grouped
    // value domain (bounded by |distinct n_chars|, not rows); the final
    // frame is a single global aggregate, no broadcast scalars at all.
    GraftQuery(
      "stats_mann_whitney",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("is_a"))
          .groupBy(col("v"))
          .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
          .withColumn("cnt", col("ca") + col("cb"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = g.select(col("ca"), col("cb"),
          (lit(2L) * (sum(col("cnt")).over(w) - col("cnt")) +
            col("cnt") + lit(1L)).cast(DecimalType(38, 0)).as("dm"))
        ranked.agg(
            sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
            sum(col("ca").cast(DecimalType(38, 0)) * col("dm")).as("r2a"),
            sum(col("cb").cast(DecimalType(38, 0)) * col("dm")).as("r2b"))
          .select(col("na"), col("nb"),
            (col("r2a") - col("na").cast(DecimalType(38, 0)) *
              (col("na") + lit(1L))).as("u2ad"),
            (col("r2b") - col("nb").cast(DecimalType(38, 0)) *
              (col("nb") + lit(1L))).as("u2bd"))
          .select(col("na"), col("nb"),
            col("u2ad").cast("double").as("u2_a"),
            col("u2bd").cast("double").as("u2_b"),
            (col("u2ad").cast("double") /
              (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
              .as("auc_a"))
      },
      Some("""
        WITH g AS (
          SELECT n_chars AS v,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
          FROM documents GROUP BY 1),
        r AS (
          SELECT ca, cb,
                 CAST(2 * (SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca + cb)) + (ca + cb) + 1 AS HUGEINT) AS dm
          FROM g),
        s AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
                 CAST(SUM(CAST(ca AS HUGEINT) * dm) AS HUGEINT) AS r2a,
                 CAST(SUM(CAST(cb AS HUGEINT) * dm) AS HUGEINT) AS r2b
          FROM r)
        SELECT na, nb,
               CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) AS u2_a,
               CAST(r2b - CAST(nb AS HUGEINT) * (nb + 1) AS DOUBLE) AS u2_b,
               CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) /
                 (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc_a
        FROM s
      """)),

    // ───── Population Stability Index — the industry drift metric ─────
    // Completes the drift-gate trio: KS = max CDF gap, Mann–Whitney =
    // location shift, PSI = mass-weighted divergence Σ(p−q)·log(p/q) —
    // the score every model-monitoring playbook thresholds (<0.1 stable,
    // >0.25 page). Base-2 via the chord log2 (IntMath): with add-1
    // smoothed bin counts, PSI₂·na·nb·2^20 =
    // Σ (ca·nb − cb·na)·(lg2fp(ca·nb) − lg2fp(cb·na)) is an exact
    // BIGINT (chord monotonicity makes every term ≥ 0, like the real
    // PSI), and ONE pinned division emits the score. Integer headroom:
    // the log argument ca·nb rides BIGINT through bin(), capping
    // populations at ~3e9 per side — past that, pre-aggregate bins to
    // proportions at a coarser fixed point (noted, not needed here).
    //
    // Scale shape: identical to the other gates — one count-per-bin
    // shuffle, then a one-partition fold over the value-bounded bin
    // frame; the 1-row smoothed-totals frame broadcasts.
    GraftQuery(
      "stats_psi_drift",
      (s, d) => {
        val bins = Tables.documents(s, d)
          .select(expr("n_chars div 10").as("bin"),
            when(col("lang") === "en", 1L).otherwise(0L).as("is_a"))
          .groupBy(col("bin"))
          .agg((sum(col("is_a")) + lit(1L)).as("ca"),
            (sum(lit(1L) - col("is_a")) + lit(1L)).as("cb"))
        val tot = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          count(lit(1)).as("n_bins"))
        bins.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"), col("n_bins"),
            ((col("ca") * col("nb") - col("cb") * col("na")) *
              (expr(IntMath.lg2fp("ca * nb")) -
               expr(IntMath.lg2fp("cb * na")))).as("term"))
          .groupBy(col("na"), col("nb"), col("n_bins"))
          .agg(sum(col("term")).as("psi2_num"))
          .select(col("na"), col("nb"), col("n_bins"), col("psi2_num"),
            (col("psi2_num").cast("double") /
              (lit(1048576.0) * col("na").cast("double") *
                col("nb").cast("double"))).as("psi2"))
      },
      Some(s"""
        WITH b AS (
          SELECT n_chars // 10 AS bin,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) + 1 AS BIGINT) AS cb
          FROM documents GROUP BY 1),
        t AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
                 CAST(COUNT(*) AS BIGINT) AS n_bins
          FROM b),
        terms AS (
          SELECT na, nb, n_bins,
                 (ca * nb - cb * na) *
                   ((${IntMath.lg2fpDuck("ca * nb")}) -
                    (${IntMath.lg2fpDuck("cb * na")})) AS term
          FROM b CROSS JOIN t)
        SELECT na, nb, n_bins,
               CAST(SUM(term) AS BIGINT) AS psi2_num,
               CAST(SUM(term) AS DOUBLE) /
                 (1048576.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS psi2
        FROM terms
        GROUP BY na, nb, n_bins
      """)),

    // ───── mutual information / pointwise MI — feature association ─────
    // The dataset-card diagnostic "is lang independent of source?": MI₂ =
    // Σ p(x,y)·log2(p(x,y)/(p(x)p(y))), with each cell's pointwise MI
    // (PMI) emitted per (lang, source) pair and the corpus MI on a final
    // '__all' row (the agg_kmv_distinct union-row convention). Chord
    // log2: pmi2_num = lg2fp(n·c_xy) − lg2fp(c_x·c_y) is an exact BIGINT
    // (terms are two-sided — a cell BELOW independence is negative, and
    // the chord's ±0.086-bit wobble can leave the tiny-MI total either
    // side of zero); the global numerator rides Σ c_xy·pmi2_num. One
    // fixed-constant division per PMI row, one pinned division for MI₂.
    // Headroom: log arguments n·c ≤ n² ride BIGINT through bin() — caps
    // n at ~3e9; past that pre-scale proportions (documented, as PSI).
    //
    // Scale shape: one (x, y) count shuffle (partial-agg), marginals
    // re-aggregate the ≤|X|·|Y| cell frame, scalars broadcast. The cell
    // domain is value-bounded — the same metadata-class property as the
    // drift gates.
    GraftQuery(
      "stats_mutual_info",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("c"))
        val cx = cells.groupBy(col("lang")).agg(sum(col("c")).as("cx"))
        val cy = cells.groupBy(col("source")).agg(sum(col("c")).as("cy"))
        val n = cells.agg(sum(col("c")).as("n"))
        val joined = cells.join(cx, "lang").join(cy, "source")
          .crossJoin(broadcast(n))
          .select(col("lang"), col("source"), col("c"),
            (expr(IntMath.lg2fp("n * c")) -
              expr(IntMath.lg2fp("cx * cy"))).as("pmi2_num"),
            col("n"))
        val pairs = joined.select(col("lang"), col("source"), col("c"),
          col("pmi2_num"),
          (col("pmi2_num").cast("double") / lit(1048576.0)).as("score"))
        val global = joined
          .groupBy(col("n"))
          .agg(sum(col("c") * col("pmi2_num")).as("mi2_num"))
          .select(lit("__all").as("lang"), lit("__all").as("source"),
            col("n").as("c"), col("mi2_num").as("pmi2_num"),
            (col("mi2_num").cast("double") /
              (lit(1048576.0) * col("n").cast("double"))).as("score"))
        pairs.unionByName(global).orderBy(col("lang"), col("source"))
      },
      Some(s"""
        WITH cells AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY lang, source),
        cx AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY lang),
        cy AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY source),
        nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        joined AS (
          SELECT cells.lang, cells.source, cells.c,
                 (${IntMath.lg2fpDuck("n * c")}) -
                   (${IntMath.lg2fpDuck("cx * cy")}) AS pmi2_num,
                 n
          FROM cells JOIN cx USING (lang) JOIN cy USING (source)
          CROSS JOIN nt),
        pairs AS (
          SELECT lang, source, c, pmi2_num,
                 CAST(pmi2_num AS DOUBLE) / 1048576.0 AS score
          FROM joined),
        gall AS (
          SELECT '__all' AS lang, '__all' AS source, n AS c,
                 CAST(SUM(c * pmi2_num) AS BIGINT) AS pmi2_num,
                 CAST(SUM(c * pmi2_num) AS DOUBLE) /
                   (1048576.0 * CAST(n AS DOUBLE)) AS score
          FROM joined GROUP BY n)
        SELECT lang, source, c, pmi2_num, score FROM pairs
        UNION ALL
        SELECT lang, source, c, pmi2_num, score FROM gall
        ORDER BY lang, source
      """)),

    // ───── sliced ROC-AUC: per-cohort ranking quality, exact midranks ─────
    // The model-eval table every scoring pipeline reports: does `value`
    // rank click events above non-clicks, per user cohort (user_id % 4 —
    // the slice key a real harness swaps for language/domain/market)?
    // AUC = P(score of a random positive > random negative) is exactly
    // the Mann–Whitney U normalized by np·nn, so the doubled-rank
    // machinery of stats_mann_whitney applies verbatim — midranks for
    // ties, every product on DECIMAL(38,0)/HUGEINT, one pinned division
    // per cohort for the final AUC.
    //
    // What is NEW vs stats_mann_whitney's global test: the rank walk is
    // PARTITIONED BY cohort — each segment's cumulative-count window is
    // its own partition, so the value-domain scans run in parallel
    // across slices instead of one global single-partition pass. That
    // is the sliced-eval shape at fleet scale: thousands of cohorts ⇒
    // thousands of independent walks, each bounded by its own distinct-
    // value count. One count-per-(seg, value) shuffle feeds everything.
    GraftQuery(
      "stats_auc",
      (s, d) => {
        val g = Tables.events(s, d)
          .select(expr("user_id % 4").as("seg"), col("value").as("v"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("is_p"))
          .groupBy(col("seg"), col("v"))
          .agg(sum(col("is_p")).as("cp"), sum(lit(1L) - col("is_p")).as("cn"))
          .withColumn("cnt", col("cp") + col("cn"))
        val w = Window.partitionBy(col("seg")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = g.select(col("seg"), col("cp"), col("cn"),
          (lit(2L) * (sum(col("cnt")).over(w) - col("cnt")) +
            col("cnt") + lit(1L)).cast(DecimalType(38, 0)).as("dm"))
        ranked.groupBy(col("seg"))
          .agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
            sum(col("cp").cast(DecimalType(38, 0)) * col("dm")).as("r2p"))
          .select(col("seg"), col("np"), col("nn"),
            (col("r2p") - col("np").cast(DecimalType(38, 0)) *
              (col("np") + lit(1L))).as("u2d"))
          .select(col("seg"), col("np"), col("nn"),
            col("u2d").cast("double").as("u2"),
            (col("u2d").cast("double") /
              (lit(2.0) * col("np").cast("double") * col("nn").cast("double")))
              .as("auc"))
          .orderBy(col("seg"))
      },
      Some("""
        WITH g AS (
          SELECT user_id % 4 AS seg, value AS v,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) AS BIGINT) AS cn
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT seg, cp, cn,
                 CAST(2 * (SUM(cp + cn) OVER (PARTITION BY seg ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (cp + cn)) + (cp + cn) + 1 AS HUGEINT) AS dm
          FROM g),
        a AS (
          SELECT seg, CAST(SUM(cp) AS BIGINT) AS np,
                 CAST(SUM(cn) AS BIGINT) AS nn,
                 CAST(SUM(CAST(cp AS HUGEINT) * dm) AS HUGEINT) AS r2p
          FROM r GROUP BY seg)
        SELECT seg, np, nn,
               CAST(r2p - CAST(np AS HUGEINT) * (np + 1) AS DOUBLE) AS u2,
               CAST(r2p - CAST(np AS HUGEINT) * (np + 1) AS DOUBLE) /
                 (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
        FROM a ORDER BY seg
      """)),

    // ───── calibration reliability table — is the score a probability? ─────
    // The companion diagnostic to stats_auc: AUC measures RANKING, this
    // measures CALIBRATION (Guo et al. 2017's reliability diagram as a
    // table). Events bucket by score band (fixed-width bands of `value`,
    // top band clamped); per band the table reports volume, the exact
    // positive rate in ppm (integer floor division — no float ratio),
    // and the band's mean score via the DECIMAL(18,2) exact-sum doctrine
    // with ONE pinned double division. A calibrated scorer has pos_ppm
    // tracking mean_score; the gap per band is the ECE summand the
    // monitoring gate thresholds.
    //
    // Scale: one count shuffle on the band key (partial-agg map-side),
    // output rows = band count (10) regardless of corpus size —
    // metadata-class, same as stats_histogram.
    GraftQuery(
      "stats_calibration",
      (s, d) => {
        Tables.events(s, d)
          .select(
            expr("least(CAST(floor(value / 50.0) AS BIGINT), 9L)").as("band"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("is_p"),
            expr("CAST(value AS DECIMAL(18,2))").as("vd"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), sum(col("is_p")).as("n_pos"),
            sum(col("vd")).as("sv"))
          .select(col("band"), col("n"), col("n_pos"),
            expr("n_pos * 1000000L DIV n").as("pos_ppm"),
            (col("sv").cast("double") / col("n").cast("double"))
              .as("mean_score"))
          .orderBy(col("band"))
      },
      Some("""
        WITH b AS (
          SELECT LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS band,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_p,
                 CAST(value AS DECIMAL(18,2)) AS vd
          FROM events)
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(is_p) AS BIGINT) AS n_pos,
               CAST(SUM(is_p) AS BIGINT) * 1000000 // COUNT(*) AS pos_ppm,
               CAST(SUM(vd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_score
        FROM b GROUP BY band ORDER BY band
      """)),

    // ───── Gini concentration: who owns the revenue? ─────
    // The inequality gate a curation pipeline runs on source/segment
    // concentration (a corpus where one domain owns 90% of tokens is a
    // skew and diversity problem): per market segment, the exact Gini
    // coefficient of per-customer order revenue. For cents sorted
    // ascending with rank i: G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ). Σi·xᵢ
    // rides DECIMAL(38,0) (int64 dies at n·x ≈ 10¹⁵ — n itself is the
    // overflow driver at corpus scale); the division is ONE pinned
    // IEEE double op (the stats_corr pattern). Ties sort by customer
    // key, but equal values make Σi·xᵢ tie-order-invariant anyway.
    //
    // Scale: one (custkey → revenue) aggregate, one segment-keyed rank
    // window, one per-segment fold — bounded output (one row per
    // segment). The rank window is the sort; nothing else is global.
    GraftQuery(
      "stats_gini",
      (s, d) => {
        val v = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment")),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
          .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("long").as("cents"))
        val r = v.withColumn("i", row_number().over(
          Window.partitionBy(col("seg"))
            .orderBy(col("cents").asc, col("o_custkey").asc)))
        r.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"),
            sum(expr("CAST(i AS DECIMAL(38,0)) * cents")).as("siw"))
          .select(col("seg"), col("n"), col("sum_cents"),
            (expr("CAST(2 * siw - (n + 1) * CAST(sum_cents AS DECIMAL(38,0)) AS DOUBLE)") /
              expr("CAST(CAST(n AS DECIMAL(38,0)) * sum_cents AS DOUBLE)"))
              .as("gini"))
          .orderBy(col("seg"))
      },
      Some("""
        WITH v AS (
          SELECT c.c_mktsegment AS seg, o.o_custkey,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        r AS (
          SELECT seg, cents,
                 ROW_NUMBER() OVER (PARTITION BY seg
                   ORDER BY cents, o_custkey) AS i
          FROM v),
        s AS (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS sum_cents,
                 SUM(CAST(i AS DECIMAL(38,0)) * cents) AS siw
          FROM r GROUP BY seg)
        SELECT seg, n, sum_cents,
               CAST(2 * siw - (n + 1) * CAST(sum_cents AS DECIMAL(38,0))
                 AS DOUBLE) /
               CAST(CAST(n AS DECIMAL(38,0)) * sum_cents AS DOUBLE) AS gini
        FROM s ORDER BY seg
      """)),

    // ───── Benford first-digit gate: does the data look organic? ─────
    // The forensic data-quality check: distribution of the first
    // significant digit of price cents vs Benford's law. The expected
    // ppm values are nine CONSTANTS (⌊log₁₀(1+1/d)·10⁶⌋ — stated as
    // literals in both engines, so no libm ever runs); observed ppm is
    // integer floor division over counts; the total rides a 9-row
    // unpartitioned window (never a cross join). Synthetic uniform
    // prices are loudly NON-Benford — that is the point of a gate.
    // Output is 9 rows regardless of scale; one count shuffle.
    GraftQuery(
      "stats_benford",
      (s, d) => {
        val digits = Tables.lineitem(s, d)
          .filter(col("l_extendedprice") > 0)
          .select(expr("""CAST(substring(CAST(
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS STRING), 1, 1) AS BIGINT)""").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val expected = Seq(
          (1L, 301029L), (2L, 176091L), (3L, 124938L), (4L, 96910L),
          (5L, 79181L), (6L, 66946L), (7L, 57991L), (8L, 51152L),
          (9L, 45757L))
        import s.implicits._
        val e = expected.toDF("digit", "exp_ppm")
        e.join(digits, Seq("digit"), "left")
          .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
            col("exp_ppm"))
          .withColumn("tot", sum(col("n")).over(
            Window.partitionBy(lit(1))))
          .select(col("digit"), col("n"),
            expr("n * 1000000L DIV tot").as("obs_ppm"), col("exp_ppm"),
            expr("abs(n * 1000000L DIV tot - exp_ppm)").as("dev_ppm"))
          .orderBy(col("digit"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM lineitem WHERE l_extendedprice > 0),
        o AS (
          SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM c GROUP BY 1),
        e AS (
          SELECT * FROM (VALUES
            (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
            (6, 66946), (7, 57991), (8, 51152), (9, 45757))
            ev(digit, exp_ppm)),
        j AS (
          SELECT CAST(e.digit AS BIGINT) AS digit,
                 CAST(COALESCE(o.n, 0) AS BIGINT) AS n,
                 CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
                 CAST(SUM(COALESCE(o.n, 0)) OVER () AS BIGINT) AS tot
          FROM e LEFT JOIN o ON o.digit = e.digit)
        SELECT digit, n, n * 1000000 // tot AS obs_ppm, exp_ppm,
               ABS(n * 1000000 // tot - exp_ppm) AS dev_ppm
        FROM j ORDER BY digit
      """)),

    // ───── cohort retention: the product-analytics triangle ─────
    // Users are cohorted by their FIRST active week (epoch-day div 7 —
    // pure integer epoch math, no calendar functions); retention at week
    // offset k is the distinct users of that cohort active k weeks
    // later, as an exact ppm of cohort size. Offsets capped at 8 (the
    // standard 8-week triangle). n_cohort is definitionally the
    // offset-0 row (a user is active in their own first week), joined
    // back rather than recomputed.
    //
    // Scale: the (user, week) activity set is ONE distinct shuffle;
    // cohorting is a per-user min; the triangle aggregate is a
    // count-distinct on (cohort, offset) — output is weeks × 9 rows,
    // metadata-class. Nothing holds per-user state beyond the aggregate.
    GraftQuery(
      "stats_cohort_retention",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000 div 7").as("wk"))
          .distinct()
        val cohort = b.groupBy(col("user_id")).agg(min(col("wk")).as("c_wk"))
        val act = b.join(cohort, Seq("user_id"))
          .select(col("c_wk"), (col("wk") - col("c_wk")).as("wk_offset"),
            col("user_id"))
          .filter(col("wk_offset") <= 8)
          .groupBy(col("c_wk"), col("wk_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
        val size = act.filter(col("wk_offset") === 0)
          .select(col("c_wk"), col("n_active").as("n_cohort"))
        act.join(size, Seq("c_wk"))
          .select(col("c_wk").as("cohort_week"), col("wk_offset"),
            col("n_active"), col("n_cohort"),
            expr("n_active * 1000000L div n_cohort").as("ret_ppm"))
          .orderBy(col("cohort_week"), col("wk_offset"))
      },
      Some("""
        WITH b AS (
          SELECT DISTINCT user_id,
                 (epoch_ns(ts) // 1000) // 86400000000 // 7 AS wk
          FROM events),
        cohort AS (
          SELECT user_id, MIN(wk) AS c_wk FROM b GROUP BY user_id),
        act AS (
          SELECT c.c_wk, b.wk - c.c_wk AS wk_offset,
                 CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS n_active
          FROM b JOIN cohort c ON c.user_id = b.user_id
          WHERE b.wk - c.c_wk <= 8
          GROUP BY 1, 2),
        sz AS (
          SELECT c_wk, n_active AS n_cohort FROM act WHERE wk_offset = 0)
        SELECT a.c_wk AS cohort_week, a.wk_offset, a.n_active, s.n_cohort,
               a.n_active * 1000000 // s.n_cohort AS ret_ppm
        FROM act a JOIN sz s ON s.c_wk = a.c_wk
        ORDER BY cohort_week, wk_offset
      """)),

    // ───── association rules: level-2 market-basket mining ─────
    // Apriori's workhorse layer over the co-line pair relation: for each
    // unordered part pair occurring in ≥ 2 distinct orders, support
    // counts, both conditional confidences, and lift — every measure an
    // exact ppm integer (lift_ppm = sup_ab·n_orders·10⁶ // (sup_a·sup_b);
    // int64-safe while sup_ab·n_orders < 9·10¹² — past that, ride the
    // numerator on DECIMAL(38,0)). Top-30 by (lift DESC, pair ASC) via a
    // TakeOrdered heap.
    //
    // Scale: pair candidates come from the ADJACENT-line join (linear in
    // lineitem, the coLineAdj bound — never per-order all-pairs);
    // supports are two distinct-aggregate shuffles; the order count is a
    // broadcast 1-row scalar (watermark-filter pattern).
    GraftQuery(
      "mine_assoc_rules",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            col("l_partkey").as("p"))
        val a = li.toDF("ok", "ln", "u")
        val bb = li.toDF("ok2", "ln2", "v")
        val pairs = a.join(bb,
            a("ok") === bb("ok2") && bb("ln2") === a("ln") + lit(1) &&
              a("u") =!= bb("v"))
          .select(col("ok"), least(col("u"), col("v")).as("x"),
            greatest(col("u"), col("v")).as("y"))
          .distinct()
        val supAB = pairs.groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("sup_ab")).filter(col("sup_ab") >= 2)
        val item = li.select(col("ok"), col("p")).distinct()
          .groupBy(col("p")).agg(count(lit(1)).as("sup"))
        val nOrders = li.agg(countDistinct(col("ok")).as("n_ord"))
        supAB
          .join(item.toDF("x", "sup_x"), Seq("x"))
          .join(item.toDF("y", "sup_y"), Seq("y"))
          .crossJoin(broadcast(nOrders))
          .select(col("x"), col("y"), col("sup_ab"), col("sup_x"),
            col("sup_y"),
            expr("sup_ab * 1000000L div sup_x").as("conf_xy_ppm"),
            expr("sup_ab * 1000000L div sup_y").as("conf_yx_ppm"),
            expr("sup_ab * n_ord * 1000000L div (sup_x * sup_y)")
              .as("lift_ppm"))
          .orderBy(col("lift_ppm").desc, col("x").asc, col("y").asc)
          .limit(30)
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey AS p
          FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.ok, LEAST(a.p, b.p) AS x, GREATEST(a.p, b.p) AS y
          FROM li a JOIN li b
            ON b.ok = a.ok AND b.ln = a.ln + 1 AND a.p <> b.p),
        sup AS (
          SELECT x, y, CAST(COUNT(*) AS BIGINT) AS sup_ab
          FROM pairs GROUP BY x, y HAVING COUNT(*) >= 2),
        item AS (
          SELECT p, CAST(COUNT(*) AS BIGINT) AS sup
          FROM (SELECT DISTINCT ok, p FROM li) i GROUP BY p),
        n0 AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_ord FROM li)
        SELECT s.x, s.y, s.sup_ab, ix.sup AS sup_x, iy.sup AS sup_y,
               s.sup_ab * 1000000 // ix.sup AS conf_xy_ppm,
               s.sup_ab * 1000000 // iy.sup AS conf_yx_ppm,
               s.sup_ab * n0.n_ord * 1000000 // (ix.sup * iy.sup) AS lift_ppm
        FROM sup s
        JOIN item ix ON ix.p = s.x
        JOIN item iy ON iy.p = s.y
        CROSS JOIN n0
        ORDER BY lift_ppm DESC, s.x ASC, s.y ASC LIMIT 30
      """)),

    // ───── two-proportion A/B test: the experimentation gate ─────
    // Arms by user parity, conversion = purchase events: exact integer
    // counts per arm, floor-division ppm rates, and the pooled
    // two-proportion z statistic. The z expression is ONE pinned chain
    // of IEEE ops (divisions of exact longs, a multiply chain, one
    // correctly-rounded sqrt) written token-identically in both
    // engines, so the double hash-matches — the stats_corr discipline.
    // The two 1-row arm frames meet in a broadcast cross join
    // (allowlisted watermark-filter pattern). One count shuffle on the
    // arm key; 1-row output at any scale.
    GraftQuery(
      "stats_ab_test",
      (s, d) => {
        val agg = Tables.events(s, d)
          .select((col("user_id") % 2).as("arm"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("conv"))
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("c"))
        val a = agg.filter(col("arm") === 0)
          .select(col("n").as("n_a"), col("c").as("conv_a"))
        val b = agg.filter(col("arm") === 1)
          .select(col("n").as("n_b"), col("c").as("conv_b"))
        a.crossJoin(broadcast(b))
          .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
            expr("conv_a * 1000000L div n_a").as("rate_a_ppm"),
            expr("conv_b * 1000000L div n_b").as("rate_b_ppm"),
            expr("""(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                     - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                    / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                            / CAST(n_a + n_b AS DOUBLE))
                           * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                              / CAST(n_a + n_b AS DOUBLE))
                           * (1.0 / CAST(n_a AS DOUBLE)
                              + 1.0 / CAST(n_b AS DOUBLE)))""").as("z"))
      },
      Some("""
        WITH g AS (
          SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS c
          FROM events GROUP BY 1),
        a AS (SELECT n AS n_a, c AS conv_a FROM g WHERE arm = 0),
        b AS (SELECT n AS n_b, c AS conv_b FROM g WHERE arm = 1)
        SELECT n_a, n_b, conv_a, conv_b,
               conv_a * 1000000 // n_a AS rate_a_ppm,
               conv_b * 1000000 // n_b AS rate_b_ppm,
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))) AS z
        FROM a CROSS JOIN b
      """)),

    // ───── Tukey-fence outlier gate: exact IQR per event type ─────
    // The data-cleaning rule every ingest pipeline applies before
    // aggregates see the data: values outside [q1 − 1.5·IQR,
    // q3 + 1.5·IQR] per event type, with EXACT discrete quartiles (the
    // agg_quartiles_exact rank-pick, not an estimate — a fence built on
    // an approximate quantile moves run to run and cannot be
    // hash-gated). Everything rides integer cents: the 1.5 factor is
    // ·3 div 2 on a non-negative IQR, so both engines floor alike; the
    // output is the per-type fence plus the outlier count and ppm — the
    // artifact a quality monitor alerts on.
    //
    // Scale shape: one shuffle on the type key for the rank window (the
    // exact-order-statistics cost, stated at agg_quartiles_exact), one
    // re-join of the |types|-row fence frame back to the scan (AQE
    // broadcasts it), one count aggregate. |types| rows out.
    GraftQuery(
      "stats_iqr_outliers",
      (s, d) => {
        // NULL values are filtered on BOTH sides: Spark's ASC window
        // order puts NULLs first while DuckDB's puts them last, so an
        // unfiltered rank pick would diverge on any NULL-bearing type
        // (the win_rolling_median contract)
        val cents = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents").asc, col("event_id").asc)
        val ranked = cents
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
        val fences = ranked
          .filter(col("rn") === expr("CAST(ceil(0.25 * n) AS BIGINT)") ||
            col("rn") === expr("CAST(ceil(0.75 * n) AS BIGINT)"))
          .groupBy(col("event_type"))
          .agg(
            min(when(col("rn") === expr("CAST(ceil(0.25 * n) AS BIGINT)"),
              col("cents"))).as("q1_cents"),
            min(when(col("rn") === expr("CAST(ceil(0.75 * n) AS BIGINT)"),
              col("cents"))).as("q3_cents"))
          .select(col("event_type"), col("q1_cents"), col("q3_cents"),
            (col("q3_cents") - col("q1_cents")).as("iqr_cents"))
          .select(col("event_type"), col("q1_cents"), col("q3_cents"),
            col("iqr_cents"),
            expr("q1_cents - (3 * iqr_cents) div 2").as("lo_cents"),
            expr("q3_cents + (3 * iqr_cents) div 2").as("hi_cents"))
        cents.join(fences, Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("q1_cents")).as("q1_cents"),
            min(col("q3_cents")).as("q3_cents"),
            min(col("iqr_cents")).as("iqr_cents"),
            min(col("lo_cents")).as("lo_cents"),
            min(col("hi_cents")).as("hi_cents"),
            count(when(col("cents") < col("lo_cents") ||
              col("cents") > col("hi_cents"), 1)).as("n_outliers"))
          .select(col("event_type"), col("n"), col("q1_cents"),
            col("q3_cents"), col("iqr_cents"), col("lo_cents"),
            col("hi_cents"), col("n_outliers"),
            expr("n_outliers * 1000000L div n").as("outlier_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH cents AS (
          SELECT event_type, event_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL),
        ranked AS (
          SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY cents ASC, event_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM cents),
        q AS (
          SELECT event_type,
                 MIN(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                     THEN cents END) AS q1_cents,
                 MIN(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                     THEN cents END) AS q3_cents
          FROM ranked
          WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)
             OR rn = CAST(ceil(0.75 * n) AS BIGINT)
          GROUP BY event_type),
        f AS (
          SELECT event_type, q1_cents, q3_cents,
                 q3_cents - q1_cents AS iqr_cents,
                 q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS lo_cents,
                 q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS hi_cents
          FROM q)
        SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(q1_cents) AS q1_cents, MIN(q3_cents) AS q3_cents,
               MIN(iqr_cents) AS iqr_cents, MIN(lo_cents) AS lo_cents,
               MIN(hi_cents) AS hi_cents,
               CAST(COUNT(*) FILTER (WHERE c.cents < lo_cents
                 OR c.cents > hi_cents) AS BIGINT) AS n_outliers,
               CAST(COUNT(*) FILTER (WHERE c.cents < lo_cents
                 OR c.cents > hi_cents) AS BIGINT) * 1000000 // COUNT(*)
                 AS outlier_ppm
        FROM cents c JOIN f USING (event_type)
        GROUP BY c.event_type
        ORDER BY c.event_type
      """))
  )
}
