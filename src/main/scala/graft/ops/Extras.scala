package graft.ops

import graft.{GraftQuery, Materialize, QueryModule, Sizing, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Coverage extras: pivot, array/higher-order scalar functions, multiset
  * (ALL) set operations, and frame-based window functions. All narrow or
  * single-shuffle plans; nothing here introduces a new scale hazard —
  * pivot's column explosion is bounded by the explicit value list (the
  * unbounded-pivot variant would be a driver-side distinct, deliberately
  * avoided).
  */
object Extras extends QueryModule {

  override def queries: Seq[GraftQuery] = Seq(

    // ───── pivot with an explicit value list (no driver-side distinct) ─────
    GraftQuery(
      "agg_pivot_status_priority",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus"),
            coalesce(col("1-URGENT"), lit(0L)).as("p1_urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("p2_high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("p3_medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p4_not_specified"),
            coalesce(col("5-LOW"), lit(0L)).as("p5_low"))
          .orderBy(col("o_orderstatus")),
      Some("""
        SELECT o_orderstatus,
               COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
               COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
               COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
               COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
               COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5_low
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """)),

    // ───── array construction / membership / slice / sort ─────
    GraftQuery(
      "scalar_array_funcs",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            array_contains(col("toks"), "spark").as("has_spark"),
            col("toks").getItem(1).as("second_tok"),
            array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), ",")
              .as("first3_sorted"),
            expr("size(filter(toks, t -> length(t) > 5))").cast("long")
              .as("n_long_toks"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               string_split(text, ' ')[2] AS second_tok,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                 AS first3_sorted,
               CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT)
                 AS n_long_toks
        FROM documents ORDER BY doc_id
      """)),

    // ───── multiset set operations (duplicate-preserving) ─────
    GraftQuery(
      "set_intersect_all",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersectAll(
            o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_custkey
      """)),

    GraftQuery(
      "set_except_all",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .exceptAll(
            o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_custkey
      """)),

    // ───── distribution window functions (exact integer-ratio doubles) ─────
    GraftQuery(
      "win_dist_family",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
        ORDER BY o_orderkey
      """)),

    // ───── unpivot / melt (wide → long reshape) ─────
    GraftQuery(
      "reshape_unpivot",
      (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"),
            col("p_size").cast("double").as("size"),
            col("p_retailprice").as("retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("size"), col("retailprice")), "metric", "value")
          .orderBy(col("p_partkey"), col("metric")),
      Some("""
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
        ORDER BY p_partkey, metric
      """)),

    // ───── corpus-level top n-grams (document frequency ranking) ─────
    GraftQuery(
      "text_ngram_top",
      (s, d) =>
        Dedup.shingles(s, d)
          .groupBy(col("shingle"))
          .agg(count(lit(1)).as("doc_freq"))
          .orderBy(col("doc_freq").desc, col("shingle").asc)
          .limit(20),
      Some("""
        WITH shingles AS (
          SELECT doc_id, shingle FROM (
            SELECT doc_id, UNNEST(list_transform(
              generate_series(1, len(string_split(text, ' ')) - 1),
              i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
            )) AS shingle
            FROM documents)
          GROUP BY doc_id, shingle)
        SELECT shingle, COUNT(*) AS doc_freq
        FROM shingles GROUP BY shingle
        ORDER BY doc_freq DESC, shingle ASC
        LIMIT 20
      """)),

    // ───── Zipf slope: is this corpus natural language? ─────
    // Natural text follows Zipf's law (frequency ∝ rank^-s, s ≈ 1);
    // spam, machine chrome, and template floods flatten or break the
    // curve, so the fitted exponent is a standard corpus-health gate in
    // crawl pipelines. The estimator is the two-point slope between
    // rank 1 and rank 2^j: s_j = (log2 f₁ − log2 f_{2^j}) / j, at the
    // power-of-two anchors j = 1..4 (rank 16 is the deepest anchor this
    // synthetic 31-word vocabulary guarantees; a real corpus extends the
    // anchor ladder, same plan). log2 is the exact chord-log2 fixed
    // point (IntMath — no libm), the division by j is integer-exact,
    // and ONE pinned cast emits the float slope per anchor.
    //
    // Scale: one token-count shuffle (partial-agg map-side — counts,
    // never text, cross the wire), then a TakeOrdered top-16 heap; the
    // rank window runs over the 16-row result, not the vocabulary. The
    // diagnostic is O(scan) + O(vocab) like text_vocab_coverage.
    GraftQuery(
      "text_zipf_slope",
      (s, d) => {
        val top = Materialize.stage(
          Tables.documents(s, d)
            .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
              .as("token"))
            .groupBy(col("token")).agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("token").asc)
            .limit(16)
            // post-heap rank: the window sees 16 rows, never the vocab
            .withColumn("rnk", row_number().over(
              Window.orderBy(col("freq").desc, col("token").asc))))
        val f1 = top.filter(col("rnk") === 1).select(col("freq").as("f1"))
        top.filter(col("rnk").isin(2, 4, 8, 16))
          .crossJoin(broadcast(f1))
          .select(
            expr("CASE rnk WHEN 2 THEN 1L WHEN 4 THEN 2L WHEN 8 THEN 3L ELSE 4L END")
              .as("j"),
            col("rnk"), col("freq"),
            expr(s"((${IntMath.lg2fp("f1")}) - (${IntMath.lg2fp("freq")})) DIV " +
              "(CASE rnk WHEN 2 THEN 1L WHEN 4 THEN 2L WHEN 8 THEN 3L ELSE 4L END)")
              .as("slope_fp"))
          .withColumn("slope", col("slope_fp").cast("double") / lit(1048576.0))
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH tok AS (
          SELECT t AS token FROM (
            SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
          WHERE t <> ''),
        cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
                FROM tok GROUP BY token),
        top AS (
          SELECT token, freq,
                 ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rnk
          FROM cnt ORDER BY freq DESC, token ASC LIMIT 16),
        f1 AS (SELECT freq AS f1 FROM top WHERE rnk = 1)
        SELECT CAST(CASE rnk WHEN 2 THEN 1 WHEN 4 THEN 2 WHEN 8 THEN 3
                    ELSE 4 END AS BIGINT) AS j,
               rnk, freq,
               ((${IntMath.lg2fpDuck("f1")}) - (${IntMath.lg2fpDuck("freq")})) //
                 (CASE rnk WHEN 2 THEN 1 WHEN 4 THEN 2 WHEN 8 THEN 3
                  ELSE 4 END) AS slope_fp,
               CAST(((${IntMath.lg2fpDuck("f1")}) - (${IntMath.lg2fpDuck("freq")})) //
                 (CASE rnk WHEN 2 THEN 1 WHEN 4 THEN 2 WHEN 8 THEN 3
                  ELSE 4 END) AS DOUBLE) / 1048576.0 AS slope
        FROM top CROSS JOIN f1
        WHERE rnk IN (2, 4, 8, 16)
        ORDER BY rnk
      """)),

    // ───── corpus-frequency familiarity: a rule-ladder quality signal ─────
    // The fraction of a document's distinct bigrams that appear in the
    // corpus-wide top-1000 by document frequency — the cheap stand-in
    // for LM-perplexity scoring that real pretraining filters use for a
    // first pass (unusual-bigram-heavy docs are boilerplate/garble
    // candidates). All-rational math (count ratios, no logs), so the
    // oracle hash-matches bit-for-bit; the top-1000 boundary tie-breaks
    // by (doc_freq DESC, shingle ASC) on both engines.
    //
    // Scale shape: one shuffle to doc-frequency-count the shingle frame
    // (already staged once for all consumers), a TakeOrdered top-1000
    // (per-partition heaps), then a broadcast of those ≤1000 rows into
    // a per-doc membership count — the probe side never re-shuffles
    // beyond the doc_id agg. Docs with <2 tokens carry no bigrams and
    // are absent by definition (both engines derive from the same
    // shingle set).
    GraftQuery(
      "text_bigram_familiarity",
      (s, d) => {
        val sh = Dedup.shingles(s, d)
        val top = sh.groupBy(col("shingle"))
          .agg(count(lit(1)).as("doc_freq"))
          .orderBy(col("doc_freq").desc, col("shingle").asc)
          .limit(1000)
          .select(col("shingle").as("fam"))
        sh.join(broadcast(top), col("shingle") === col("fam"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), count(col("fam")).as("n_familiar"))
          .select(col("doc_id"), col("n_bigrams"), col("n_familiar"),
            (col("n_familiar").cast("double") / col("n_bigrams"))
              .as("fam_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH shingles AS (
          SELECT doc_id, shingle FROM (
            SELECT doc_id, UNNEST(list_transform(
              generate_series(1, len(string_split(text, ' ')) - 1),
              i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
            )) AS shingle
            FROM documents)
          GROUP BY doc_id, shingle),
        top AS (
          SELECT shingle AS fam FROM (
            SELECT shingle, COUNT(*) AS doc_freq
            FROM shingles GROUP BY shingle
            ORDER BY doc_freq DESC, shingle ASC
            LIMIT 1000) t)
        SELECT s.doc_id,
               COUNT(*) AS n_bigrams,
               COUNT(top.fam) AS n_familiar,
               CAST(COUNT(top.fam) AS DOUBLE) / COUNT(*) AS fam_ratio
        FROM shingles s LEFT JOIN top ON s.shingle = top.fam
        GROUP BY s.doc_id
        ORDER BY s.doc_id
      """)),

    // ───── frame-based moving aggregate (3-row decimal-exact average) ─────
    GraftQuery(
      "win_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(-2, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast("double") / count(lit(1)).over(w)).as("mov_avg_3"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w AS mov_avg_3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
      """)),

    // ───── rolling exact median over a 5-row frame ─────
    // Order statistics over a sliding frame — the robust-smoothing
    // companion to win_moving_avg's mean. No engine has a native
    // rolling exact median, but both can COLLECT the frame (≤5 values
    // — per-row state is the frame, a plan constant) and pick the
    // sorted middle; the LOWER median ((n+1) DIV 2, 1-based) makes
    // even-sized leading frames deterministic. Values are only sorted
    // and selected, never added, so doubles compare exactly. One
    // shuffle on the user key, one ordered scan. NULL values are
    // filtered explicitly on BOTH sides before framing: Spark's
    // collect_list drops NULLs while DuckDB's list() keeps them (and
    // list_sort collates them first), so without the filter the two
    // engines would pick different middles on any NULL-bearing frame —
    // the filter makes the median definition engine-independent instead
    // of leaning on the generated data being non-null.
    GraftQuery(
      "win_rolling_median",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(-4, Window.currentRow)
        Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("frame", collect_list(col("value")).over(w))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            expr("array_sort(frame)[cast((size(frame) + 1) div 2 as int) - 1]")
              .as("med5"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
          FROM events WHERE value IS NOT NULL),
        f AS (
          SELECT event_id, user_id, ts_us,
                 list(value) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS frame
          FROM e)
        SELECT event_id, user_id, ts_us,
               list_sort(frame)[CAST((len(frame) + 1) // 2 AS INTEGER)] AS med5
        FROM f ORDER BY event_id
      """)),

    // ───── RANGE-interval frame: trailing 1-hour sum per user ─────
    // The VALUE-based window frame (RANGE BETWEEN n PRECEDING), distinct
    // from the row-count frames above: the frame holds every event
    // whose timestamp falls in the trailing hour, however many rows
    // that is, and ORDER-BY peers (equal timestamps) enter the frame
    // together — standard SQL semantics both engines share. Timestamps
    // travel as epoch-µs BIGINTs (the engine's events convention), so
    // the frame bound is the integer 3_600_000_000 and the whole frame
    // definition is exact integer arithmetic; the summed measure rides
    // DECIMAL for cross-engine bit-equality. One shuffle on the user
    // key; per-task state is the sliding frame, bounded by event rate ×
    // 1 h — the streaming-friendly shape.
    GraftQuery(
      "win_time_range_sum",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("hour_sum",
            sum(col("value").cast(DecimalType(18, 6))).over(w)
              .cast("double"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("hour_sum"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, ts_us,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 AS hour_sum
        FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
              FROM events) e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)),

    // ───── time-series gap fill: dense hourly grid + forward fill ─────
    // The alignment step every downstream trainer/feature-store wants
    // from an event stream: resample each user's series onto a dense
    // hourly grid between their first and last observation, carrying
    // the last observed value across gaps (LOCF). Per (user, hour) the
    // representative is the LAST event by (ts_us, event_id) — a total
    // order, so the pick is engine-independent — selected via
    // ROW_NUMBER, and the fill itself is last_value(IGNORE NULLS) over
    // the grid: values are only COPIED, never computed, so doubles
    // hash-match bit-exactly. The grid's first cell is always observed
    // (it starts at the user's min bucket), so no leading NULL exists.
    // Scale: grid volume is Σ_users span-hours — linear in users at
    // constant per-user span, the shape a real fleet has. Four
    // key-bounded exchanges, all on (user) or (user, bucket): the
    // representative rank, the span aggregate, the grid⋈obs equi-join
    // (AQE broadcasts the span side when small), and the fill window.
    // Per-task state is one user-partition's grid; no driver action,
    // no broadcast of the event stream, nothing quadratic anywhere.
    GraftQuery(
      "ts_gap_fill",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("bucket", expr("ts_us div 3600000000"))
        // Sizing seam: clean through the 100× rung on the default plan,
        // but the 250× probe measured 31.7 GB of spill across the four
        // default-width grid exchanges (SCALE.md §19) — the same walls
        // ts_interpolate hit one rung earlier, fixed the same way: the
        // grid row count is exact from the staged span frame, and every
        // corpus exchange (rep dedup window, grid side, fill window,
        // final global sort) pins the sized width.
        val spans = Materialize.stage(b.groupBy(col("user_id"))
          .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi")))
        val gridRows = Option(
          spans.agg(sum(col("hi") - col("lo") + lit(1)).as("g"))
            .first().getAs[java.lang.Long]("g"))
          .map(_.longValue).getOrElse(0L)
        val n = Sizing.partitionsForBytes(s,
          Sizing.satAdd(Sizing.satMul(gridRows, 40L), Sizing.planBytes(b)))
        val wRep = Window.partitionBy(col("user_id"), col("bucket"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val rep = b.repartition(n, col("user_id"), col("bucket"))
          .withColumn("rn", row_number().over(wRep))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("bucket"), col("value").as("obs"))
        val grid = spans
          .select(col("user_id"),
            explode(expr("sequence(lo, hi)")).as("bucket"))
          .repartition(n, col("user_id"), col("bucket"))
        val wFill = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(rep, Seq("user_id", "bucket"), "left")
          .repartition(n, col("user_id"))
          .select(col("user_id"), col("bucket"),
            last(col("obs"), ignoreNulls = true).over(wFill).as("value_ff"),
            col("obs").isNotNull.as("observed"))
          .repartitionByRange(n, col("user_id"), col("bucket"))
          .sortWithinPartitions("user_id", "bucket")
      },
      Some("""
        WITH b AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
                 (epoch_ns(ts) // 1000) // 3600000000 AS bucket
          FROM events),
        rep AS (
          SELECT user_id, bucket, value AS obs FROM (
            SELECT user_id, bucket, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                     ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM b) t WHERE rn = 1),
        grid AS (
          SELECT user_id, UNNEST(generate_series(lo, hi)) AS bucket
          FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
                FROM b GROUP BY user_id) s0),
        j AS (
          SELECT g.user_id, g.bucket, r.obs
          FROM grid g LEFT JOIN rep r
            ON g.user_id = r.user_id AND g.bucket = r.bucket)
        SELECT user_id, bucket,
               LAST_VALUE(obs IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
               obs IS NOT NULL AS observed
        FROM j ORDER BY user_id, bucket
      """)),

    // ───── linear interpolation: the other gap-fill contract ─────
    // Same dense per-user hour grid as ts_gap_fill, but gaps take the
    // LINE between the surrounding observations instead of the carry:
    // v = prev + (next − prev) · (b − b_prev)/(b_next − b_prev). Four
    // ignore-nulls carries over ONE user_id exchange (prev/next value
    // and their bucket positions — each pair nulls out on the same rows,
    // so they are atomic); the grid spans first..last observation, so
    // every gap is INTERIOR and both carries always exist (no
    // extrapolation case). The interpolation itself is the same short IEEE
    // expression on both engines — a subtract, a divide of two small
    // exact ints, a multiply, an add, in pinned order — so doubles
    // hash-match. First grid cell is observed by construction (the grid
    // starts at each user's first event), so prev never nulls where used.
    GraftQuery(
      "ts_interpolate",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("bucket", expr("ts_us div 3600000000"))
        // Sizing seam (SCALE.md §4b): the dense grid rides THREE sorts
        // (SMJ + the two window orders) — 17 GB of spill at the 100× rung
        // in 32 partitions. The grid row count is exact and metadata-cheap
        // (1-row aggregate over the staged per-user span frame), so the
        // three corpus exchanges below — the dedup-window/join side on
        // (user_id, bucket), the grid side on (user_id, bucket), and the
        // carry-window side on user_id — each pin an explicit sized
        // hash partitioning. The pins REPLACE the engine-default
        // exchanges (the join reads both sides co-partitioned at n, the
        // windows' clustering is satisfied), so the exchange count is
        // unchanged and every sort buffer lands on the byte target.
        val spans = Materialize.stage(b.groupBy(col("user_id"))
          .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi")))
        val gridRows = Option(
          spans.agg(sum(col("hi") - col("lo") + lit(1)).as("g"))
            .first().getAs[java.lang.Long]("g"))
          .map(_.longValue).getOrElse(0L)
        // 40 B/grid row (user_id + bucket + carried obs/value UnsafeRow);
        // the events side of the join is bounded by the scan estimate
        val n = Sizing.partitionsForBytes(s,
          Sizing.satAdd(Sizing.satMul(gridRows, 40L), Sizing.planBytes(b)))
        val bP = b.repartition(n, col("user_id"), col("bucket"))
        val wRep = Window.partitionBy(col("user_id"), col("bucket"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val rep = bP.withColumn("rn", row_number().over(wRep))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("bucket"), col("value").as("obs"))
        val grid = spans
          .select(col("user_id"),
            explode(expr("sequence(lo, hi)")).as("bucket"))
          .repartition(n, col("user_id"), col("bucket"))
        val wPrev = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // the "next observation" carry is spelled as a RUNNING frame over
        // the DESCENDING bucket order, not first_value over an unbounded
        // FOLLOWING frame: Spark evaluates running frames incrementally
        // (O(rows) per partition) but re-scans following frames per row
        // (O(rows²) — measured 63 s vs 2.7 s for the LOCF twin at sf0.1).
        // Same partition key, opposite sort → one exchange, two
        // in-partition sorts (the ts_resample_ohlc pattern).
        val wNext = Window.partitionBy(col("user_id")).orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(rep, Seq("user_id", "bucket"), "left")
          .repartition(n, col("user_id"))
          .select(col("user_id"), col("bucket"), col("obs"),
            last(col("obs"), ignoreNulls = true).over(wPrev).as("pv"),
            last(when(col("obs").isNotNull, col("bucket")),
              ignoreNulls = true).over(wPrev).as("pb"),
            last(col("obs"), ignoreNulls = true).over(wNext).as("nv"),
            last(when(col("obs").isNotNull, col("bucket")),
              ignoreNulls = true).over(wNext).as("nb"))
          .select(col("user_id"), col("bucket"),
            when(col("obs").isNotNull, col("obs"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("bucket") - col("pb")).cast("double") /
                  (col("nb") - col("pb")).cast("double")))
              .as("v_interp"),
            col("obs").isNotNull.as("observed"))
          // the final GLOBAL sort is the fourth corpus exchange and must
          // ride the same sized width: a bare orderBy range-exchanges the
          // whole dense grid at the conf default (32), and the 250× rung
          // measured that one stage spilling 8 GB while every sized stage
          // above it stayed clean (SCALE.md §19). repartitionByRange(n) +
          // sortWithinPartitions IS orderBy's plan with an explicit width.
          .repartitionByRange(n, col("user_id"), col("bucket"))
          .sortWithinPartitions("user_id", "bucket")
      },
      Some("""
        WITH b AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
                 (epoch_ns(ts) // 1000) // 3600000000 AS bucket
          FROM events),
        rep AS (
          SELECT user_id, bucket, value AS obs FROM (
            SELECT user_id, bucket, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                     ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM b) t WHERE rn = 1),
        grid AS (
          SELECT user_id, UNNEST(generate_series(lo, hi)) AS bucket
          FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
                FROM b GROUP BY user_id) s0),
        j AS (
          SELECT g.user_id, g.bucket, r.obs
          FROM grid g LEFT JOIN rep r
            ON g.user_id = r.user_id AND g.bucket = r.bucket),
        c AS (
          SELECT user_id, bucket, obs,
                 LAST_VALUE(obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 LAST_VALUE(CASE WHEN obs IS NOT NULL THEN bucket END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
                 FIRST_VALUE(obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 FIRST_VALUE(CASE WHEN obs IS NOT NULL THEN bucket END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
          FROM j)
        SELECT user_id, bucket,
               CASE WHEN obs IS NOT NULL THEN obs
                    ELSE pv + (nv - pv) *
                         (CAST(bucket - pb AS DOUBLE) /
                          CAST(nb - pb AS DOUBLE)) END AS v_interp,
               obs IS NOT NULL AS observed
        FROM c ORDER BY user_id, bucket
      """)),

    // ───── seasonal profile: hour-of-day signature per user ─────
    // The seasonality half of drift monitoring (win_cusum_drift finds
    // WHEN a level moved; this states the daily shape it moved against):
    // per (user, hour-of-day), event count and fixed-point mean value,
    // plus the delta against the user's overall mean — the additive
    // seasonal component of a decomposition. Hour-of-day is pure integer
    // epoch math ((µs div 3600000000) % 24 — no calendar/timezone
    // functions, so both engines agree by construction); means are
    // cents·10⁶ floor divisions (event values are non-negative in this
    // schema, so floor vs truncate never diverges).
    //
    // Scale: ONE exchange on (user, hod) for the aggregate; the per-user
    // totals are window sums over the ≤24-row-per-user aggregate frame
    // (partitioning on user_id is a subset of the grouping key, so the
    // window re-uses the exchange). Output is ≤ 24 rows per user.
    GraftQuery(
      "ts_seasonal_profile",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"),
            expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
        b.groupBy(col("user_id"), col("hod"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("sc"))
          .withColumn("n_u",
            sum(col("n")).over(Window.partitionBy(col("user_id"))))
          .withColumn("sc_u",
            sum(col("sc")).over(Window.partitionBy(col("user_id"))))
          .select(col("user_id"), col("hod"), col("n"),
            expr("sc * 1000000L div n").as("mean_ppm"),
            expr("sc * 1000000L div n - sc_u * 1000000L div n_u")
              .as("seasonal_delta_ppm"))
          .orderBy(col("user_id"), col("hod"))
      },
      Some("""
        WITH b AS (
          SELECT user_id,
                 ((epoch_ns(ts) // 1000) // 3600000000) % 24 AS hod,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        g AS (
          SELECT user_id, hod, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS sc
          FROM b GROUP BY user_id, hod),
        t AS (
          SELECT user_id, hod, n, sc,
                 CAST(SUM(n) OVER (PARTITION BY user_id) AS BIGINT) AS n_u,
                 CAST(SUM(sc) OVER (PARTITION BY user_id) AS BIGINT) AS sc_u
          FROM g)
        SELECT user_id, hod, n, sc * 1000000 // n AS mean_ppm,
               sc * 1000000 // n - sc_u * 1000000 // n_u
                 AS seasonal_delta_ppm
        FROM t ORDER BY user_id, hod
      """)),

    // ───── OHLC resample: the downsampling half of the ts family ─────
    // Per (user, hour): open/close = the first/last event's value by
    // the (ts_us, event_id) total order (selected via two ROW_NUMBERs
    // inside one shuffle partition — same partition spec, opposite
    // orders, so Catalyst plans one exchange and two in-partition
    // sorts), high/low = value extremes (comparisons only — doubles
    // never enter arithmetic), volume = exact integer-cent sum riding
    // DECIMAL. The finance-bar shape, but equally the downsample step
    // a feature store runs before ts_gap_fill aligns the grid. One
    // shuffle on the user key; per-group state is O(1).
    GraftQuery(
      "ts_resample_ohlc",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("value"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .withColumn("bucket", expr("ts_us div 3600000000"))
        val pw = Window.partitionBy(col("user_id"), col("bucket"))
        val withRn = b
          .withColumn("rn_a", row_number().over(
            pw.orderBy(col("ts_us").asc, col("event_id").asc)))
          .withColumn("rn_d", row_number().over(
            pw.orderBy(col("ts_us").desc, col("event_id").desc)))
        withRn.groupBy(col("user_id"), col("bucket"))
          .agg(
            max(when(col("rn_a") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rn_d") === 1, col("value"))).as("close"),
            count(lit(1)).as("n_events"),
            sum(col("cents")).cast("long").as("vol_cents"))
          .orderBy(col("user_id"), col("bucket"))
      },
      Some("""
        WITH b AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                 (epoch_ns(ts) // 1000) // 3600000000 AS bucket
          FROM events),
        r AS (
          SELECT user_id, bucket, value, cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY ts_us ASC, event_id ASC) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY ts_us DESC, event_id DESC) AS rn_d
          FROM b)
        SELECT user_id, bucket,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high, MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS vol_cents
        FROM r GROUP BY user_id, bucket
        ORDER BY user_id, bucket
      """)),

    // ───── robust anomaly gate: per-user median/MAD (Hampel filter) ─────
    // The outlier screen a telemetry or feature pipeline runs before
    // training ever sees the series: flag events whose deviation from
    // the user's median exceeds 4× the median absolute deviation.
    // Median/MAD, not mean/stddev, because one corrupt reading drags a
    // mean arbitrarily (breakdown point 0) while the median tolerates
    // 50% contamination — the textbook Hampel identifier.
    // Both "medians" are the LOWER-median order statistic (rank
    // (n+1) div 2 under a total order), NOT the interpolated median —
    // engines define even-count interpolation differently, but a
    // selected order statistic is a COPIED value, engine-independent.
    // The only arithmetic on doubles is abs(value − med) (one IEEE
    // subtract, identical both engines) and the 4×mad threshold
    // (multiply by a power of two — exact); everything else is
    // comparison and copy, so the result hash-matches bit-for-bit.
    //
    // Scale: ONE exchange on the user key feeds everything — the rank
    // window, the median filter (a derived frame, so the med⋈events
    // join is co-partitioned with no further exchange), the deviation
    // rank, and the final per-user aggregate. Per-task state is one
    // user-partition's sort; no broadcast of the stream, no driver
    // state, nothing quadratic — the same single-shuffle class as
    // ts_resample_ohlc.
    GraftQuery(
      "ts_anomaly_mad",
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("value"))
        // staged ×2: r1 feeds both the median pick and the deviation
        // frame, dev feeds both the MAD pick and the final rollup —
        // unstaged, the ranked-window subplan re-executed per branch
        // (the bench audit's sr ≈ 3.8× sw recompute signature). Both
        // frames come out of a hash(user_id) window exchange, and
        // staging preserves that partitioning, so every downstream
        // user_id join/groupBy plans with no further exchange.
        val r1 = Materialize.stage(b
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("value").asc, col("event_id").asc)))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("user_id")))))
        val med = r1.filter(expr("rn = (n + 1) div 2"))
          .select(col("user_id"), col("n"), col("value").as("med"))
        val dev = Materialize.stage(r1.select(col("user_id"), col("value"))
          .join(med, Seq("user_id"))
          .select(col("user_id"), col("n"), col("med"),
            abs(col("value") - col("med")).as("dev")))
        val r2 = dev.withColumn("rn2", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("dev").asc)))
        val mad = r2.filter(expr("rn2 = (n + 1) div 2"))
          .select(col("user_id"), col("dev").as("mad"))
        dev.join(mad, Seq("user_id"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n"), max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(col("dev") > lit(4.0) * col("mad"), 1L)
              .otherwise(0L)).as("n_anom"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH v AS (SELECT user_id, event_id, value FROM events),
        r AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM v),
        m AS (SELECT user_id, n, value AS med FROM r WHERE rn = (n+1)//2),
        dv AS (
          SELECT r.user_id, m.n, m.med, ABS(r.value - m.med) AS dev
          FROM r JOIN m USING (user_id)),
        r2 AS (
          SELECT user_id, n, med, dev,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev) AS rn2
          FROM dv),
        md AS (SELECT user_id, dev AS mad FROM r2 WHERE rn2 = (n+1)//2)
        SELECT d.user_id, MAX(d.n) AS n, MAX(d.med) AS med,
               MAX(md.mad) AS mad,
               CAST(SUM(CASE WHEN d.dev > 4 * md.mad THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_anom
        FROM dv d JOIN md USING (user_id)
        GROUP BY d.user_id ORDER BY d.user_id
      """)),

    // ───── 8-tap half-life EWMA: the smoothing third of the family ─────
    // The classic α = 1/2 exponential smoother spelled as a FINITE
    // 8-tap kernel so it is exactly computable (the tail past 8 lags
    // weighs < 2⁻⁸ of the newest point): over the trailing ≤8-row
    // frame F (oldest→newest), weight of F[k] is 2^(lag) from the
    // literal array [1,2,…,128] — newest 128, halving backwards — and
    // ewma = Σ cents·w / Σ w in ONE double division over exact
    // integer sums. No pow(), no shifts: the weights are an inline
    // array literal both engines index identically (1-based in the
    // oracle, bridged by the bracket scanner). Leading short frames
    // self-normalize over the present taps. One shuffle on the user
    // key, one ordered scan; per-row state is the 8-value frame — the
    // streaming-friendly bound, same class as win_rolling_median.
    GraftQuery(
      "win_ewma_halflife",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(-7, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .withColumn("f", collect_list(col("cents")).over(w))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            expr("""
              CAST(aggregate(zip_with(f,
                     slice(array(1L,2L,4L,8L,16L,32L,64L,128L),
                           9 - size(f), size(f)),
                     (x, wt) -> x * wt), 0L, (a, b) -> a + b) AS DOUBLE)
              / aggregate(slice(array(1L,2L,4L,8L,16L,32L,64L,128L),
                           9 - size(f), size(f)), 0L, (a, b) -> a + b)
            """).as("ewma"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        f AS (
          SELECT event_id, user_id, ts_us,
                 list(cents) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fr
          FROM e)
        SELECT event_id, user_id, ts_us,
               CAST(list_reduce(list_transform(generate_series(1, len(fr)),
                      k -> fr[k] * (CASE 8 - len(fr) + k
                        WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4
                        WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32
                        WHEN 7 THEN 64 ELSE 128 END)),
                      (a, b) -> a + b) AS DOUBLE)
               / list_reduce(list_transform(generate_series(1, len(fr)),
                      k -> (CASE 8 - len(fr) + k
                        WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4
                        WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32
                        WHEN 7 THEN 64 ELSE 128 END)),
                      (a, b) -> a + b) AS ewma
        FROM f ORDER BY event_id
      """)),

    // ───── CUSUM drift detector: the changepoint gate of the family ─────
    // Page's cumulative-sum test, the standard "did this series shift
    // level?" monitor: track S_t = Σ (xᵢ − baseline) and report the
    // maximum excursion above the running minimum, max_t (S_t − min_{s≤t}
    // S_s) — large when the series drifts UP from its baseline and ~0
    // when it wanders. Baseline here is the user's FIRST observation
    // ("has the series left its starting level"); a production deploy
    // swaps in the in-control mean. Values ride exact integer cents
    // (DECIMAL(18,2)·100 — the ts_resample_ohlc doctrine), so running
    // sums, running minima, and the max excursion are all BIGINT-exact
    // and hash-match by construction; the changepoint is the excursion
    // argmax under a total order (stat DESC, ts ASC, event_id ASC) — a
    // copied value, never interpolated. The 100 000-cent flag threshold
    // sits at this corpus's median excursion; monitors tune it per
    // series class.
    //
    // Scale: ONE exchange on the user key feeds all three window passes
    // (running sum, running min, argmax rank — same partition spec, so
    // Catalyst plans one shuffle + in-partition sorts) and the final
    // per-user aggregate; per-task state is O(1) per row. Same
    // single-shuffle class as ts_resample_ohlc / ts_anomaly_mad.
    GraftQuery(
      "win_cusum_drift",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val b = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
        val st = b
          .withColumn("s_t",
            sum(col("cents")).over(w) -
              first(col("cents")).over(w) * count(lit(1)).over(w))
          .withColumn("stat", col("s_t") - min(col("s_t")).over(w))
        val ranked = st.withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("stat").desc, col("ts_us").asc, col("event_id").asc)))
        ranked.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            max(col("stat")).as("cusum_max"),
            max(when(col("rk") === 1, col("ts_us"))).as("cp_ts_us"),
            (max(col("stat")) > lit(100000L)).as("drifted"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH b AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        f AS (
          SELECT user_id, event_id, ts_us,
                 SUM(cents) OVER w -
                   FIRST_VALUE(cents) OVER w * (ROW_NUMBER() OVER w) AS s_t
          FROM b
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        g AS (
          SELECT user_id, event_id, ts_us,
                 CAST(s_t - MIN(s_t) OVER w2 AS BIGINT) AS stat
          FROM f
          WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        r AS (
          SELECT user_id, ts_us, stat,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY stat DESC, ts_us ASC, event_id ASC) AS rk
          FROM g)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               MAX(stat) AS cusum_max,
               MAX(CASE WHEN rk = 1 THEN ts_us END) AS cp_ts_us,
               MAX(stat) > 100000 AS drifted
        FROM r GROUP BY user_id ORDER BY user_id
      """)),

    // ───── last-touch attribution: conversions credited to channels ─────
    // The marketing/analytics staple: every purchase is credited to the
    // user's most recent preceding touch (click/view/signup), but only if
    // it landed within a 6-hour window — older touches report as
    // 'stale', purchases with no prior touch as 'none'. The carried
    // touch is ONE ignore-nulls last_value window per carried field
    // (type and timestamp null out on exactly the same rows, so the two
    // carries are atomic by construction); the window comparison is
    // integer microseconds, revenue is exact integer cents.
    //
    // Scale: one exchange on user_id feeds the ordered carry window,
    // then a channel-keyed aggregate over ONLY the purchase rows —
    // bounded output (≤ 5 channels). No joins, no self-reads; at 100 TB
    // the events frame bucketed on user_id makes the carry exchange-free.
    GraftQuery(
      "win_attribution",
      (s, d) => {
        val touch = Seq("click", "view", "signup")
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"),
            (col("value").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("t_type",
            last(when(col("event_type").isin(touch: _*), col("event_type")),
              ignoreNulls = true).over(w))
          .withColumn("t_us",
            last(when(col("event_type").isin(touch: _*), col("ts_us")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            when(col("t_us").isNull, lit("none"))
              .when(col("ts_us") - col("t_us") > lit(21600000000L), lit("stale"))
              .otherwise(col("t_type")).as("channel"),
            col("cents"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("purchases"),
            sum(col("cents")).cast("long").as("revenue_cents"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 epoch_ns(ts) // 1000 AS ts_us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        tt AS (
          SELECT event_id, user_id, event_type, ts_us, cents,
                 last_value(CASE WHEN event_type IN ('click','view','signup')
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS t_type,
                 last_value(CASE WHEN event_type IN ('click','view','signup')
                                 THEN ts_us END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS t_us
          FROM ev)
        SELECT CASE WHEN t_us IS NULL THEN 'none'
                    WHEN ts_us - t_us > 21600000000 THEN 'stale'
                    ELSE t_type END AS channel,
               CAST(COUNT(*) AS BIGINT) AS purchases,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM tt WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY channel
      """)),

    // ───── equi-width histogram: the profiling companion ─────
    // 20 equal-width buckets over l_extendedprice. min/max arrive as a
    // broadcast 1-row aggregate (the watermark-filter pattern — no
    // driver collect); the bucket index is two IEEE double ops in
    // identical order on both engines, then integer clamp. One narrow
    // projection + one count shuffle on the bucket id.
    GraftQuery(
      "stats_histogram",
      (s, d) => {
        val mm = Tables.lineitem(s, d)
          .agg(min(col("l_extendedprice")).as("mn"),
            max(col("l_extendedprice")).as("mx"))
        Tables.lineitem(s, d)
          .select(col("l_extendedprice").as("x"))
          .crossJoin(broadcast(mm))
          .select(least(lit(19L), floor(
            (col("x") - col("mn")) * lit(20.0) / (col("mx") - col("mn"))))
            .cast("long").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH mm AS (
          SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
          FROM lineitem)
        SELECT CAST(LEAST(19, FLOOR((l_extendedprice - mn) * 20.0 / (mx - mn)))
                 AS BIGINT) AS bucket,
               COUNT(*) AS n_rows
        FROM lineitem CROSS JOIN mm
        GROUP BY 1
        ORDER BY bucket
      """)),

    // ───── first / last / nth over a full-partition frame ─────
    GraftQuery(
      "win_first_last",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            first(col("o_orderkey")).over(w).as("first_order"),
            last(col("o_orderkey")).over(w).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER w AS last_order,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey
      """)),

    // ───── token-distribution drift: per-source χ² vs the corpus ─────
    // The distribution-shift monitor a training pipeline runs per
    // ingest batch: how far each source's token frequencies sit from
    // the corpus-wide profile, χ² over the top-50 corpus tokens.
    // Frequencies are fixed-point parts-per-million BIGINTs (integer
    // div — the rounding IS the metric's definition, identical on both
    // engines), each term (p−q)²/(p+q+1) is exact integer arithmetic
    // (diff² ≤ 1e12, 50 terms ≪ int64), so the statistic hash-matches
    // with no float summation anywhere. Scale: one token-count shuffle
    // per keying (corpus, per-source), a TakeOrdered top-50, and a
    // broadcast-sized (source × 50) probe — the sources dimension is
    // metadata-sized by nature.
    GraftQuery(
      "stats_chisq_sources",
      (s, d) => {
        // the explode itself is recomputed per consumer — measured A/B
        // at 10×: caching the token ROWS costs as much memory-write as
        // the narrow scan+split it saves (the three consumers' SHUFFLES
        // are distinct aggregations either way). What IS shared work is
        // `corpus` — the token-count aggregate feeds both its total and
        // the top-50 heap — so that one is staged.
        val toks = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val corpus = graft.Materialize.stage(toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("ct")))
        val corpusTot = corpus.agg(sum(col("ct")).as("t")) // 1 row
        val top = corpus
          .orderBy(col("ct").desc, col("tok").asc).limit(50)
        val srcTot = toks.groupBy(col("source"))
          .agg(count(lit(1)).as("ts"))
        val srcCnt = toks.join(broadcast(top.select(col("tok"))), Seq("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("cs"))
        srcTot.crossJoin(broadcast(top))
          .join(srcCnt, Seq("source", "tok"), "left")
          .na.fill(0L, Seq("cs"))
          .crossJoin(broadcast(corpusTot))
          .select(col("source"),
            expr("(cs * 1000000L) DIV ts").as("p_ppm"),
            expr("(ct * 1000000L) DIV t").as("q_ppm"))
          .select(col("source"),
            expr("((p_ppm - q_ppm) * (p_ppm - q_ppm)) DIV (p_ppm + q_ppm + 1)")
              .as("term"))
          .groupBy(col("source"))
          .agg(sum(col("term")).as("chisq_fp"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT source, UNNEST(string_split(text, ' ')) AS tok
          FROM documents),
        corpus AS (
          SELECT tok, COUNT(*) AS ct FROM toks GROUP BY tok),
        corpus_tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS t FROM corpus),
        top AS (
          SELECT tok, ct FROM corpus
          ORDER BY ct DESC, tok ASC LIMIT 50),
        src_tot AS (
          SELECT source, COUNT(*) AS ts FROM toks GROUP BY source),
        src_cnt AS (
          SELECT source, tok, COUNT(*) AS cs
          FROM toks JOIN (SELECT tok FROM top) USING (tok)
          GROUP BY source, tok),
        ppm AS (
          SELECT st.source,
                 (COALESCE(sc.cs, 0) * 1000000) // st.ts AS p_ppm,
                 (top.ct * 1000000) // ct2.t AS q_ppm
          FROM src_tot st CROSS JOIN top
          LEFT JOIN src_cnt sc ON sc.source = st.source AND sc.tok = top.tok
          CROSS JOIN corpus_tot ct2)
        SELECT source,
               CAST(SUM(((p_ppm - q_ppm) * (p_ppm - q_ppm))
                 // (p_ppm + q_ppm + 1)) AS BIGINT) AS chisq_fp
        FROM ppm GROUP BY source ORDER BY source
      """)),

    // ───── data expectations: the contract audit gate ─────
    // The Great-Expectations-shaped validation suite as ONE query: each
    // rule is a row (rule name, violation count, pass flag), so a
    // pipeline gates a load on `bool_and(pass)` and keeps the full
    // breakdown for the incident. Rules cover the contract classes a
    // lake actually enforces: key uniqueness (dup count), referential
    // integrity (orphan facts via anti join), domain checks (range,
    // enum membership), and completeness (null rate). Scale: the
    // rules share scans — uniqueness is one key-count agg, the orphan
    // check one shuffled anti join; everything else folds into
    // single-pass conditional counts at scan speed.
    GraftQuery(
      "stats_expectations",
      (s, d) => {
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        val dupKeys = o.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("viol"))
          .select(lit("orders_pk_unique").as("rule"), col("viol"))
        val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"),
            "left_anti")
          .agg(count(lit(1)).as("viol"))
          .select(lit("lineitem_fk_orders").as("rule"), col("viol"))
        val scans = o.agg(
            sum((col("o_totalprice") <= 0).cast("long")).as("price_pos"),
            sum((!col("o_orderstatus").isin("O", "F", "P")).cast("long"))
              .as("status_enum"),
            sum(col("o_orderdate").isNull.cast("long")).as("date_nn"))
          .select(expr(
            "stack(3, 'orders_price_positive', price_pos, " +
              "'orders_status_enum', status_enum, " +
              "'orders_date_not_null', date_nn) AS (rule, viol)"))
        dupKeys.unionByName(orphans).unionByName(scans)
          .select(col("rule"), coalesce(col("viol"), lit(0L)).as("viol"),
            (coalesce(col("viol"), lit(0L)) === 0L).as("pass"))
          .orderBy(col("rule"))
      },
      Some("""
        WITH dup AS (
          SELECT 'orders_pk_unique' AS rule,
                 CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS viol
          FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
                GROUP BY o_orderkey HAVING COUNT(*) > 1)),
        orph AS (
          SELECT 'lineitem_fk_orders' AS rule, COUNT(*) AS viol
          FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)),
        scans AS (
          SELECT 'orders_price_positive' AS rule,
                 CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS viol
          FROM orders
          UNION ALL
          SELECT 'orders_status_enum',
                 CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                   THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orders_date_not_null',
                 CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT)
          FROM orders)
        SELECT rule, viol, viol = 0 AS pass FROM (
          SELECT * FROM dup UNION ALL SELECT * FROM orph
          UNION ALL SELECT * FROM scans)
        ORDER BY rule
      """)),

    // ───── column profiling: the data-quality scan every lake runs ─────
    // Per-column null count, exact distinct cardinality, and min/max in
    // ONE aggregation pass (multiple COUNT DISTINCTs expand the scan,
    // but partial aggs keep the shuffle at one row per expand branch —
    // the profile is O(columns) output over a single table read; at
    // 100 TB this is the scan you schedule nightly, and approximate
    // cardinalities swap in via agg_approx_distinct's HLL when exact
    // isn't required). A deterministic nullable column (nullif on the
    // most common status) exercises the null accounting the clean
    // TPC-H columns can't. min/max travel as strings so one long
    // format fits every column type; only integer/varchar columns are
    // profiled here so the rendering is trivially engine-identical.
    GraftQuery(
      "stats_profile",
      (s, d) => {
        val o = Tables.orders(s, d)
          .withColumn("o_status_nullable",
            nullif(col("o_orderstatus"), lit("O")))
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "o_status_nullable")
        val aggs = cols.flatMap { c =>
          Seq(sum(col(c).isNull.cast("long")).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("string").as(s"mn_$c"),
            max(col(c)).cast("string").as(s"mx_$c"))
        }
        val one = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
        val stacked = cols.map(c =>
          s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
        one.select(col("n_rows"), expr(
          s"stack(${cols.size}, $stacked) AS (col_name, n_nulls, n_distinct, min_str, max_str)"))
          .select(col("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_str"), col("max_str"))
          .orderBy(col("col_name"))
      },
      Some("""
        WITH o AS (
          SELECT *, NULLIF(o_orderstatus, 'O') AS o_status_nullable
          FROM orders)
        SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
        FROM o
        UNION ALL
        SELECT 'o_custkey', COUNT(*),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM o
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM o
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderpriority),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM o
        UNION ALL
        SELECT 'o_status_nullable', COUNT(*),
               CAST(SUM(CASE WHEN o_status_nullable IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_status_nullable),
               MIN(o_status_nullable), MAX(o_status_nullable)
        FROM o
        ORDER BY col_name
      """)),

    // ───── autocorrelation: lag-1..24 ACF of the hourly event series ─────
    // The seasonality DETECTOR feeding ts_seasonal_profile (which assumes
    // the daily period; this measures it): Pearson correlation of the
    // hourly count series against its own k-hour shift. Pairs come from
    // an equi-join of the aggregated series on (h + k = h') with the lag
    // index EXPLODED per row (sequence(1, 24) — no cross join), so the
    // pair volume is 24·|hours|. All five sums are products of exact
    // BIGINT counts with one factor widened to DECIMAL(38,0)/HUGEINT
    // BEFORE the multiply (the stats_corr doctrine — hourly counts
    // reach ~1e9 at 100 TB, squaring past int64; a post-product cast
    // would leave x·y in BIGINT and cap counts at ~3e9/hour); the one
    // double division and sqrt at the end are shape-pinned, correctly
    // rounded per IEEE-754 from identical exact integers in both engines.
    // Degenerate overlap (constant series → zero variance) emits NULL by
    // explicit guard rather than an engine-specific Inf/NaN.
    //
    // Scale shape: the ONLY corpus-sized stage is the hourly aggregate
    // (one exchange, partial-combined); everything after runs on
    // |hours| rows — at 100 TB the series for a year is 8,760 rows, so
    // the ACF itself is metadata-sized however large the corpus. This
    // is the general downsample-then-analyze contract of the ts family.
    GraftQuery(
      "ts_autocorr",
      (s, d) => {
        val series = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("c"))
        val lagged = series
          .select(col("h"), col("c").as("x"),
            explode(expr("sequence(1L, 24L)")).as("k"))
        val pairs = lagged.join(
          series.select(col("h").as("hb"), col("c").as("y")),
          col("h") + col("k") === col("hb"))
        pairs.groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(DecimalType(38, 0))).as("sx"),
            sum(col("y").cast(DecimalType(38, 0))).as("sy"),
            sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
            sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
            sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
          .select(col("k"), col("n"),
            expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
                         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
                         THEN NULL
                         ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                              (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                               sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                                    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                    END""").as("acf"))
          .orderBy(col("k"))
      },
      Some("""
        WITH series AS (
          SELECT (epoch_ns(ts) // 1000) // 3600000000 AS h,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        lagged AS (
          SELECT h, c AS x, UNNEST(generate_series(1, 24)) AS k
          FROM series),
        pairs AS (
          SELECT l.k, l.x, b.c AS y
          FROM lagged l JOIN series b ON l.h + l.k = b.h),
        g AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM pairs GROUP BY k)
        SELECT CAST(k AS BIGINT) AS k, n,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
                    OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
                    THEN NULL
                    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                         (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                          sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               END AS acf
        FROM g ORDER BY k
      """)),

    // ───── additive decomposition: trend + seasonal + residual ─────
    // The classical STL-shaped decomposition of the hourly event series
    // (ts_autocorr DETECTS the period; this splits the series against
    // it): trend = centered 25-hour moving average (ppm floor division),
    // seasonal = per-hour-of-day mean of the detrended series, residual
    // = the exact remainder. Everything is integer ppm arithmetic on
    // non-negative sums: the seasonal mean is spelled as a DIFFERENCE of
    // two non-negative floor divisions (Σn·10⁶ div cnt − Σtrend div cnt)
    // rather than a mean of the signed detrended values, because Spark's
    // `div` truncates toward zero while DuckDB's `//` floors — they
    // agree only on non-negative operands, so the spelling keeps every
    // division non-negative by construction. The residual is then pure
    // subtraction (exact), and residual + seasonal + trend ≡ n·10⁶ row
    // by row — the decomposition identity is testable in integers.
    //
    // Scale shape: one corpus-sized exchange (the hourly aggregate,
    // partial-combined); the trend window and hod means run on the
    // METADATA-SIZED series frame (8,760 rows/year at any corpus scale),
    // so the unpartitioned ordered window is a deliberate single-task
    // stage over a tiny frame — same justification as stats_benford's
    // 9-row window, stated here because a partition-free window over a
    // corpus-sized frame would be a scale bug.
    GraftQuery(
      "ts_decompose",
      (s, d) => {
        val series = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("n"))
        val tw = Window.orderBy(col("h")).rowsBetween(-12, 12)
        val trended = series
          .withColumn("tsum", sum(col("n")).over(tw))
          .withColumn("tcnt", count(col("n")).over(tw))
          .withColumn("trend_ppm", expr("tsum * 1000000L div tcnt"))
          .drop("tsum", "tcnt")
          .withColumn("hod", col("h") % 24)
        val seasonal = trended.groupBy(col("hod"))
          .agg(expr("sum(n) * 1000000L div count(n) - sum(trend_ppm) div count(n)")
            .as("seasonal_ppm"))
        trended.join(seasonal, Seq("hod"))
          .select(col("h"), col("n"), col("trend_ppm"), col("hod"),
            col("seasonal_ppm"),
            (col("n") * lit(1000000L) - col("trend_ppm") -
              col("seasonal_ppm")).as("residual_ppm"))
          .orderBy(col("h"))
      },
      Some("""
        WITH series AS (
          SELECT (epoch_ns(ts) // 1000) // 3600000000 AS h,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        t AS (
          SELECT h, n,
                 CAST(CAST(SUM(n) OVER w AS BIGINT) * 1000000 //
                   COUNT(n) OVER w AS BIGINT) AS trend_ppm,
                 h % 24 AS hod
          FROM series
          WINDOW w AS (ORDER BY h
                       ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        s AS (
          SELECT hod,
                 CAST(CAST(SUM(n) AS BIGINT) * 1000000 // COUNT(n) -
                 CAST(SUM(trend_ppm) AS BIGINT) // COUNT(n) AS BIGINT)
                   AS seasonal_ppm
          FROM t GROUP BY hod)
        SELECT t.h, t.n, t.trend_ppm, t.hod, s.seasonal_ppm,
               t.n * 1000000 - t.trend_ppm - s.seasonal_ppm AS residual_ppm
        FROM t JOIN s USING (hod)
        ORDER BY t.h
      """)),

    // ───── forecast backtest: seasonal-naive vs naive-1 baselines ─────
    // Before any learned forecaster ships, it must beat the two free
    // baselines — snaive24 (this hour yesterday) and naive1 (the last
    // hour) — and this query IS that bar, backtested over the whole
    // hourly series: per model, the count of scoreable points, the
    // exact integer sum of absolute errors, and MAE in ppm. The ratio
    // of the two MAEs is the MASE denominator decision: if snaive24
    // does not beat naive1, the series has no daily season worth
    // modeling (ts_autocorr's verdict, re-read as forecast skill).
    // Forecasts are self-joins of the aggregated series on (h−24 / h−1)
    // — errors are |BIGINT−BIGINT|, sums exact, divisions non-negative.
    //
    // Scale shape: one corpus-sized hourly aggregate; both lag joins and
    // the 2-row summary run on the metadata-sized series (the
    // ts_autocorr contract).
    GraftQuery(
      "ts_forecast_snaive",
      (s, d) => {
        val series = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("n"))
        def backtest(lag: Int, name: String) = {
          val f = series.select((col("h") + lag).as("hf"), col("n").as("fc"))
          series.join(f, col("h") === col("hf"))
            .agg(count(lit(1)).as("n_points"),
              sum(abs(col("n") - col("fc"))).cast("long").as("sae"))
            .select(lit(name).as("model"), col("n_points"), col("sae"),
              expr("if(n_points = 0, null, sae * 1000000L div n_points)")
                .as("mae_ppm"))
        }
        backtest(24, "snaive24").unionByName(backtest(1, "naive1"))
          .orderBy(col("model"))
      },
      Some("""
        WITH series AS (
          SELECT (epoch_ns(ts) // 1000) // 3600000000 AS h,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        b24 AS (
          SELECT 'snaive24' AS model, CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(SUM(ABS(a.n - f.n)) AS BIGINT) AS sae
          FROM series a JOIN series f ON a.h = f.h + 24),
        b1 AS (
          SELECT 'naive1' AS model, CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(SUM(ABS(a.n - f.n)) AS BIGINT) AS sae
          FROM series a JOIN series f ON a.h = f.h + 1),
        u AS (SELECT * FROM b24 UNION ALL SELECT * FROM b1)
        SELECT model, n_points, sae,
               CASE WHEN n_points = 0 THEN NULL
                    ELSE sae * 1000000 // n_points END AS mae_ppm
        FROM u ORDER BY model
      """)),

    // ───── Holt's linear-trend forecast: per-user exponential smoothing ─────
    // The learned counterpart to ts_forecast_snaive's free baselines —
    // the first real forecaster every metrics stack ships (Holt 1957:
    // level + trend double exponential smoothing). Per user, the first 8
    // observations (total order: event time, then event_id) train the
    // recurrence and the 9th scores the one-step-ahead forecast — the
    // per-key backtest shape, complementing snaive's global series.
    //
    // Determinism spelling: values quantize once (floor(value·100) —
    // one shared IEEE multiply), smoothing constants are POWERS OF TWO
    // (α = 1/2, β = 1/4) in 2¹⁰ fixed point, so every recurrence step is
    //   l_i = ⌊(x_i·2¹⁰ + l_{i−1} + b_{i−1}) / 2⌋
    //   b_i = ⌊((l_i − l_{i−1}) + 3·b_{i−1}) / 4⌋
    // — pure integer arithmetic with sign-split floor division (the
    // module-wide `div`/`//` negative-operand discipline). Init is the
    // textbook l₁ = x₁, b₁ = x₂ − x₁. The horizon is FIXED (8), so the
    // recurrence unrolls as a linear CTE chain in both engines (the
    // ml_logreg pattern) — no recursion, no HOF fold to disagree on.
    // Users with fewer than 9 observations drop out (documented: a
    // backtest needs the actual).
    //
    // Scale shape (100 TB): one shuffle on user_id; the rank filter
    // keeps 9 rows per user BEFORE the pivot (the conditional-aggregate
    // pivot is map-side combinable), and the unrolled smoothing is a
    // narrow projection over the 9-column frame — per-user state never
    // exceeds one row, no window over the corpus, no driver loop.
    GraftQuery(
      "ts_forecast_holt",
      (s, d) => {
        val H = 8
        def fd(num: String, den: Long): String =
          s"(CASE WHEN ($num) >= 0 THEN ($num) div $den " +
            s"ELSE -((-($num) + ${den - 1}) div $den) END)"
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts)").as("us"),
            col("event_id"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("x"))
        val first = ev.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("us"), col("event_id"))))
          .filter(col("rn") <= H + 1)
        val aggs = (1 to H + 1).map(i =>
          max(when(col("rn") === i, col("x"))).as(s"x$i")) :+
          count(lit(1)).as("n_obs")
        var df = first.groupBy(col("user_id"))
          .agg(aggs.head, aggs.tail: _*)
          .filter(col("n_obs") === H + 1)
          .withColumn("l1", expr("x1 * 1024"))
          .withColumn("b1", expr("(x2 - x1) * 1024"))
        for (i <- 2 to H) {
          df = df
            .withColumn(s"l$i",
              expr(fd(s"x$i * 1024 + l${i - 1} + b${i - 1}", 2)))
            .withColumn(s"b$i",
              expr(fd(s"(l$i - l${i - 1}) + 3 * b${i - 1}", 4)))
        }
        df.select(col("user_id"),
            col(s"l$H").as("level_fp"), col(s"b$H").as("trend_fp"),
            expr(fd(s"l$H + b$H", 1024)).as("forecast_c"),
            col(s"x${H + 1}").as("actual_c"))
          .withColumn("abs_err_c",
            abs(col("actual_c") - col("forecast_c")))
          .orderBy(col("user_id"))
      },
      Some {
        val H = 8
        def fd(num: String, den: Long): String =
          s"(CASE WHEN ($num) >= 0 THEN ($num) // $den " +
            s"ELSE -((-($num) + ${den - 1}) // $den) END)"
        val xCols = (1 to H + 1).map(i =>
          s"MAX(CASE WHEN rn = $i THEN x END) AS x$i").mkString(",\n          ")
        val rounds = (2 to H).map { i =>
          s"""hl$i AS (
          SELECT *, ${fd(s"x$i * 1024 + l${i - 1} + b${i - 1}", 2)} AS l$i
          FROM hb${i - 1}),
        hb$i AS (
          SELECT *, ${fd(s"(l$i - l${i - 1}) + 3 * b${i - 1}", 4)} AS b$i
          FROM hl$i)"""
        }.mkString(",\n        ")
        s"""
        WITH ev AS (
          SELECT user_id, (epoch_ns(ts) // 1000) AS us, event_id,
                 CAST(floor(value * 100) AS BIGINT) AS x
          FROM events),
        rn AS (
          SELECT user_id, x,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS rn
          FROM ev),
        wide AS (
          SELECT user_id,
          $xCols,
                 CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM rn WHERE rn <= ${H + 1} GROUP BY user_id),
        hb1 AS (
          SELECT *, x1 * 1024 AS l1, (x2 - x1) * 1024 AS b1
          FROM wide WHERE n_obs = ${H + 1}),
        $rounds
        SELECT user_id, l$H AS level_fp, b$H AS trend_fp,
               ${fd(s"l$H + b$H", 1024)} AS forecast_c,
               x${H + 1} AS actual_c,
               ABS(x${H + 1} - ${fd(s"l$H + b$H", 1024)}) AS abs_err_c
        FROM hb$H ORDER BY user_id
      """
      })
  )
}
