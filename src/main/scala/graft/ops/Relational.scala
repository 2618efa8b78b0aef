package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-parity dataflow operators (SURVEY.md §2) re-expressed on the
  * driver testdata, plus the flagship pricing-summary aggregation.
  *
  * Scale notes (100 TB): every query here is a narrow scan → partial agg →
  * exchange-on-group-keys → final agg, or a top-k (TakeOrderedAndProject:
  * per-partition heaps, no global sort shuffle). The watermark filter keeps
  * the scalar on the executor side via a 1-row broadcast join instead of a
  * driver `collect()` (reference does the latter:
  * /root/reference/spark_tasks/weather_task.py:78).
  */
object Parity extends QueryModule {

  /** Exact, order-independent sum of a double column: sum in decimal, return
    * double. Both Spark and DuckDB sum decimals exactly, so the result is
    * bitwise-stable regardless of partitioning — required for hash-match.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)).cast("double")

  override def queries: Seq[GraftQuery] = Seq(

    // ───── flagship: TPC-H Q1-shaped pricing summary ─────
    // SURVEY §2.4 has only MAX/COUNT; this is the §7.3-step-4 agg surface.
    GraftQuery(
      "q1_pricing_summary",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ───── P1: cast projection (weather_task.py:61-67 semantics) ─────
    GraftQuery(
      "ref_cast_projection",
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          // date kept as its ISO string: DATE columns round-trip differently
          // through parquet/pandas across engines (date vs datetime64)
          col("ts").cast("date").cast("string").as("event_date"),
          col("value").cast(DecimalType(18, 2)).cast("double").as("value_2dp"),
          col("user_id").cast("string").as("user_id_s")),
      Some("""
        SELECT event_id,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_2dp,
               CAST(user_id AS VARCHAR) AS user_id_s
        FROM events
      """)),

    // ───── P2: incremental high-watermark filter (weather_task.py:70-89).
    // The scalar stays distributed: 1-row agg broadcast-joined, no collect().
    GraftQuery(
      "ref_watermark_filter",
      (s, d) => {
        val o  = Tables.orders(s, d)
        val wm = o.filter(col("o_orderstatus") === "F")
          .agg(max(col("o_orderdate")).as("wm"))
        o.join(broadcast(wm), o("o_orderdate") > wm("wm"), "inner").drop("wm")
      },
      Some("""
        SELECT * FROM orders
        WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
                             WHERE o_orderstatus = 'F')
      """)),

    // ───── Q1/Q2: top-200 by timestamp (MLapp queries, SURVEY §2.5) ─────
    GraftQuery(
      "ref_topk_newest",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
          .limit(200),
      Some("""
        SELECT * FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 200
      """)),

    GraftQuery(
      "ref_topk_oldest",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .limit(200),
      Some("""
        SELECT * FROM orders
        ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 200
      """)),

    // ───── Q3: full global sort (range-partitioned SortExec) ─────
    GraftQuery(
      "ref_sort_full",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_orderdate"), col("o_orderkey")),
      Some("""
        SELECT * FROM orders ORDER BY o_orderdate, o_orderkey
      """)),

    // ───── A1: MAX watermark aggregate (weather_task.py:74) ─────
    GraftQuery(
      "ref_agg_max",
      (s, d) =>
        Tables.lineitem(s, d)
          .agg(max(col("l_shipdate")).as("max_ts"), min(col("l_shipdate")).as("min_ts")),
      Some("""
        SELECT max(l_shipdate) AS max_ts, min(l_shipdate) AS min_ts FROM lineitem
      """)),

    // ───── A2: COUNT guard (weather_task.py:93) ─────
    GraftQuery(
      "ref_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem"))
  )
}
