package graft

import java.sql.Timestamp

/** Semantic tests for the time-series alignment family (`ts_gap_fill`):
  * the oracle gate pins cross-engine value equality at sf0.01; these pin
  * the SEMANTICS on planted gaps — dense grid bounds, LOCF carry, and
  * the last-event-per-bucket representative pick.
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in µs

  private lazy val dir = {
    val d = scratchDir("ts_gap_fill")
    // user 1: events in hours 0, 0, 3 (two in the same bucket — the
    //   later one must represent it; hours 1-2 are the gap to fill)
    // user 2: single event — a one-cell grid
    val rows = Seq(
      (0L, H / 10, 1L, "view", 1.5),             // u1 h0, early
      (1L, 2L * H / 3, 1L, "click", 2.5),        // u1 h0, late → wins h0
      (2L, 3L * H + 42000L, 1L, "view", 9.0),    // u1 h3
      (3L, 7L * H + 1000L, 2L, "view", 4.0)      // u2 h7
    ).map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ts_gap_fill: dense grid per user, LOCF across the gap") {
    val got = SparkEntry.queries("ts_gap_fill")(spark, dir)
      .select("user_id", "bucket", "value_ff", "observed")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 2.5, true),   // later event in the bucket represents it
      (1L, 1L, 2.5, false),  // gap: carried forward
      (1L, 2L, 2.5, false),  // gap: still carried
      (1L, 3L, 9.0, true),
      (2L, 7L, 4.0, true)    // single-event user: one-cell grid
    ))
  }

  test("ts_resample_ohlc: first/last by total order, extremes, exact volume") {
    val got = SparkEntry.queries("ts_resample_ohlc")(spark, dir)
      .select("user_id", "bucket", "open", "high", "low", "close",
        "n_events", "vol_cents")
      .as[(Long, Long, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      (1L, 0L, 1.5, 2.5, 1.5, 2.5, 2L, 400L), // open=early, close=late
      (1L, 3L, 9.0, 9.0, 9.0, 9.0, 1L, 900L),
      (2L, 7L, 4.0, 4.0, 4.0, 4.0, 1L, 400L)))
  }

  test("win_ewma_halflife: halving kernel, short leading frames self-normalize") {
    val got = SparkEntry.queries("win_ewma_halflife")(spark, dir)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(0L) === 150.0)                // single tap
    assert(got(1L) === 41600.0 / 192.0)      // [150·64 + 250·128] / 192
    assert(got(2L) === 136000.0 / 224.0)     // [150·32 + 250·64 + 900·128] / 224
    assert(got(3L) === 400.0)
  }

  test("ts_gap_fill: first grid cell is always observed (no leading null)") {
    val head = SparkEntry.queries("ts_gap_fill")(spark, dir)
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.min_by(
          org.apache.spark.sql.functions.col("observed"),
          org.apache.spark.sql.functions.col("bucket")).as("first_obs"))
      .select("first_obs").as[Boolean].collect()
    assert(head.forall(identity))
  }
}
