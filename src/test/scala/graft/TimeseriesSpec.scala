package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{count, expr, lit}

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

  test("ts_interpolate: interior gaps take the line, observed cells exact") {
    val got = SparkEntry.queries("ts_interpolate")(spark, dir)
      .select("user_id", "bucket", "v_interp", "observed")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // u1 observes 2.5 at h0 and 9.0 at h3; h1/h2 sit on the line —
    // expectation written as the SAME IEEE expression order the query
    // pins: pv + (nv − pv) · ((b − pb) / (nb − pb))
    assert(got === Seq(
      (1L, 0L, 2.5, true),
      (1L, 1L, 2.5 + (9.0 - 2.5) * (1.0 / 3.0), false),
      (1L, 2L, 2.5 + (9.0 - 2.5) * (2.0 / 3.0), false),
      (1L, 3L, 9.0, true),
      (2L, 7L, 4.0, true)))
  }

  test("ts_seasonal_profile: hour-of-day means and deltas, hand-computed") {
    val got = SparkEntry.queries("ts_seasonal_profile")(spark, dir)
      .select("user_id", "hod", "n", "mean_ppm", "seasonal_delta_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // u1: hod0 has cents {150, 250} → mean 200000000 ppm; hod3 has
    // {900} → 900000000; user mean = 1300·10⁶ div 3 = 433333333
    assert(got === Seq(
      (1L, 0L, 2L, 200000000L, 200000000L - 433333333L),
      (1L, 3L, 1L, 900000000L, 900000000L - 433333333L),
      (2L, 7L, 1L, 400000000L, 0L)))
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

  test("ts_anomaly_mad: lower-median convention, MAD gate, zero-MAD user") {
    val d = scratchDir("ts_mad")
    val rows = Seq(
      // user 5 (odd n=5): values 1,2,3,4,100 → med = rank 3 = 3.0;
      //   devs {2,1,0,1,97} sorted [0,1,1,2,97] → mad = rank 3 = 1.0;
      //   anomalies: dev > 4 → only the 97 → n_anom = 1
      (10L, 1L * H, 5L, "view", 1.0), (11L, 2L * H, 5L, "view", 2.0),
      (12L, 3L * H, 5L, "view", 3.0), (13L, 4L * H, 5L, "view", 4.0),
      (14L, 5L * H, 5L, "view", 100.0),
      // user 6 (even n=4): values 1,2,3,10 → LOWER median rank
      //   (4+1) div 2 = 2 → med = 2.0 (interpolation would say 2.5);
      //   devs {1,0,1,8} sorted [0,1,1,8] → mad = rank 2 = 1.0;
      //   anomalies: dev > 4 → the 8 → n_anom = 1
      (20L, 1L * H, 6L, "view", 1.0), (21L, 2L * H, 6L, "view", 2.0),
      (22L, 3L * H, 6L, "view", 3.0), (23L, 4L * H, 6L, "view", 10.0),
      // user 7: constant series → mad = 0; dev > 0 never holds for
      //   identical values, so nothing flags (the strict > matters)
      (30L, 1L * H, 7L, "view", 5.0), (31L, 2L * H, 7L, "view", 5.0)
    ).map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("ts_anomaly_mad")(spark, d)
      .select("user_id", "n", "med", "mad", "n_anom")
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(got === Seq(
      (5L, 5L, 3.0, 1.0, 1L),
      (6L, 4L, 2.0, 1.0, 1L),
      (7L, 2L, 5.0, 0.0, 0L)))
  }

  test("win_cusum_drift: step change accumulates, downward drift reads zero") {
    val d = scratchDir("ts_cusum")
    val rows = Seq(
      // user 1: level steps 1→5 midway; S_t (cents) = 0,0,0,400,800,1200,
      //   running min 0 → max excursion 1200 at the LAST event
      (0L, 1L * H, 1L, "view", 1.0), (1L, 2L * H, 1L, "view", 1.0),
      (2L, 3L * H, 1L, "view", 1.0), (3L, 4L * H, 1L, "view", 5.0),
      (4L, 5L * H, 1L, "view", 5.0), (5L, 6L * H, 1L, "view", 5.0),
      // user 2: level DROPS — S_t tracks its own running minimum, so the
      //   upward-excursion statistic stays 0 (CUSUM is one-sided here)
      (10L, 1L * H, 2L, "view", 5.0), (11L, 2L * H, 2L, "view", 1.0),
      (12L, 3L * H, 2L, "view", 1.0)
    ).map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("win_cusum_drift")(spark, d)
      .select("user_id", "n", "cusum_max", "cp_ts_us", "drifted")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 6L, 1200L, 6L * H, false),
      (2L, 3L, 0L, 1L * H, false))) // all-zero stat: argmax = earliest row
  }

  test("join_interval_overlap: hour banding equals true interval overlap") {
    val d = scratchDir("ts_overlap")
    val rows = Seq(
      // user 1, day 0: active span h1..h3 — OVERLAPS the h2 incident
      // even though no user-1 event falls IN h2 (the interval, not the
      // points, is what joins)
      (0L, 1L * H + H / 2, 1L, "view", 1.0),
      (1L, 3L * H + H / 2, 1L, "view", 1.0),
      // user 3, day 1: far from any incident
      (2L, 30L * H, 3L, "view", 1.0)
    ) ++ (0 until 7).map(i => // 7 errors inside h2 → one incident hour
      (10L + i, 2L * H + i * 60000000L, 2L, "error", 1.0)
    )
    rows.map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("join_interval_overlap")(spark, d)
      .select("user_id", "day", "n_hours", "n_incidents")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 3L, 1L), // span h1-h3 crosses the h2 incident
      (2L, 0L, 1L, 1L), // the erroring user's own span sits in h2
      (3L, 1L, 1L, 0L)))
  }

  test("win_attribution: last touch wins, 6-hour boundary inclusive, " +
      "errors don't steal, no-touch and stale classified") {
    val d = scratchDir("attrib")
    val M = 60L * 1000000L // one minute in µs
    val rows = Seq(
      // u1: click → purchase 10 min later (credited), then a view whose
      // purchase lands 7 h later (stale — the carry is the view, not
      // the older click)
      (0L, 0L * M, 1L, "click", 0.0),
      (1L, 10L * M, 1L, "purchase", 2.0),
      (2L, 20L * M, 1L, "view", 0.0),
      (3L, 440L * M, 1L, "purchase", 10.0),
      // u2: a purchase with NO prior touch, then signup → purchase
      (4L, 5L * M, 2L, "purchase", 1.0),
      (5L, 10L * M, 2L, "signup", 0.0),
      (6L, 11L * M, 2L, "purchase", 4.5),
      // u3: an error between click and purchase must not steal credit
      (7L, 0L * M, 3L, "click", 0.0),
      (8L, 5L * M, 3L, "error", 99.0),
      (9L, 6L * M, 3L, "purchase", 3.0),
      // u4: purchase at EXACTLY 6 h — boundary is inclusive, credited
      (10L, 0L * M, 4L, "view", 0.0),
      (11L, 360L * M, 4L, "purchase", 0.25)
    ).map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("win_attribution")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("click", 2L, 500L),
      ("none", 1L, 100L),
      ("signup", 1L, 450L),
      ("stale", 1L, 1000L),
      ("view", 1L, 25L)))
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

  test("ts_decompose: exact integer replay and the additive identity") {
    val got = SparkEntry.queries("ts_decompose")(spark, sfTiny)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // the decomposition identity holds EXACTLY in integers, row by row
    got.foreach { case (_, n, trend, _, seasonal, residual) =>
      assert(trend + seasonal + residual === n * 1000000L)
    }
    // replay: centered 25-hour trend + per-hod seasonal means, all
    // non-negative floor divisions (the truncate-vs-floor contract)
    val counts = Tables.events(spark, sfTiny)
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val trend = counts.indices.map { i =>
      val lo = math.max(0, i - 12)
      val hi = math.min(counts.length - 1, i + 12)
      val frame = counts.slice(lo, hi + 1)
      counts(i)._1 -> frame.map(_._2).sum * 1000000L / frame.length
    }.toMap
    val seasonal = counts.groupBy(_._1 % 24).map { case (hod, rs) =>
      val cnt = rs.length
      hod -> (rs.map(_._2).sum * 1000000L / cnt -
        rs.map(r => trend(r._1)).sum / cnt)
    }
    got.foreach { case (h, _, t, hod, s2, _) =>
      assert(hod === h % 24)
      assert(t === trend(h), s"trend at h=$h")
      assert(s2 === seasonal(hod), s"seasonal at hod=$hod")
    }
  }

  test("ts_forecast_holt: noiseless linear series forecasts exactly; " +
      "short users drop; Scala replay matches at the fixture") {
    val d = scratchDir("ts_holt")
    // user 1: perfectly linear x_i = 300 + 50*i centi-units (value =
    //   3.00 + 0.50*i) — with power-of-two smoothing the recurrence is
    //   EXACT on linear input (l_i = x_i, b_i = slope by induction), so
    //   the 1-step forecast must hit the 9th point with zero error.
    // user 2: a step series exercising negative trend arithmetic.
    // user 3: only 5 observations — must not appear (no actual to score).
    val rows =
      (1 to 9).map(i => ((100 + i).toLong, i.toLong * H, 1L, "view",
        3.0 + 0.5 * i)) ++
      (1 to 9).map(i => ((200 + i).toLong, i.toLong * H, 2L, "view",
        if (i <= 4) 10.0 else 2.0)) ++
      (1 to 5).map(i => ((300 + i).toLong, i.toLong * H, 3L, "view", 1.0))
    rows.map { case (id, us, u, et, v) =>
      (id, new Timestamp(us / 1000), u, et, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")

    val got = SparkEntry.queries("ts_forecast_holt")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L), "exactly the >= 9-obs users score")

    // Scala Long replay of the recurrence (sign-split floor division)
    def fd(num: Long, den: Long): Long = Math.floorDiv(num, den)
    def holt(xs: Seq[Long]): (Long, Long, Long) = {
      var l = xs(0) * 1024L; var b = (xs(1) - xs(0)) * 1024L
      for (i <- 1 until 8) {
        val lp = l
        l = fd(xs(i) * 1024L + lp + b, 2L)
        b = fd((l - lp) + 3L * b, 4L)
      }
      (l, b, fd(l + b, 1024L))
    }
    val x1 = (1 to 9).map(i => math.floor((3.0 + 0.5 * i) * 100).toLong)
    val (l1, b1, f1) = holt(x1)
    val (_, _, _, fc1, a1, e1) = got(1L)
    assert(got(1L)._2 === l1 && got(1L)._3 === b1)
    assert(fc1 === f1 && a1 === x1(8))
    // exactness on the linear series: forecast hits the 9th point
    assert(e1 === 0L, s"linear series must forecast exactly, err=$e1")
    assert(b1 === 50L * 1024L, "trend locks to the true slope in fp")

    val x2 = (1 to 9).map(i => math.floor((if (i <= 4) 10.0 else 2.0) * 100).toLong)
    val (l2, b2, f2) = holt(x2)
    assert((got(2L)._2, got(2L)._3, got(2L)._4) === ((l2, b2, f2)))
    assert(got(2L)._6 === math.abs(x2(8) - f2))
    assert(b2 < 0L, "step-down series must carry a negative trend")
  }
}
