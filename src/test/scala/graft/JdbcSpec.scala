package graft

import graft.pipeline.{JdbcSink, ParquetSink, SinkIO}
import org.apache.spark.sql.functions._

/** JDBC sink fidelity (SURVEY S2/S3) against embedded Derby — the same
  * SinkIO seam the parquet path uses, so the incremental-append contract
  * is proven identical across both implementations.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def mkSink(tag: String): JdbcSink = {
    val db = s"${scratchDir(s"derby_$tag")}/db"
    new JdbcSink(s"jdbc:derby:$db;create=true", "events_sink", driver)
  }

  private def batch(rows: (Long, Long, Double)*) =
    rows.toDF("event_id", "ts_us", "value")
      .select($"event_id", timestamp_micros($"ts_us").as("ts"), $"value")

  test("fresh sink (no table yet): watermark is a single null row") {
    val sink = mkSink("fresh")
    val wm = sink.watermark(spark, "ts")
    assert(wm.count() === 1)
    assert(wm.head().isNullAt(0))
    // bootstrap flow: everything passes the filter, append creates table
    val b = batch((1L, 1000000L, 1.0))
    val fresh = SinkIO.watermarkFilter(spark, b, sink, "ts")
    assert(fresh.count() === 1)
    sink.append(fresh)
    assert(sink.readAll(spark).count() === 1)
  }

  test("S3: append creates the table and round-trips rows") {
    val sink = mkSink("s3")
    sink.append(batch((1L, 1000000L, 1.5), (2L, 2000000L, 2.5)))
    val back = sink.readAll(spark)
    assert(back.count() === 2)
    assert(back.select(sum($"value")).head().getDouble(0) === 4.0)
  }

  test("S2: watermark MAX executes as a DB-side scalar subquery") {
    val sink = mkSink("s2")
    sink.append(batch((1L, 1000000L, 1.0), (2L, 5000000L, 2.0)))
    val wm = sink.watermark(spark, "ts")
    assert(wm.count() === 1)
    assert(wm.head().getTimestamp(0).getTime === 5000L) // 5e6 µs = 5000 ms
  }

  test("incremental append via the shared seam is idempotent") {
    val sink = mkSink("inc")
    sink.append(batch((1L, 1000000L, 1.0), (2L, 5000000L, 2.0)))
    // second batch: one stale row, one fresh row
    val b2 = batch((3L, 3000000L, 3.0), (4L, 9000000L, 4.0))
    val fresh = SinkIO.watermarkFilter(spark, b2, sink, "ts")
    assert(fresh.select("event_id").as[Long].collect().toSet === Set(4L))
    sink.append(fresh)
    // replay of the same batch appends nothing
    val replay = SinkIO.watermarkFilter(spark, b2, sink, "ts")
    assert(replay.count() === 0)
    assert(sink.readAll(spark).count() === 3)
  }

  test("dialect hazards: quoted mixed-case watermark column, NUMERIC coercion") {
    // The reference's production sink is Postgres; no Postgres (or H2)
    // driver resolves in the offline sandbox, so the dialect-sensitive
    // behaviors are pinned on Derby, which shares them: quoted
    // identifiers are case-SENSITIVE (an unquoted `eventTs` would fold —
    // up on Derby, down on Postgres — and miss the created column
    // either way), and NUMERIC/DECIMAL must round-trip as exact decimal,
    // not double.
    val db = s"${scratchDir("derby_dialect")}/db"
    val sink = new JdbcSink(s"jdbc:derby:$db;create=true", "typed_sink", driver)
    val rows = Seq((1L, 1000000L, "1.25"), (2L, 5000000L, "2.50"))
      .toDF("event_id", "ts_us", "amount")
      .select($"event_id", timestamp_micros($"ts_us").as("eventTs"),
        $"amount".cast("decimal(12,2)").as("amount"))
    sink.append(rows)
    // watermark subquery quotes "eventTs" — succeeds only if creation
    // and lookup agree on case-sensitive quoting
    val wm = sink.watermark(spark, "eventTs")
    assert(wm.head().getTimestamp(0).getTime === 5000L)
    val back = sink.readAll(spark)
    val amt = back.schema("amount").dataType
    assert(amt === org.apache.spark.sql.types.DecimalType(12, 2), amt)
    assert(back.agg(sum($"amount")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("3.75")) === 0)
  }

  test("parquet and JDBC sinks satisfy the same contract") {
    val pq = new ParquetSink(scratchDir("seam_pq") + "/sink")
    val jd = mkSink("seam")
    val b1 = batch((1L, 1000000L, 1.0))
    val b2 = batch((1L, 1000000L, 1.0), (2L, 2000000L, 2.0))
    Seq[graft.pipeline.SinkIO](pq, jd).foreach { sink =>
      sink.append(b1)
      val fresh = SinkIO.watermarkFilter(spark, b2, sink, "ts")
      assert(fresh.select("event_id").as[Long].collect().toSet === Set(2L))
      sink.append(fresh)
      assert(sink.readAll(spark).count() === 2)
    }
  }
}
