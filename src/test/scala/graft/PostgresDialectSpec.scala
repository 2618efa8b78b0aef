package graft

import java.sql.Types

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** The reference's production sink is Postgres 14
  * (/root/reference/postgres/init.sql:1-17; the job appends via
  * df.write.jdbc — spark_tasks/weather_task.py:95-99). No Postgres server
  * or driver resolves in the offline sandbox, so JdbcSpec proves the
  * sink CONTRACT on Derby and this spec pins what Spark's own
  * PostgresDialect will do against the reference DDL: the write-side
  * type DDL Spark generates, the read-side Catalyst types the DDL's
  * column types come back as, and identifier quoting. A behavior change
  * in any of these on a Spark upgrade would silently corrupt the
  * Postgres deployment path, so they are CI-pinned here.
  */
class PostgresDialectSpec extends SparkSpec {

  private val pg = JdbcDialects.get("jdbc:postgresql://db:5432/weather")

  test("write-side DDL for the typed events frame (df.write.jdbc creates this)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val ddl = JdbcUtils.schemaString(pg, schema, caseSensitive = false, None)
    assert(ddl.contains("\"event_id\" BIGINT"), ddl)
    assert(ddl.contains("\"ts\" TIMESTAMP"), ddl)
    assert(ddl.contains("\"event_type\" TEXT"), ddl)
    assert(ddl.contains("\"value\" FLOAT8"), ddl)
  }

  test("NUMERIC(7,2) round-trips as exact decimal, never double") {
    // init.sql declares PrecipitationIn NUMERIC(7,2) but the reference
    // job casts it to DoubleType before the append — PG's assignment
    // cast silently rounds FLOAT8 into the NUMERIC column. The faithful
    // mapping both ways is DecimalType:
    //  - write: DecimalType(7,2) generates exactly NUMERIC(7,2);
    //  - read: a NUMERIC(7,2) result column comes back DecimalType(7,2).
    assert(JdbcUtils.getJdbcType(DecimalType(7, 2), pg)
      .databaseTypeDefinition === "NUMERIC(7,2)")
    assert(JdbcUtils.getJdbcType(DecimalType(9, 6), pg)
      .databaseTypeDefinition === "NUMERIC(9,6)")
    val md = new MetadataBuilder()
    // dialect defers NUMERIC to the shared JDBC mapping (precision,scale)
    assert(pg.getCatalystType(Types.NUMERIC, "numeric", 7, md).isEmpty)
  }

  test("reference VARCHAR/CHAR/TIMESTAMP columns read back as expected") {
    val md = new MetadataBuilder()
    // VARCHAR(50)/CHAR(2)/TIMESTAMP all defer to the shared JDBC mapping
    // (string, string, timestamp); the dialect only overrides exotic
    // types — pin that it does NOT intercept the reference's columns
    assert(pg.getCatalystType(Types.VARCHAR, "varchar", 50, md).isEmpty)
    assert(pg.getCatalystType(Types.CHAR, "bpchar", 2, md).isEmpty)
    assert(pg.getCatalystType(Types.TIMESTAMP, "timestamp", 29, md).isEmpty)
    // the one reference type the dialect DOES own: UUID (PrimaryID)
    assert(pg.getCatalystType(Types.OTHER, "uuid", 0, md)
      === Some(StringType))
  }

  test("mixed-case identifiers are double-quoted (case-sensitive on PG)") {
    // init.sql uses CamelCase column names (EventId, StartTimeUTC…);
    // unquoted they would fold to lowercase on Postgres (UPPER on Derby)
    // and miss the created columns — the same hazard JdbcSpec proves
    // end-to-end on Derby
    assert(pg.quoteIdentifier("EventId") === "\"EventId\"")
    assert(pg.quoteIdentifier("StartTimeUTC") === "\"StartTimeUTC\"")
  }

  test("watermark MAX pushes down as a PG-quoted scalar subquery") {
    // SinkIO.watermark builds `SELECT MAX("col") FROM table t` as a
    // dbtable subquery; pin the quoted form the dialect would ship
    val q = s"(SELECT MAX(${pg.quoteIdentifier("StartTimeUTC")}) FROM weather_data) wm"
    assert(q === "(SELECT MAX(\"StartTimeUTC\") FROM weather_data) wm")
  }
}
