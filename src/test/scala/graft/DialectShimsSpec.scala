package graft

import org.apache.spark.sql.functions.expr

/** Direct coverage of the DuckDB-compat functions registered by
  * `functions.DialectShims` (the sweep exercises them end-to-end; these
  * pin each shim's semantics in isolation).
  */
class DialectShimsSpec extends SparkSpec {
  import spark.implicits._

  private def one(sql: String) = spark.sql(s"SELECT $sql AS v").head.get(0)

  test("list_reduce folds left-to-right with first-element init") {
    assert(one("list_reduce(array(1.5D, 2.0D, 3.0D), (x, y) -> x + y)") == 6.5)
    // non-commutative op exposes fold order AND init choice:
    // ((10 - 3) - 2) = 5; a zero-init left fold would give -15
    assert(one("list_reduce(array(10.0D, 3.0D, 2.0D), (x, y) -> x - y)") == 5.0)
    // single element: the element itself, lambda never applied
    assert(one("list_reduce(array(7.0D), (x, y) -> x / y)") == 7.0)
  }

  test("list_reduce matches DuckDB's oracle fold on real dot products") {
    // the expression family the similarity oracles use (after the
    // sweep's list_transform→transform rename)
    val d = one("""list_reduce(transform(sequence(1, 4),
      i -> CAST(i AS DOUBLE) * CAST(i AS DOUBLE)), (x, y) -> x + y)""")
    assert(d == 30.0) // 1 + 4 + 9 + 16
  }

  test("len spans strings and arrays like DuckDB's") {
    assert(one("len('hello')") == 5)
    assert(one("len(array(1, 2, 3))") == 3)
    assert(one("len(split('a b c d', ' '))") == 4)
  }

  test("sha256 produces the standard lowercase hex digest") {
    // well-known vector: sha256("abc")
    assert(one("sha256('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("epoch_ns equals unix micros * 1000 (µs-exact timestamps)") {
    assert(one("epoch_ns(TIMESTAMP '1970-01-01 00:00:01Z')") == 1000000000L)
    assert(one("epoch_ns(TIMESTAMP '2026-08-12 00:00:00Z')") ==
      1786492800L * 1000000000L)
  }

  test("strftime translates %-codes and quotes literal letters") {
    assert(one("strftime(DATE '1997-03-15', '%Y-%m')") == "1997-03")
    assert(one("strftime(TIMESTAMP '1997-03-15 13:45:09Z', '%Y-%m-%dT%H:%M:%S')") ==
      "1997-03-15T13:45:09")
    // letter runs quote as ONE section; per-letter quoting would render
    // the JDK escaped-quote "1997 w'k15" (DuckDB renders "1997 wk15")
    assert(functions.DialectShims.strftimeToJdk("%Y wk%d") == "yyyy 'wk'dd")
    assert(one("strftime(DATE '1997-03-15', '%Y wk%d')") == "1997 wk15")
    assert(one("strftime(DATE '1997-03-15', '%Y day %j of yr')") ==
      "1997 day 074 of yr")
    intercept[RuntimeException](functions.DialectShims.strftimeToJdk("%q"))
  }

  test("duck_encode yields UTF-8 bytes (DuckDB 1-arg encode)") {
    val bytes = one("duck_encode('héllo')").asInstanceOf[Array[Byte]]
    assert(bytes.toSeq == "héllo".getBytes("UTF-8").toSeq)
  }

  test("shims compose with DataFrame expr and stay codegen-compatible") {
    val df = Seq(("a b c", 3), ("x y", 2)).toDF("t", "n")
      .withColumn("l", expr("len(split(t, ' '))"))
    assert(df.select("l").as[Int].collect().toSeq == Seq(3, 2))
  }
}
