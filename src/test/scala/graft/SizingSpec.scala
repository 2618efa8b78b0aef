package graft

/** The sizing seam's clamp arithmetic — in particular the overflow
  * direction: a size estimate that wraps Long (the uncapped
  * |queries|×|corpus| arms) must degrade the exchange width UP to the
  * cap, never collapse it back to the defaultParallelism floor, which
  * would silently reinstate the spill pathology the seam exists to fix.
  */
class SizingSpec extends SparkSpec {

  test("saturating multiply clamps to Long.MaxValue instead of wrapping") {
    assert(Sizing.satMul(3L, 4L) == 12L)
    assert(Sizing.satMul(0L, Long.MaxValue) == 0L)
    assert(Sizing.satMul(Long.MaxValue / 2, 3L) == Long.MaxValue)
    assert(Sizing.satMul(1L << 40, 1L << 40) == Long.MaxValue)
    assert(Sizing.satAdd(3L, 4L) == 7L)
    assert(Sizing.satAdd(Long.MaxValue, 1L) == Long.MaxValue)
    assert(Sizing.satAdd(Long.MaxValue - 1, Long.MaxValue) == Long.MaxValue)
  }

  test("overflowed estimates saturate to the width cap, never the floor") {
    // a negative byte/row estimate can only be an upstream wrap
    assert(Sizing.partitionsForBytes(spark, -1L) == Sizing.MaxPartitions)
    assert(Sizing.partitionsForRows(spark, -42L, 48) == Sizing.MaxPartitions)
    // a genuine astronomically-large estimate also rides the cap
    assert(Sizing.partitionsForRows(spark, Long.MaxValue / 4, 48)
      == Sizing.MaxPartitions)
  }

  test("sane estimates clamp between the parallelism floor and the cap") {
    val floor = spark.sparkContext.defaultParallelism
    assert(Sizing.partitionsForRows(spark, 0L, 48) == floor)
    assert(Sizing.partitionsForRows(spark, 1000L, 48) == floor)
    // 10 GB at the 64 MB default target = 160 partitions
    assert(Sizing.partitionsForBytes(spark, 10L << 30)
      == math.max(floor, 160))
  }
}
