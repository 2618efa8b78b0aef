package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-cap derivation from the data's own tail: the `auto` mode of the
  * bounded-quadratic knobs (`spark.graft.ann.ivfCellCap`,
  * `spark.graft.shingle.dfCutoff`, `spark.graft.graph.wedgeCap`).
  *
  * Each of those caps bounds a per-key quadratic term (cell², df²,
  * deg²) by cutting the key-size distribution's tail. A fixed default
  * is right for the corpus it was measured on and wrong at 100× — the
  * whole distribution shifts (ScaleGen's replication multiplies every
  * df by the replica count), and an operator should not hand-retune
  * three numbers per corpus. `auto` derives the cap from a cheap
  * pre-aggregate of the distribution itself: `mult × p99(size)`,
  * floor-clamped — everything inside mult× the 99th-percentile key is
  * normal mass the operator must process; whatever lies beyond is the
  * celebrity tail the cap exists to bound. p99 via
  * `percentile_approx` at accuracy 10⁴ (a bounded-size sketch — the
  * pre-aggregate stays one metadata-sized job regardless of corpus).
  *
  * The DuckDB oracles pin each knob's FIXED default, so Verify refuses
  * to run with any of these confs set (including `auto`) — derivation
  * is an operator-mode, never a gate-mode.
  */
object AutoKnob {

  /** `mult × p99(sizeCol)` clamped to `[floor, Int.MaxValue]`;
    * `fallback` when the frame is empty (no distribution to read).
    */
  def fromP99(sizes: DataFrame, sizeCol: String, mult: Int, floor: Int,
              fallback: Int): Int = {
    val p = sizes
      .agg(expr(s"percentile_approx($sizeCol, 0.99, 10000)").as("p"))
      .first().getAs[Number]("p")
    Option(p)
      .map(v => math.max(floor.toLong, mult.toLong * v.longValue))
      .map(v => math.min(v, Int.MaxValue.toLong).toInt)
      .getOrElse(fallback)
  }
}
