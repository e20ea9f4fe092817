package graft

import org.apache.spark.sql.SparkSession

/** The two fixed CPU probes every timing artifact carries (round 10
  * introduced them inside Bench; round 11 hoists them here so Verify —
  * and through it every ladder/growth row — can self-adjudicate the
  * same way instead of hour-matching against a Bench run).
  *
  * Both probes are constant work independent of repo code, so their
  * wall-times move only with host conditions — but they see DIFFERENT
  * conditions: the scalar probe sees frequency/steal on one core, the
  * parallel probe sees what a full-width stage sees (memory bandwidth,
  * LLC, run-queue pressure). BENCH_r09 proved the scalar probe alone
  * is blind: untouched queries drifted +26% while it read FASTER.
  * `par_over_scalar` ≈ 1 on an idle box (one task per slot, same
  * per-task work as the scalar loop), rising with any co-tenant load
  * a single-thread probe cannot see. Reading rule (SCALE.md): if
  * queries drift with par_over_scalar, the drift is box contention;
  * if they drift while both probes hold, it is a real plan regression.
  */
object Calibration {

  /** Deterministic xorshift spin, ~0.5 s on an idle core. The result
    * accumulator is printed on an impossible branch to defeat DCE. */
  def spin(seed: Long, iters: Int): Long = {
    var x = seed
    var acc = 0L
    var i = 0
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    acc
  }

  private val Iters = 400000000

  /** Single-thread probe: wall seconds of the fixed spin on the driver. */
  def scalar(): Double = {
    val t0 = System.nanoTime()
    val acc = spin(88172645463325252L, Iters)
    if (acc == 42L) System.err.println("calibration accumulator hit 42")
    (System.nanoTime() - t0) / 1e9
  }

  /** Parallel probe: the same per-task work fanned one-task-per-slot
    * through `spark` and timed like a query (wall of the whole stage). */
  def parallel(spark: SparkSession): Double = {
    val slots = spark.sparkContext.defaultParallelism
    val t0 = System.nanoTime()
    val acc = spark.sparkContext
      .parallelize(0 until slots, slots)
      .map(i => spin(88172645463325252L + i, Iters))
      .reduce(_ + _)
    if (acc == 42L) System.err.println("parallel calibration hit 42")
    (System.nanoTime() - t0) / 1e9
  }

  /** One scalar+parallel probe pair. `parOverScalar` is the direct
    * contention ratio the reading rules key on. */
  final case class Probe(scalarSec: Double, parSec: Double) {
    def parOverScalar: Double = parSec / scalarSec
    def json: String =
      s"""{"scalar_sec":$scalarSec,"par_sec":$parSec""" +
        s""","par_over_scalar":$parOverScalar}"""
  }

  def probe(spark: SparkSession): Probe = Probe(scalar(), parallel(spark))

  /** One untimed scalar+parallel pass. A FRESH JVM's first parallel
    * probe pays scheduler/executor init and the spin loop's JIT, not
    * contention — measured 1.74 par_over_scalar on an idle box — so
    * callers probing at JVM start (Verify) warm first. Bench doesn't
    * need this: its probes run after the query warm-up loop. */
  def warmup(spark: SparkSession): Unit = {
    val p = probe(spark)
    if (p.scalarSec < 0) System.err.println("calibration warmup impossible")
  }
}
