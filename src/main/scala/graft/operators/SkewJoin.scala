package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for equi-joins with extreme key skew.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and covers most cases; this operator is the
  * explicit fallback for the pathological shape AQE can't fix — one
  * shuffle key carrying a double-digit percentage of a 100 TB fact
  * table — or for broadcast-ineligible dimension sides.
  *
  * Mechanics: the big (skewed) side gets a deterministic salt in
  * [0, saltFactor) appended to its key; the small side is exploded
  * `saltFactor`× so every (key, salt) pair exists; the join key becomes
  * (key, salt), spreading each hot key over `saltFactor` reducers.
  * Result is row-identical to the unsalted join (inner/left semantics).
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    // salt from a hash of the whole row: deterministic, and spreads a
    // hot key's rows as long as their non-key columns vary
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
