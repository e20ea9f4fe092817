package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join is row-identical to the plain join under heavy skew") {
    // 10k rows, 90% on one key — the shape that melts a single reducer
    val big = (1 to 10000)
      .map(i => (if (i % 10 == 0) i % 7 else 1, s"payload$i"))
      .toDF("k", "payload")
    val small = Seq((1, "one"), (2, "two"), (3, "three"), (6, "six"))
      .toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads a hot key across partitions") {
    val big = (1 to 8000).map(i => (1, s"p$i")).toDF("k", "payload")
    val small = Seq((1, "one")).toDF("k", "name")
    val joined = SkewJoin.saltedJoin(big, small, "k", saltFactor = 8)
    val saltDistinct = big.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(saltDistinct > 1, "salt must fan the hot key out")
    assert(joined.count() === 8000)
  }
}
