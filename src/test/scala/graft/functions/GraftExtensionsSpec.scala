package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** The `spark.sql.extensions` wiring path: a session built with
  * [[GraftExtensions]] has the native functions, the optimizer rule,
  * and the as-of planner strategy active without any programmatic
  * `register` calls — what a cluster-wide deployment would use.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions activates functions, rule, and strategy") {
    val base = SparkTestSession.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      // injected function, via SQL, no register() call
      assert(s2.sql("SELECT cosine_similarity(array(1.0d), array(1.0d)) AS c")
        .collect().head.getDouble(0) === 1.0)
      assert(s2.sql("SELECT jaccard_e4(array('a'), array('a')) AS j")
        .collect().head.getLong(0) === 10000L)
      assert(s2.sql("SELECT size(minhash_sigs(array('a','b'), 4)) AS n")
        .collect().head.getInt(0) === 4)
      // injected planner strategy: build the logical node directly (no
      // AsOfJoinOps.register) and execute
      val left = Seq((1L, 10L)).toDF("lk", "lts")
      val right = Seq((1L, 5L, 7L)).toDF("rk", "rts", "payload")
      val joined = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(s2,
        graft.plans.AsOfJoin(
          left.queryExecution.analyzed, right.queryExecution.analyzed,
          left.queryExecution.analyzed.output.head,
          right.queryExecution.analyzed.output.head,
          left.queryExecution.analyzed.output(1),
          right.queryExecution.analyzed.output(1)))
      assert(joined.collect().head.getLong(4) === 7L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
