package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class BfsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hops(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxHops: Int): Map[Long, Long] =
    Bfs.hops(edges.toDF("u", "v"), sources.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // chain 1→2→3→4→5 plus a shortcut 1→4
  private val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))

  test("min-hop wins when multiple paths reach a node") {
    assert(hops(chain, Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("maxHops bounds the reach") {
    assert(hops(chain, Seq(1L), 1) === Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("multiple sources take the nearest one; cycles terminate") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(hops(ring, Seq(1L, 3L), 4) ===
      Map(1L -> 0L, 3L -> 0L, 2L -> 1L))
  }

  test("requireExhausted: cap-hit with unvisited neighbors throws") {
    // 1→2→3→4→5: cap 2 stops at 3 while 4 is still unvisited
    val line = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val ex = intercept[IllegalArgumentException] {
      Bfs.hops(line.toDF("u", "v"), Seq(1L).toDF("node"), 2,
        requireExhausted = true).collect()
    }
    assert(ex.getMessage.contains("TRUNCATED"))
  }

  test("requireExhausted: cap-hit on the exact radius passes") {
    // cap 2 on a 2-hop graph: the final frontier {3} has no unvisited
    // neighbors (3→1 closes a cycle), so the closure is complete even
    // though the loop never saw an empty frontier
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = Bfs.hops(ring.toDF("u", "v"), Seq(1L).toDF("node"), 2,
        requireExhausted = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("reliable checkpoint mode: identical hops, files on disk") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bfs-ckpt")
    val reliable = Bfs
      .hops(chain.toDF("u", "v"), Seq(1L).toDF("node"), 4,
        checkpointDir = Some(ckpt.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === hops(chain, Seq(1L), 4),
      "reliable-checkpoint mode changed the answer")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty — rounds did not go through the reliable path")
  }
}
