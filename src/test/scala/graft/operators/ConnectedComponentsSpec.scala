package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("transitive chains collapse to one component labeled by the min") {
    // a~b, b~c, c~d: one cluster {1,2,3,4} even though 1 and 4 never pair
    val got = components(Seq((2L, 1L), (2L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters keep separate labels") {
    val got = components(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 20L)))
    assert(got === Map(1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long path needs diameter rounds and still converges") {
    // path 0-1-2-...-9: diameter 9, worst case for min-label propagation
    val edges = (0L until 9L).map(i => (i, i + 1))
    val got = components(edges)
    assert(got === (0L to 9L).map(_ -> 0L).toMap)
  }

  test("star and cycle shapes") {
    // star centered at 7 with leaves 8,9,10 plus cycle 1-2-3-1
    val got = components(Seq((7L, 8L), (7L, 9L), (7L, 10L),
      (1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got === Map(7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L,
      1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("agrees with a driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val got = components(edges)
    // oracle: classic union-find
    val parent = scala.collection.mutable.Map((0L until 120L).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    // find() roots are the min id of each component because unions always
    // point the larger root at the smaller
    assert(got === want)
  }
}
