package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins the linedir files-per-directory posture as CODE (SCALE.md
  * promised it as prose): the driver-side listing is sequential — one
  * stat per file per trigger — so a very-large flat directory gates
  * the whole job on driver I/O. Above `maxListedFiles` the read must
  * REFUSE loudly, pointing at the fixes, not silently degrade. */
class ListingBoundSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkDir(nFiles: Int): String = {
    val dir = Files.createTempDirectory("graft-listing-bound")
    (0 until nFiles).foreach { i =>
      Files.write(dir.resolve(f"in-$i%03d.txt"),
        s"line $i\n".getBytes(StandardCharsets.UTF_8))
    }
    dir.toString
  }

  test("batch read refuses a listing above maxListedFiles") {
    val dir = mkDir(5)
    val e = intercept[Exception] {
      spark.read.format("linedir").option("maxListedFiles", 3)
        .load(dir).count()
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause)
      .flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxListedFiles"),
      s"refusal must name the knob; got: $msg")
    assert(msg.contains("targetPartitionBytes"),
      "refusal must point at small-file coalescing")
  }

  test("coalesced-listing path enforces the same bound") {
    val dir = mkDir(5)
    val e = intercept[Exception] {
      spark.read.format("linedir")
        .option("maxListedFiles", 3)
        .option("targetPartitionBytes", 1024 * 1024)
        .load(dir).count()
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause)
      .flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxListedFiles"))
  }

  test("a listing at or under the bound reads normally") {
    val dir = mkDir(5)
    assert(spark.read.format("linedir").option("maxListedFiles", 5)
      .load(dir).count() === 5L)
    // and the 100k default never bites a sane directory
    assert(spark.read.format("linedir").load(dir).count() === 5L)
  }
}
