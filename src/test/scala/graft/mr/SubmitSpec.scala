package graft.mr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** CLI parity with the reference's `mapreduce-submit` option surface
  * (reference submit.py:20-101). */
class SubmitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def tmpDir(prefix: String): Path = Files.createTempDirectory(prefix)

  def writeExe(dir: Path, name: String, script: String): String = {
    val p = dir.resolve(name)
    Files.write(p, script.getBytes(StandardCharsets.UTF_8))
    p.toFile.setExecutable(true)
    p.toString
  }

  test("parse mirrors the reference option surface and defaults") {
    val d = Submit.parse(Nil)
    assert(d.numMappers === 2 && d.numReducers === 2 && !d.shutdown)

    val a = Submit.parse(Seq("-i", "/in", "-o", "/out", "-m", "map.sh",
      "-r", "red.sh", "--nmappers", "3", "--nreducers", "5"))
    assert(a === Submit.Args("/in", "/out", "map.sh", "red.sh", 3, 5))

    // long forms + ignored manager endpoint options
    val b = Submit.parse(Seq("--host", "example.invalid", "--port", "6000",
      "--input", "/in2", "--output", "/out2"))
    assert(b.input === "/in2" && b.output === "/out2")

    assert(Submit.parse(Seq("-s")).shutdown)
    intercept[IllegalArgumentException] { Submit.parse(Seq("--bogus")) }
  }

  test("run submits through the FIFO driver and produces part files") {
    val exeDir = tmpDir("submit-exe")
    val wcMap = writeExe(exeDir, "wc_map.sh",
      "#!/bin/sh\ntr ' ' '\\n' | grep -v '^$' | sed 's/$/\\t1/'\n")
    val wcReduce = writeExe(exeDir, "wc_reduce.sh",
      """#!/bin/sh
        |awk -F'\t' '{ if ($1 != prev) { if (NR > 1) print prev "\t" sum;
        |  prev = $1; sum = 0 } sum += $2 } END { if (NR > 0) print prev "\t" sum }'
        |""".stripMargin)

    val in = tmpDir("submit-in")
    Files.write(in.resolve("f.txt"),
      "the quick fox the\n".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir("submit-out").resolve("output")

    val driver = new MapReduceDriver(spark)
    val id = Submit.run(spark, Seq("-i", in.toString, "-o", out.toString,
      "-m", wcMap, "-r", wcReduce, "--nreducers", "2"), driver)
    assert(id === Some(0))
    assert(driver.completed === Seq(0))

    val lines = Files.list(out).iterator().asScala.toSeq
      .flatMap(p => Files.readAllLines(p, StandardCharsets.UTF_8).asScala)
    assert(lines.sorted === Seq("fox\t1", "quick\t1", "the\t2"))
  }
}
