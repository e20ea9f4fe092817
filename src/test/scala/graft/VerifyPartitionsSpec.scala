package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 shuffle-partition default: partitions follow DATA
  * VOLUME, not core count. Round 9 measured the cpus-tied default
  * under-provisioning edge-sized shuffles at the sf10 rung (g10: 546.6 s
  * at 8 partitions vs 330.6 s at 64) and showed AQE cannot recover it at
  * runtime — the initial count caps the post-coalesce layout. The
  * derivation is max(cpus, ceil(4 × parquet bytes / 128 MB)): identity
  * at every gate scale (nothing changes for the driver), rising only
  * when decoded data genuinely outgrows the thread count. */
class VerifyPartitionsSpec extends AnyFunSuite {

  test("gate-scale fixtures keep the cpus-tied layout") {
    // sf0.01 ≈ 1.9 MB, sf0.1 ≈ 17 MB on disk — both far under one
    // 128 MB decoded partition per core; the default must not move
    assert(Verify.derivedShufflePartitions(2L << 20, 4) === 4)
    assert(Verify.derivedShufflePartitions(17L << 20, 32) === 32)
    assert(Verify.derivedShufflePartitions(0L, 8) === 8)
  }

  test("sf10-scale input raises partitions into the measured-good band") {
    // sf10 fixture ≈ 2.4 GB parquet → ceil(4 × 2.4 GB / 128 MB) = 77,
    // the band the g10 layout experiment measured 1.65× faster than
    // the cpus-tied 8
    val p = Verify.derivedShufflePartitions(2_400L << 20, 8)
    assert(p >= 64 && p <= 96, s"expected ~75-77 partitions, got $p")
    // sf1 ≈ 240 MB → still cpus-tied at 8 threads
    assert(Verify.derivedShufflePartitions(240L << 20, 8) === 8)
  }

  test("derivation is monotone in bytes and bounded below by cpus") {
    val cs = Seq(1, 4, 8, 32)
    val bs = Seq(0L, 1L << 20, 1L << 30, 10L << 30, 100L << 30)
    for (c <- cs; Seq(a, b) <- bs.sliding(2)) {
      assert(Verify.derivedShufflePartitions(a, c) <=
        Verify.derivedShufflePartitions(b, c))
      assert(Verify.derivedShufflePartitions(a, c) >= c)
    }
  }

  test("inputBytes walks the dir recursively and survives a missing dir") {
    val d = Files.createTempDirectory("graft-verify-bytes")
    Files.write(d.resolve("a.parquet"), Array.fill[Byte](1000)(1))
    val sub = Files.createDirectory(d.resolve("nested.parquet"))
    Files.write(sub.resolve("part-0"), Array.fill[Byte](500)(2))
    assert(Verify.inputBytes(d.toString) === 1500L)
    assert(Verify.inputBytes("/no/such/dir") === 0L)
  }
}
