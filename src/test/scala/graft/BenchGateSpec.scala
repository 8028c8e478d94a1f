package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's co-tenant trip-wire (round-11 calibration): the
  * ext_cores instrument must MEASURE a genuinely foreign busy process,
  * and the suspect rule must trip on it at the dedicated ~0.4-core gate
  * (the old rule reused loadGate=4.0 and stayed silent while 0.6-2.2
  * foreign cores inflated recorded medians ~7%). */
class BenchGateSpec extends AnyFunSuite {

  test("a foreign busy-loop process trips the suspect rule at the 0.4-core ext gate") {
    // one spun-pinned foreign core, by construction outside this JVM
    val busy = new ProcessBuilder("sh", "-c", "while :; do :; done").start()
    try {
      Thread.sleep(200) // let the loop get scheduled
      // idle window: self CPU ~0, so ext reads the foreign loop directly
      val ext = Bench.extProbe(2000)
      assert(ext >= 0.5, s"busy-loop foreign core not measured (ext=$ext)")
      assert(Bench.isSuspect(ext, 0.4),
        s"suspect rule must trip on $ext foreign cores at gate 0.4")
    } finally {
      busy.destroyForcibly()
      busy.waitFor()
    }
  }

  test("suspect rule: unreadable ext is suspect (unknown != clean); sub-gate ext is not") {
    assert(Bench.isSuspect(-1.0, 0.4))
    assert(Bench.isSuspect(0.41, 0.4))
    assert(!Bench.isSuspect(0.0, 0.4))
    assert(!Bench.isSuspect(0.39, 0.4))
  }

  test("a foreign dsync-write loop trips the iowait suspect rule at the 0.3-core gate") {
    // real disk pressure from OUTSIDE this JVM: small O_DSYNC writes
    // force block I/O the page cache can't absorb (measured 0.5+
    // iowait-cores on this host). ext_cores is structurally blind to
    // this — the r12 blind spot this gate closes.
    val tmp = java.nio.file.Files.createTempFile("graft_iow", ".bin")
    val tmp2 = java.nio.file.Files.createTempFile("graft_iow2", ".bin")
    // two concurrent writers: headroom over the 0.3 gate on faster disks
    val dd = new ProcessBuilder("sh", "-c",
      s"(while :; do dd if=/dev/zero of=$tmp bs=256k count=8 " +
        "oflag=dsync conv=notrunc 2>/dev/null; done) & " +
        s"while :; do dd if=/dev/zero of=$tmp2 bs=256k count=8 " +
        "oflag=dsync conv=notrunc 2>/dev/null; done").start()
    try {
      Thread.sleep(300) // let the writer get going
      // idle window: the JVM does no I/O, so iowait reads foreign disk.
      // Storage speed varies by host — probe up to 3 windows and require
      // the max; a host whose disk absorbs dsync without measurable
      // iowait (battery-backed cache) can't run this proof at all.
      val probes = (1 to 3).map(_ => Bench.extIoProbe(3000))
      val iow = probes.map(_._2).max
      assume(iow > 0.05,
        s"host generates no measurable iowait under dsync writes ($probes)")
      // a dsync dd burns a little CPU too; the point is the IOWAIT reading
      assert(iow >= 0.3, s"foreign disk pressure not measured ($probes)")
      assert(Bench.isSuspectIo(iow, 0.3),
        s"iowait suspect rule must trip on $iow iowait cores at gate 0.3")
    } finally {
      dd.destroyForcibly(); dd.waitFor()
      // the backgrounded inner loop survives the shell's SIGKILL; match
      // the dd invocations specifically (a bare filename pattern would
      // kill unrelated processes that merely mention it on their cmdline)
      new ProcessBuilder("sh", "-c",
        "pkill -f 'dd if=/dev/zero of=/tmp/graft_iow' || true")
        .start().waitFor()
      java.nio.file.Files.deleteIfExists(tmp)
      java.nio.file.Files.deleteIfExists(tmp2)
    }
  }

  test("iowait suspect rule: unreadable is suspect; sub-gate iowait is not") {
    assert(Bench.isSuspectIo(-1.0, 0.3))
    assert(Bench.isSuspectIo(0.31, 0.3))
    assert(!Bench.isSuspectIo(0.0, 0.3))
    // the r12 clean-run ceiling (0.13) sits comfortably under the gate
    assert(!Bench.isSuspectIo(0.13, 0.3))
  }

  test("cpu probe returns sane host-speed calibration rates") {
    Bench.cpuProbe(1, 1000000L) // JIT warm
    val st = Bench.cpuProbe(1, 20000000L)
    val mt = Bench.cpuProbe(4, 20000000L)
    // any functioning host runs the xorshift loop at tens of Mops/s
    assert(st > 2e7, s"single-thread probe implausibly slow: $st ops/s")
    // 4 threads must beat 1 (the loop is embarrassingly parallel); allow
    // co-tenant slack with a 1.5x floor rather than 4x
    assert(mt > st * 1.5, s"multi-thread probe did not scale: $st -> $mt")
  }

  test("probe normalization: value_norm = value × probe_today / probe_ref, ref pinned at r13") {
    // the reference point is the round-13 driver-run host (BENCH_r13
    // diag, ~467 single-thread Mops) — changing it silently would break
    // every round-over-round comparison, so the spec pins it
    assert(Bench.ProbeRefStMops == 467.0)
    // a run ON the reference host normalizes to itself
    assert(math.abs(Bench.probeNormalized(30.0, 467.0e6) - 30.0) < 1e-9)
    // a HALF-speed host measured doubled wall-clock: its total halves
    // back to reference terms
    assert(math.abs(Bench.probeNormalized(30.0, 233.5e6) - 15.0) < 1e-9)
    // a faster host scales up symmetrically
    assert(math.abs(Bench.probeNormalized(30.0, 934.0e6) - 60.0) < 1e-9)
    // an unreadable probe must never hide the raw metric
    assert(Bench.probeNormalized(30.0, 0.0) == 30.0)
    assert(Bench.probeNormalized(30.0, -1.0) == 30.0)
  }

  test("probe parallel-capacity divergence guard: flags mt/st ratio drift > 25%") {
    // single-thread normalization is blind to degraded parallel capacity
    // (cgroup quota, saturated socket): st probes ~reference while the
    // local[32] battery crawls. The mt/st ratio catches it (VERDICT r14).
    assert(Bench.ProbeRefMtMops == 10760.0) // pinned with ProbeRefStMops
    val ref = Bench.ProbeRefMtMops / Bench.ProbeRefStMops // ~23.04
    // the reference host itself is clean, as is the r14 run (ratio 24.59)
    assert(!Bench.probeParallelSuspect(467.0e6, 10760.0e6))
    assert(!Bench.probeParallelSuspect(437.6e6, 10762.2e6))
    // intact per-core speed but HALF the effective cores: ratio ~11.5,
    // -50% from reference — exactly the case value_norm can't see
    assert(Bench.probeParallelSuspect(467.0e6, 5380.0e6))
    // divergence flags in BOTH directions (a beefier host flatters
    // value_norm symmetrically)
    assert(Bench.probeParallelSuspect(467.0e6, 467.0e6 * ref * 1.3))
    // boundary: ±25% is the tolerance, just inside is clean
    assert(!Bench.probeParallelSuspect(467.0e6, 467.0e6 * ref * 1.24))
    assert(!Bench.probeParallelSuspect(467.0e6, 467.0e6 * ref * 0.76))
    assert(Bench.probeParallelSuspect(467.0e6, 467.0e6 * ref * 0.74))
    // unreadable probes are suspect: unknown != clean
    assert(Bench.probeParallelSuspect(0.0, 10760.0e6))
    assert(Bench.probeParallelSuspect(467.0e6, -1.0))
    // the pinned ratio is a 32-thread measurement — per-thread efficiency
    // varies with thread count (8 threads scale ~linearly where 32 hit
    // SMT limits), so non-reference thread counts get no verdict
    assert(!Bench.probeParallelSuspect(467.0e6, 3667.0e6, threads = 8))
  }

  test("withExt attributes this JVM's own burn to self, not to foreign load") {
    // burn ~2s of CPU in-process: ext must NOT rise with it (the whole
    // point of the instrument — loadavg would have flagged this)
    val ambient = Bench.extProbe(1000)
    val (_, extBusySelf) = Bench.withExt {
      val stop = System.nanoTime() + 2L * 1000 * 1000 * 1000
      var x = 0L
      while (System.nanoTime() < stop) { x += 1 }
      x
    }
    assert(extBusySelf >= 0, s"ext must stay readable (got $extBusySelf)")
    // allow generous co-tenant slack; the self-burn itself is ~1.0 core
    // and must not appear in ext
    assert(extBusySelf <= ambient + 0.8,
      s"self CPU leaked into ext: ambient=$ambient, during self-burn=$extBusySelf")
  }

  test("mt-probe normalization: value_norm_mt = value × mt_probe / mt_ref") {
    // reference host normalizes to itself; half parallel capacity halves
    // the total back to reference terms; unreadable probe → raw value
    assert(math.abs(Bench.probeNormalizedMt(30.0, 10760.0e6) - 30.0) < 1e-9)
    assert(math.abs(Bench.probeNormalizedMt(30.0, 5380.0e6) - 15.0) < 1e-9)
    assert(math.abs(Bench.probeNormalizedMt(30.0, 21520.0e6) - 60.0) < 1e-9)
    assert(Bench.probeNormalizedMt(30.0, 0.0) == 30.0)
    assert(Bench.probeNormalizedMt(30.0, -1.0) == 30.0)
  }

  test("compact-line norm fields: gated reads dual-report, gated:false suppresses to null") {
    // the r16 official read: st probe 350.3 Mops, mt 9685.2, total 52.67 s,
    // gated:false — yet it printed value_norm 39.511, which entered the
    // record as a phantom +37% regression. The ledger rule this pins:
    // a contaminated read may NEVER print a plausible normalized number.
    val contaminated = Bench.normFields(52.67, 350.3e6, 9685.2e6, gated = false)
    assert(contaminated.contains("\"value_norm\":null"),
      s"gated:false must null the st headline: $contaminated")
    assert(contaminated.contains("\"value_norm_mt\":null"),
      s"gated:false must null the mt headline: $contaminated")
    // the raw computations survive under _ungated names for forensics
    // (39.508 ≈ the 39.511 the r16 line printed; the diag's Mops fields
    // are rounded to 0.1 while the live run normalized by the raw rate)
    assert(contaminated.contains("\"value_norm_ungated\":39.508"))
    assert(contaminated.contains("\"value_norm_mt_ungated\":47.409"))
    // a gated-clean read on a slow-PARALLEL host (intact per-core speed,
    // half the capacity): st normalization reports ~parity while the mt
    // normalization halves the total — the disagreement is the signal the
    // st-only ledger could not see (VERDICT r16 #1)
    val slowParallel = Bench.normFields(60.0, 467.0e6, 5380.0e6, gated = true)
    assert(slowParallel.contains("\"value_norm\":60.000"))
    assert(slowParallel.contains("\"value_norm_mt\":30.000"))
    assert(!slowParallel.contains("ungated"),
      s"gated reads carry only the headline fields: $slowParallel")
    // both regimes lead with the same first key, so line diffs align
    assert(contaminated.startsWith("\"value_norm\":"))
    assert(slowParallel.startsWith("\"value_norm\":"))
    // the pinned mt rate is a 32-thread measurement: a non-reference
    // thread count (local smoke runs) must null the mt field rather
    // than "normalize" by a probe that measured a different machine
    // shape — same rule as probeParallelSuspect
    val smoke8 = Bench.normFields(0.5, 467.0e6, 3600.0e6, gated = true, threads = 8)
    assert(smoke8.contains("\"value_norm_mt\":null"), smoke8)
    assert(!smoke8.contains("\"value_norm\":null"), s"st field stays live at any thread count: $smoke8")
  }

  test("mover report separates a uniform host shift from an isolated code regression") {
    val baseline = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.5, "q_d" -> 1.5,
      "q_tiny" -> 0.1) // below the 0.2 s comparability floor — ignored
    // uniformly 1.3x slower host (the r17 close's phase): median ratio
    // 1.3, ZERO movers — the shape says host, not code
    val host = Bench.moverFields(
      baseline.toSeq.map { case (k, v) => k -> v * 1.3 }, baseline)
    assert(host.contains("\"battery_ratio_median\":1.300"), host)
    assert(host.contains("\"movers\":{}"), host)
    // same host shift PLUS one real regression: q_b doubles — the mover
    // is measured against the battery's own median, so it stands out
    val regressed = Bench.moverFields(
      Seq("q_a" -> 1.3, "q_b" -> 4.0, "q_c" -> 0.65, "q_d" -> 1.95), baseline)
    assert(regressed.contains("\"battery_ratio_median\":1.300"), regressed)
    assert(regressed.contains("\"q_b\":2.000"), regressed)
    assert(!regressed.contains("q_a\":"), s"non-movers stay out: $regressed")
    // sub-threshold ratio wiggle (0.5 -> 0.58, +16%) and a big-RATIO but
    // small-ABSOLUTE move on a fast query (0.25 -> 0.38, +52% but 0.13 s
    // — under the 0.15 s floor): neither is a mover
    val floorBase = baseline + ("q_e" -> 0.25)
    val wiggle = Bench.moverFields(
      Seq("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.58, "q_d" -> 1.5,
        "q_e" -> 0.38), floorBase)
    assert(wiggle.contains("\"movers\":{}"), wiggle)
    // even-n medians are the average of the middle two: a 2-query
    // SPARK_GRAFT_ONLY battery with one 2x regression previously set
    // med = the UPPER ratio (2.0), flagged only the healthy query, and
    // read exactly backwards; the true midpoint (1.5) flags BOTH sides
    // of the split — ambiguous at n=2, but the regression is never
    // exonerated
    val two = Bench.moverFields(Seq("q_a" -> 1.0, "q_b" -> 4.0),
      Map("q_a" -> 1.0, "q_b" -> 2.0))
    assert(two.contains("\"battery_ratio_median\":1.500"), two)
    assert(two.contains("\"q_b\":2.000") && two.contains("\"q_a\":1.000"), two)
    // no baseline file -> degrade, never crash
    assert(Bench.moverFields(Seq("q_a" -> 1.0), Map.empty)
      .contains("\"battery_ratio_median\":null"))
    val (noSf, noQ) = Bench.readBaseline("/nonexistent/path.json")
    assert(noSf.isEmpty && noQ.isEmpty)
    // the committed baseline parses and carries its fixture tag — the
    // caller disables the report when the tag mismatches the run's sf
    val (sf, qs) = Bench.readBaseline("BENCH_PERQUERY_BASELINE.json")
    assert(sf.contains("sf0.1"), s"baseline must carry _sf: $sf")
    assert(qs.size >= 40 && qs.keys.forall(_.startsWith("q_")), qs.size.toString)
  }
}
