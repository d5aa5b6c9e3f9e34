package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BoxLoad.busyOtherFrac]] — the sampler behind Bench's quiet-window
  * settle guard. The properties that matter for the OFFICIAL bench
  * artifact: the value is a fraction, and the measuring JVM's own load
  * is excluded (the round-19 review finding: an own-load sample would
  * let post-startup JIT churn burn the 180 s settle budget and stamp
  * false ambient-contention evidence into the artifact). */
class BoxLoadSpec extends AnyFunSuite {

  test("returns a fraction in [0, 1]") {
    val f = BoxLoad.busyOtherFrac(sampleMs = 200)
    assert(f >= 0.0 && f <= 1.0, f)
  }

  test("own-JVM load is excluded: saturating our own threads must not raise the reading") {
    // quiet reading first (this suite runs sequentially in one JVM) —
    // min of 3 samples so a background process spiking during ONE
    // window cannot fail the test without a product bug (round-19
    // advice: ambient jitter, not leak); and if the box is already
    // loud the own-load subtraction is unmeasurable — skip, don't flake
    val quiet = (1 to 3).map(_ => BoxLoad.busyOtherFrac(sampleMs = 400)).min
    assume(quiet < 0.5, s"box already loud (quiet=$quiet) — own-load leak unmeasurable")
    // spin half the cores hot INSIDE this JVM for the sample window
    val n = math.max(2, Runtime.getRuntime.availableProcessors() / 2)
    @volatile var stop = false
    val burners = (1 to n).map { _ =>
      val t = new Thread(() => { var x = 0L; while (!stop) x += 1 })
      t.setDaemon(true); t.start(); t
    }
    try {
      val loaded = BoxLoad.busyOtherFrac(sampleMs = 400)
      // the own-CPU subtraction must absorb the burners: allow ambient
      // jitter but fail loudly if our own load leaks through (each
      // burner core would add ~1/cores ≈ 3% on this 32-core box; n of
      // them unsubtracted would read ≳ 0.4)
      assert(loaded <= quiet + 0.15,
        s"own-JVM burn leaked into busy-other: quiet=$quiet loaded=$loaded")
    } finally {
      stop = true
      burners.foreach(_.join(1000))
    }
  }

  test("never throws — IO failures degrade to a usable 0.0") {
    // busyOtherFrac wraps all IO in Try (the guard must only ever fail
    // toward "measure now"); a short sample window also exercises the
    // dt<=0 clamp on coarse-tick kernels
    val f = BoxLoad.busyOtherFrac(sampleMs = 20)
    assert(f >= 0.0 && f <= 1.0, f)
  }
}
