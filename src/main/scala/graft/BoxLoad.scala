package graft

/** External-CPU-load sampler behind [[Bench]]'s quiet-window settle
  * guard (round 19): the round-18 OFFICIAL bench artifact caught a
  * measurement window that was busy for the whole battery — +0.2–0.7 s
  * uniform inflation across dozens of untouched queries — which the
  * min-of-5 methodology cannot defend against, only a quiet entry
  * point can.
  *
  * [[busyOtherFrac]] samples `/proc/stat` twice, `sampleMs` apart, and
  * returns the non-idle fraction contributed by OTHER processes: this
  * JVM's own utime+stime delta (`/proc/self/stat`, same USER_HZ
  * clock-tick units, covers all threads) is subtracted so post-startup
  * JIT/GC churn in the measuring process cannot trip the gate and
  * misattribute its own load as ambient contention (round-19 review
  * finding). Steal time on a VM counts as busy-other — deliberately:
  * a stolen CPU is exactly the external contention the guard waits
  * out. Tick-rounding can push the numerator a hair negative, so the
  * result clamps to [0, 1]; any read/parse failure (non-Linux, proc
  * unmounted) degrades to 0.0 — the guard then never blocks, it only
  * ever fails toward "measure now". */
object BoxLoad {
  /** (total ticks, idle+iowait ticks, own utime+stime ticks). */
  private def snap(): (Long, Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/stat")
    // fields user..steal only (first 8): the kernel already folds
    // guest/guest_nice into user/nice, so summing all 10 would
    // double-count VM guest time and underestimate busyOtherFrac in
    // exactly the contended case the guard exists for (round-19 advice)
    val l = try src.getLines().next().trim.split("\\s+").drop(1)
      .take(8).map(_.toLong) finally src.close()
    val self = scala.io.Source.fromFile("/proc/self/stat")
    // fields 14/15 (1-based: utime, stime) sit after the comm field,
    // which may contain spaces and parens — parse from the LAST ')'
    val sl = try self.getLines().next() finally self.close()
    val rest = sl.substring(sl.lastIndexOf(')') + 2).split(" ")
    (l.sum, l(3) + l(4), rest(11).toLong + rest(12).toLong)
  }

  def busyOtherFrac(sampleMs: Long = 1000): Double = scala.util.Try {
    val (t0, i0, s0) = snap()
    Thread.sleep(sampleMs)
    val (t1, i1, s1) = snap()
    val dt = (t1 - t0).toDouble
    if (dt <= 0) 0.0
    else math.min(1.0, math.max(0.0, (dt - (i1 - i0) - (s1 - s0)) / dt))
  }.getOrElse(0.0)
}
