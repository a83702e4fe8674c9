package graft.orchestrate

/** The reference's wall-clock daemon loop re-expressed deterministically
  * (task-producer/main.py:102-115: `schedule.every(5).minutes` producer
  * cycle, `every(1).minutes` rerun scan, hourly heartbeat, then a
  * sleep-and-poll loop).
  *
  * The scheduling CORE is pure and clock-injected — `runPending` fires every
  * job whose period has elapsed, in registration order — so the cadence
  * logic is unit-testable without sleeping (CycleSchedulerSpec drives a fake
  * clock through hours of simulated time in microseconds). `runLoop` is the
  * thin wall-clock shell around it, the only part that actually sleeps.
  *
  * Catch-up semantics match the reference's `schedule` library: a job late
  * by several periods fires ONCE and re-anchors from now (task cycles are
  * watermark-driven, so one catch-up run processes the whole backlog — the
  * producer's `newTasks` emits every missed slice in one call; firing the
  * job N times would do redundant scans, not more work).
  */
class CycleScheduler(clock: () => Long = () => System.currentTimeMillis()) {

  private case class Job(name: String, periodMs: Long, action: () => Unit,
      var nextDue: Long)
  private val jobs = scala.collection.mutable.ArrayBuffer.empty[Job]

  /** Register a job firing every `periodMs`; first due one period from now
    * (the reference's schedule.every semantics — not immediately). */
  def every(periodMs: Long, name: String)(action: => Unit): this.type = {
    require(periodMs > 0, "period must be positive")
    jobs += Job(name, periodMs, () => action, clock() + periodMs)
    this
  }

  /** Fire every due job once (registration order), re-anchor from NOW, and
    * return the fired names — the testable heart of the loop. */
  def runPending(): Seq[String] = {
    val now = clock()
    jobs.toSeq.collect {
      case j if now >= j.nextDue =>
        j.nextDue = now + j.periodMs
        j.action()
        j.name
    }
  }

  /** The wall-clock shell: poll-and-sleep until `until` says stop (the
    * reference loops forever; a test or a supervised deployment bounds it). */
  def runLoop(pollMs: Long = 1000, until: () => Boolean = () => false): Unit = {
    while (!until()) {
      runPending()
      Thread.sleep(pollMs)
    }
  }
}
