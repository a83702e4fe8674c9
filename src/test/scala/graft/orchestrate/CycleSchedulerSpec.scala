package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

/** The daemon cadence (5-min producer / 1-min rerun scan / hourly heartbeat)
  * driven through hours of simulated time with a fake clock. */
class CycleSchedulerSpec extends AnyFunSuite {

  test("reference cadence: 5-min producer, 1-min rerun scan, hourly heartbeat") {
    var now = 0L
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = new CycleScheduler(() => now)
    s.every(5 * 60000L, "producer") { fired += "producer" }
      .every(60000L, "rerun_scan") { fired += "rerun_scan" }
      .every(60 * 60000L, "heartbeat") { fired += "heartbeat" }

    // one simulated hour at 30s polling
    (1 to 120).foreach { tick =>
      now = tick * 30000L
      s.runPending()
    }
    assert(fired.count(_ == "producer") === 12)
    assert(fired.count(_ == "rerun_scan") === 60)
    assert(fired.count(_ == "heartbeat") === 1)
  }

  test("nothing fires before the first period elapses") {
    var now = 1000L
    var n = 0
    val s = new CycleScheduler(() => now)
    s.every(60000L, "job") { n += 1 }
    assert(s.runPending().isEmpty)
    now += 59999L
    assert(s.runPending().isEmpty)
    now += 1L
    assert(s.runPending() === Seq("job"))
    assert(n === 1)
  }

  test("a late job catches up ONCE and re-anchors from now") {
    var now = 0L
    var n = 0
    val s = new CycleScheduler(() => now)
    s.every(60000L, "job") { n += 1 }
    now = 10 * 60000L // ten periods late
    assert(s.runPending() === Seq("job"), "one catch-up fire, not ten")
    assert(s.runPending().isEmpty, "re-anchored from now")
    now += 60000L
    assert(s.runPending() === Seq("job"))
    assert(n === 2)
  }

  test("due jobs fire in registration order within one poll") {
    var now = 0L
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = new CycleScheduler(() => now)
    s.every(1000L, "a") { fired += "a" }
      .every(1000L, "b") { fired += "b" }
    now = 1000L
    assert(s.runPending() === Seq("a", "b"))
    assert(fired.toSeq === Seq("a", "b"))
  }
}
