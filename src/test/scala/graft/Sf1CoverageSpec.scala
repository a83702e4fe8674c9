package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural closure of the "landed after the sf1 sweep, shipped with no
  * 10x measurement" gap: every registered query must either be replayed by
  * `tools/sf1_gate.sh` or carry a reasoned line in
  * `tools/sf1_exclusions.txt`. Runs in plain `sbt test`, so the failure
  * shows up the moment a query registers, not at the next sweep. */
class Sf1CoverageSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet

  test("every query has an sf1 gate entry or a documented exclusion") {
    val uncovered = tools.Sf1Coverage.uncovered(names)
    assert(uncovered.isEmpty,
      s"declare the 10x story for: ${uncovered.toSeq.sorted.mkString(", ")} " +
        "(add to tools/sf1_gate.sh, or a reasoned line in tools/sf1_exclusions.txt)")
  }

  test("no stale or doubly-listed sf1 rows") {
    val stale = tools.Sf1Coverage.stale(names)
    assert(stale.isEmpty,
      s"gate/exclusion rows without a live query (or listed both ways): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("exclusions carry substantive reasons") {
    val ex = tools.Sf1Coverage.excludedNames()
    assert(ex.nonEmpty, "the exclusion ledger should exist and parse")
    ex.foreach { case (n, r) =>
      assert(r.length >= 20, s"'$n' needs a real reason, not '$r'")
    }
  }
}
