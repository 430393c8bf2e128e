package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closes the loop on the round-9 probe-before-snapshot rule: every
  * DECLARED query must either be in ScaleProbe's probed surface (its
  * 10x ratio is recorded in ARCHITECTURE.md) or carry a reasoned
  * exemption in ScaleProbe.probeExempt. Exact partition, both ways —
  * a new query without a probe fails the build here, a stale probe or
  * exemption of a renamed/removed query fails too. No SparkSession
  * needed: this is a pure set contract over the declared names.
  */
class ProbeCoverageSpec extends AnyFunSuite {

  private lazy val declared = SparkEntry.queries.keySet
  private lazy val probed = ScaleProbe.probedOps.toSet
  private lazy val exemptAll = ScaleProbe.probeExempt.values.flatten.toSeq

  test("every declared query is probed or carries a reasoned exemption") {
    val exempt = exemptAll.toSet
    val unaccounted = declared -- probed -- exempt
    assert(unaccounted.isEmpty,
      s"queries with neither a ScaleProbe entry nor a probeExempt " +
        s"reason: ${unaccounted.toSeq.sorted.mkString(", ")} — record a " +
        "10x ratio (ARCHITECTURE.md probe rule) or add a reasoned " +
        "exemption group")
  }

  test("no probe or exemption names a nonexistent query") {
    val stale = (probed ++ exemptAll) -- declared
    assert(stale.isEmpty,
      s"stale ScaleProbe entries (no such declared query): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("probed and exempt are disjoint and duplicate-free") {
    val both = probed.intersect(exemptAll.toSet)
    assert(both.isEmpty,
      s"queries both probed and exempted: ${both.toSeq.sorted.mkString(", ")}")
    val dupProbe = ScaleProbe.probedOps.diff(ScaleProbe.probedOps.distinct)
    assert(dupProbe.isEmpty, s"duplicate probedOps entries: $dupProbe")
    val dupEx = exemptAll.diff(exemptAll.distinct)
    assert(dupEx.isEmpty, s"duplicate probeExempt entries: $dupEx")
  }
}
