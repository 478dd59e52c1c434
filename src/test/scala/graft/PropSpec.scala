package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal ScalaCheck↔ScalaTest bridge (scalatestplus isn't available in
  * the offline cache). */
trait PropSpec { self: org.scalatest.funsuite.AnyFunSuite =>
  def checkProp(p: Prop, minTests: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }
}
