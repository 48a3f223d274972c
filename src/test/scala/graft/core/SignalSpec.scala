package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive truth table for the Signal.and meet (the reference pins all
  * pairs in its SignalSpecs; we cover the full table, including our
  * FinishRow extension — which only agrees with itself and degrades to
  * Continue against anything else: keep-and-stop vs any other wish must
  * keep the event stream flowing so both consumers stay correct).
  */
class SignalSpec extends AnyFunSuite {
  import Signal._

  private val all = List(Continue, SkipColumn, SkipRow, Terminate, BreakBatch, FinishRow)

  test("and is reflexive: s and s == s") {
    all.foreach(s => assert(and(s, s) == s))
  }

  test("SkipColumn and SkipRow degrade to SkipColumn (both ways)") {
    assert(and(SkipColumn, SkipRow) == SkipColumn)
    assert(and(SkipRow, SkipColumn) == SkipColumn)
  }

  test("every other unequal pair degrades to Continue") {
    for {
      a <- all
      b <- all
      if a != b
      if !((a == SkipColumn && b == SkipRow) || (a == SkipRow && b == SkipColumn))
    } assert(and(a, b) == Continue, s"and($a, $b)")
  }

  test("and is commutative") {
    for { a <- all; b <- all } assert(and(a, b) == and(b, a))
  }
}
