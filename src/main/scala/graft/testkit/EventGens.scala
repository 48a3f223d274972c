package graft.testkit

import graft.core.Event
import graft.core.Event._
import org.scalacheck.Gen

/** ScalaCheck generators for well-formed [[graft.core.Event]] streams —
  * the publishable half of what the reference ships as its `tectonic-test`
  * module's `Generators.genPlate` (reference test/src/main): downstream
  * Plate authors drive arbitrary event streams through their plate and
  * assert laws (idempotent replay, batch draining, skip accounting)
  * without hand-writing fixtures.
  *
  * Streams are structurally valid by construction: every `NestMap` /
  * `NestArr` / `NestMeta` is closed by its `Unnest`, rows end with
  * `FinishRow`, and `Skipped` counts are positive — the invariants every
  * conforming parser upholds, so a plate only ever needs to survive what
  * these generators emit.
  *
  * This lives in the main artifact (package `graft.testkit`) rather than
  * a separate `graft-test` jar because this build publishes core + Spark
  * as ONE artifact; if core is ever split out, this package splits with
  * it unchanged.
  */
object EventGens {

  val genKey: Gen[String] = Gen.alphaNumStr.map(_.take(8))

  /** One scalar value's events (or a lone empty Map/Arr, or a Skipped
    * marker — the byte-skip path's footprint).
    */
  val genScalar: Gen[List[Event]] = Gen.frequency(
    2 -> Gen.const(List(Nul)),
    2 -> Gen.const(List(Fls)),
    2 -> Gen.const(List(Tru)),
    1 -> Gen.const(List(Map)),
    1 -> Gen.const(List(Arr)),
    3 -> Gen.choose(-1000000L, 1000000L).map(n => List(Num(n.toString, -1, -1))),
    2 -> Gen.choose(0, 9999).map(n => List(Num(s"$n.5", n.toString.length, -1))),
    3 -> Gen.asciiPrintableStr.map(s => List(Str(s.take(16)))),
    1 -> Gen.choose(1, 500).map(n => List(Skipped(n))))

  /** One value's events, nesting up to `maxDepth` through maps, arrays,
    * and metadata.
    */
  def genValue(depth: Int = 0, maxDepth: Int = 3): Gen[List[Event]] =
    if (depth >= maxDepth) genScalar
    else Gen.frequency(
      5 -> genScalar,
      1 -> (for {
        n <- Gen.choose(1, 3)
        entries <- Gen.listOfN(n, for {
          k <- genKey
          v <- genValue(depth + 1, maxDepth)
        } yield NestMap(k) :: v ::: List(Unnest))
      } yield entries.flatten),
      1 -> (for {
        n <- Gen.choose(1, 3)
        elems <- Gen.listOfN(n,
          genValue(depth + 1, maxDepth).map(v => NestArr :: v ::: List(Unnest)))
      } yield elems.flatten),
      1 -> (for {
        k <- genKey
        v <- genValue(depth + 1, maxDepth)
      } yield NestMeta(k) :: v ::: List(Unnest)))

  /** One row: a value closed by `FinishRow`. */
  val genRow: Gen[List[Event]] = genValue().map(_ :+ FinishRow)

  /** A batch of 0..`maxRows` rows, flattened. */
  def genStream(maxRows: Int = 8): Gen[List[Event]] =
    Gen.choose(0, maxRows).flatMap(n => Gen.listOfN(n, genRow).map(_.flatten))
}
