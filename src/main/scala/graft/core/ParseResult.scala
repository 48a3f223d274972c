package graft.core

/** Positioned parse error (reference exceptions.scala:24). `index` is the
  * absolute byte offset in the input stream; `line`/`col` are 1-based.
  */
class ParseException(val msg: String, val index: Int, val line: Int, val col: Int)
    extends Exception(s"$msg (line $line, column $col, offset $index)")

/** EOF arrived mid-value (reference exceptions.scala:25). */
class IncompleteParseException(msg: String)
    extends Exception(msg)

/** Outcome of absorbing one chunk / continuing / finishing a parse
  * (reference ParseResult.scala:26-138).
  *
  *  - [[ParseResult.Complete]] all absorbed bytes consumed (the batch may
  *    still be non-terminal — more chunks can follow)
  *  - [[ParseResult.Partial]]  batch abbreviated by [[Signal.BreakBatch]];
  *    `remaining` unconsumed bytes are buffered — call `continueParse()`
  *    to keep draining without new input
  *  - [[ParseResult.Failure]]  parse error
  */
sealed trait ParseResult[+A] {
  def map[B](f: A => B): ParseResult[B] = this match {
    case ParseResult.Complete(a)     => ParseResult.Complete(f(a))
    case ParseResult.Partial(a, r)   => ParseResult.Partial(f(a), r)
    case f @ ParseResult.Failure(_)  => f
  }

  def fold[B](complete: A => B, partial: (A, Int) => B, failure: Throwable => B): B =
    this match {
      case ParseResult.Complete(a)   => complete(a)
      case ParseResult.Partial(a, r) => partial(a, r)
      case ParseResult.Failure(e)    => failure(e)
    }

  /** The batch value, if any (Complete or Partial). */
  def toOption: Option[A] = this match {
    case ParseResult.Complete(a)   => Some(a)
    case ParseResult.Partial(a, _) => Some(a)
    case ParseResult.Failure(_)    => None
  }

  /** Unwrap or throw — the embedding entry point for non-streaming callers. */
  def unsafeGet: A = this match {
    case ParseResult.Complete(a)   => a
    case ParseResult.Partial(a, _) => a
    case ParseResult.Failure(e)    => throw e
  }

  // ---- typeclass-shaped surface (reference ParseResult.scala:44-133
  // ships cats Semigroup/Monoid/MonadError/Foldable instances; cats-KERNEL
  // is on the classpath and real Semigroup/Monoid/Eq instances live in
  // [[ParseResult.catsInstances]]; cats-core is not resolvable here, so
  // the MonadError/Foldable OPERATIONS live directly on the type,
  // law-tested in ParseResultProps — see COVERAGE.md)

  /** MonadError bind: sequence a dependent computation, short-circuiting
    * failures. Partial's remaining-byte count survives an f that returns
    * Complete (the stream is still unfinished), and f's own Partial wins
    * otherwise (the newer suspension).
    */
  def flatMap[B](f: A => ParseResult[B]): ParseResult[B] = this match {
    case ParseResult.Complete(a)    => f(a)
    case ParseResult.Partial(a, r)  => f(a) match {
      case ParseResult.Complete(b)  => ParseResult.Partial(b, r)
      case other                    => other
    }
    case fl @ ParseResult.Failure(_) => fl
  }

  /** MonadError handleErrorWith: recover a failure, pass success through. */
  def handleErrorWith[B >: A](f: Throwable => ParseResult[B]): ParseResult[B] =
    this match {
      case ParseResult.Failure(e) => f(e)
      case other                  => other
    }

  /** MonadError attempt: reify the failure channel. */
  def attempt: ParseResult[Either[Throwable, A]] = this match {
    case ParseResult.Complete(a)   => ParseResult.Complete(Right(a))
    case ParseResult.Partial(a, r) => ParseResult.Partial(Right(a), r)
    case ParseResult.Failure(e)    => ParseResult.Complete(Left(e))
  }

  /** Foldable over the 0-or-1 carried value. */
  def foldLeft[B](z: B)(f: (B, A) => B): B = this match {
    case ParseResult.Failure(_) => z
    case other                  => f(z, other.unsafeGet)
  }

  def exists(p: A => Boolean): Boolean = toOption.exists(p)
  def forall(p: A => Boolean): Boolean = toOption.forall(p)
  def isFailure: Boolean = this.isInstanceOf[ParseResult.Failure]
}

object ParseResult {
  final case class Complete[A](value: A) extends ParseResult[A]
  final case class Partial[A](value: A, remaining: Int) extends ParseResult[A]
  final case class Failure(error: Throwable) extends ParseResult[Nothing]

  /** Monad pure / Applicative point. */
  def pure[A](a: A): ParseResult[A] = Complete(a)

  /** MonadError raiseError. */
  def raiseError[A](e: Throwable): ParseResult[A] = Failure(e)

  /** Monoid identity for [[combine]] given A's identity: `combine(empty(z),
    * r)(merge) == r` whenever `merge(z, a) == a` (and symmetrically).
    */
  def empty[A](zero: A): ParseResult[A] = Complete(zero)

  /** Associative combine (keeps the first failure; Partial dominates
    * Complete on the right so chunk sequences retain "unfinished" status).
    */
  def combine[A](r1: ParseResult[A], r2: ParseResult[A])(merge: (A, A) => A): ParseResult[A] =
    (r1, r2) match {
      case (f @ Failure(_), _)                => f
      case (_, f @ Failure(_))                => f
      case (Complete(a), Complete(b))         => Complete(merge(a, b))
      case (Complete(a), Partial(b, r))       => Partial(merge(a, b), r)
      case (Partial(a, _), Complete(b))       => Complete(merge(a, b))
      case (Partial(a, _), Partial(b, r))     => Partial(merge(a, b), r)
    }

  /** cats-kernel typeclass instances (the kernel jar is on Spark's
    * classpath; cats-core — MonadError/Foldable — is not resolvable in
    * this build, so those OPERATIONS live on the type itself: flatMap /
    * handleErrorWith / attempt / foldLeft above). Semantics match the
    * reference's instances (reference ParseResult.scala:44-133):
    * first failure wins, Partial dominates Complete on EITHER side, and
    * Partial remainders add. Law-tested in ParseResultProps.
    */
  object catsInstances {
    import cats.kernel.{Eq, Monoid, Semigroup}

    implicit def parseResultSemigroup[A](implicit A: Semigroup[A]): Semigroup[ParseResult[A]] =
      new ParseResultSemigroup[A]

    implicit def parseResultMonoid[A](implicit A: Monoid[A]): Monoid[ParseResult[A]] =
      new ParseResultSemigroup[A] with Monoid[ParseResult[A]] {
        def empty: ParseResult[A] = Complete(A.empty)
      }

    implicit def parseResultEq[A](implicit A: Eq[A]): Eq[ParseResult[A]] =
      Eq.instance {
        case (Complete(a), Complete(b))         => A.eqv(a, b)
        case (Partial(a, r1), Partial(b, r2))   => r1 == r2 && A.eqv(a, b)
        case (Failure(e1), Failure(e2))         => e1 == e2
        case _                                  => false
      }

    private class ParseResultSemigroup[A](implicit A: Semigroup[A])
        extends Semigroup[ParseResult[A]] {
      def combine(x: ParseResult[A], y: ParseResult[A]): ParseResult[A] =
        (x, y) match {
          case (f @ Failure(_), _)              => f
          case (_, f @ Failure(_))              => f
          case (Partial(a, r1), Partial(b, r2)) => Partial(A.combine(a, b), r1 + r2)
          case (Partial(a, r), Complete(b))     => Partial(A.combine(a, b), r)
          case (Complete(a), Partial(b, r))     => Partial(A.combine(a, b), r)
          case (Complete(a), Complete(b))       => Complete(A.combine(a, b))
        }
    }
  }
}
