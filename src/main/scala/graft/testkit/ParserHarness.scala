package graft.testkit

import graft.core._
import graft.core.json.JsonParser
import graft.core.csv.CsvParser

/** Publishable parser-testing harness — the graft counterpart of the
  * reference's `tectonic-test` module (reference test/src/main:
  * `parseRowAs` matchers + golden plates), re-expressed
  * framework-agnostically so downstream Plate authors can use it from
  * ScalaTest, munit, specs2, or plain asserts: golden matchers return
  * `Either[String, Unit]` (Left = a rendered diff) and the exhaustive
  * helpers throw with the first diverging split point.
  *
  * Ships in the main artifact under `graft.testkit` (this build publishes
  * one artifact; see [[EventGens]]) and is consumed by this repo's own
  * core specs exactly as a third party would.
  */
object ParserHarness {

  type EventPlate = Plate[List[Event]]

  // ------------------------------------------------------------- JSON

  def jsonResult(
      input: String,
      mode: JsonParser.Mode = JsonParser.ValueStream,
      wrap: EventPlate => EventPlate = identity): ParseResult[List[Event]] =
    JsonParser.parseAll(input, wrap(new ReifiedPlate), mode)(_ ++ _)

  /** Parse fully; throw on failure. */
  def jsonEvents(
      input: String,
      mode: JsonParser.Mode = JsonParser.ValueStream,
      wrap: EventPlate => EventPlate = identity): List[Event] =
    jsonResult(input, mode, wrap).unsafeGet

  /** Expect a failure; return it. */
  def jsonError(
      input: String,
      mode: JsonParser.Mode = JsonParser.ValueStream): Throwable =
    jsonResult(input, mode) match {
      case ParseResult.Failure(e) => e
      case other => sys.error(s"expected failure, got $other")
    }

  /** Absorb the input in the given pieces (each absorb must not break the
    * batch), then finish; returns the per-chunk event lists.
    */
  def jsonChunked(
      chunks: Seq[String],
      mode: JsonParser.Mode = JsonParser.ValueStream,
      wrap: EventPlate => EventPlate = identity): List[List[Event]] = {
    val p = new JsonParser(wrap(new ReifiedPlate), mode)
    val perChunk = chunks.map(c => p.absorb(c).unsafeGet).toList
    perChunk :+ p.finish().unsafeGet
  }

  /** For every split point of `input`, parse as two chunks and assert the
    * merged event stream matches the whole-input parse.
    */
  def everySplitMatches(
      input: String,
      mode: JsonParser.Mode = JsonParser.ValueStream): Unit = {
    val whole = jsonEvents(input, mode)
    val bytes = input.getBytes("UTF-8")
    (0 to bytes.length).foreach { i =>
      val p = new JsonParser(new ReifiedPlate, mode)
      val a = p.absorb(bytes.slice(0, i)).unsafeGet
      val b = p.absorb(bytes.slice(i, bytes.length)).unsafeGet
      val c = p.finish().unsafeGet
      val merged = a ++ b ++ c
      if (merged != whole)
        sys.error(s"split at $i diverged:\n  merged=$merged\n  whole=$whole")
    }
  }

  // ------------------------------------------------------------- CSV

  def csvResult(
      input: String,
      config: CsvParser.Config = CsvParser.Config(),
      wrap: EventPlate => EventPlate = identity): ParseResult[List[Event]] =
    CsvParser.parseAll(input, wrap(new ReifiedPlate), config)(_ ++ _)

  def csvEvents(
      input: String,
      config: CsvParser.Config = CsvParser.Config(),
      wrap: EventPlate => EventPlate = identity): List[Event] =
    csvResult(input, config, wrap).unsafeGet

  def csvError(input: String, config: CsvParser.Config = CsvParser.Config()): Throwable =
    csvResult(input, config) match {
      case ParseResult.Failure(e) => e
      case other => sys.error(s"expected failure, got $other")
    }

  def csvEverySplitMatches(input: String, config: CsvParser.Config = CsvParser.Config()): Unit = {
    val whole = csvEvents(input, config)
    val bytes = input.getBytes("UTF-8")
    (0 to bytes.length).foreach { i =>
      val p = new CsvParser(new ReifiedPlate, config)
      val a = p.absorb(bytes.slice(0, i)).unsafeGet
      val b = p.absorb(bytes.slice(i, bytes.length)).unsafeGet
      val c = p.finish().unsafeGet
      val merged = a ++ b ++ c
      if (merged != whole)
        sys.error(s"csv split at $i diverged:\n  merged=$merged\n  whole=$whole")
    }
  }

  // ------------------------------------- golden matchers (parseRowAs)

  /** The reference's `parseRowAs` matcher shape: parsing `input` must
    * yield exactly `expected` (plus the implicit trailing `FinishRow` the
    * row framings emit — pass it explicitly to pin it). Left carries a
    * first-divergence diff.
    */
  def parsesAs(
      input: String,
      mode: JsonParser.Mode = JsonParser.ValueStream)(
      expected: Event*): Either[String, Unit] =
    jsonResult(input, mode) match {
      case ParseResult.Failure(e) => Left(s"parse failed: $e")
      case ParseResult.Complete(got) => diff(got, expected.toList)
      case ParseResult.Partial(got, remaining) =>
        Left(s"parse left $remaining unconsumed bytes after $got")
    }

  /** CSV flavor of [[parsesAs]]. */
  def csvParsesAs(
      input: String,
      config: CsvParser.Config = CsvParser.Config())(
      expected: Event*): Either[String, Unit] =
    csvResult(input, config) match {
      case ParseResult.Failure(e) => Left(s"parse failed: $e")
      case ParseResult.Complete(got) => diff(got, expected.toList)
      case ParseResult.Partial(got, remaining) =>
        Left(s"parse left $remaining unconsumed bytes after $got")
    }

  /** Drive `events` through a fresh plate from `mkPlate` and compare the
    * terminal batch — the law harness for custom Plate implementations
    * (pair with [[EventGens.genStream]]).
    */
  def drivesTo[A](events: Seq[Event], mkPlate: () => Plate[A])(
      expected: A): Either[String, Unit] = {
    val got = Event.drive(events, mkPlate())
    if (got == expected) Right(())
    else Left(s"plate produced:\n  $got\nexpected:\n  $expected")
  }

  private def diff(got: List[Event], want: List[Event]): Either[String, Unit] =
    if (got == want) Right(())
    else {
      val i = got.zip(want).indexWhere { case (a, b) => a != b }
      val at = if (i >= 0) i else math.min(got.length, want.length)
      Left(s"event streams diverge at index $at: " +
        s"got ${got.lift(at).getOrElse("<end>")}, " +
        s"expected ${want.lift(at).getOrElse("<end>")}\n" +
        s"  full got:  $got\n  full want: $want")
    }

  // ------------------------------------------------- steering plates

  /** The reference specs' projection mask: keep only the given top-level
    * object key (or array index), SkipColumn everything else (semantics of
    * reference ParserSpecs.scala:274-310 targetMask).
    */
  def targetMask(target: Either[Int, String])(delegate: EventPlate): EventPlate =
    new DelegatingPlate[List[Event]](delegate) {
      private[this] var depth = 0
      private[this] var index = 0

      override def nestMap(pathComponent: CharSequence): Signal =
        if (depth == 0 && Right(pathComponent.toString) == target)
          super.nestMap(pathComponent)
        else { depth += 1; Signal.SkipColumn }

      override def nestArr(): Signal =
        if (depth == 0) {
          index += 1
          if (Left(index - 1) == target) super.nestArr()
          else { depth += 1; Signal.SkipColumn }
        } else { depth += 1; Signal.SkipColumn }

      override def unnest(): Signal =
        if (depth == 0) super.unnest()
        else { depth -= 1; Signal.Continue }
    }
}
