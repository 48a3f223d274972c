package graft.core

/** Streaming transducer surface: drive any [[BaseParser]] from an iterator
  * of byte chunks, emitting one batch value per absorb / continuation /
  * finish — the dependency-free counterpart of the reference's fs2
  * `Pipe[F, Byte, B]` (reference fs2/StreamParser.scala:36-78).
  *
  * Like the reference's pull loop, a `Partial` result (BreakBatch) is
  * re-churned via `continueParse()` WITHOUT pulling more input until the
  * buffered bytes drain; parse failures surface as thrown exceptions at
  * the point of consumption (the fs2 analog raises into the stream).
  */
object StreamParser {

  /** Transduce byte chunks into batch values. The final element(s) come
    * from `finish()` — emitted even for empty input (terminal batch).
    */
  def transduce[A](chunks: Iterator[Array[Byte]], parser: BaseParser[A]): Iterator[A] =
    new Iterator[A] {
      private[this] var pending: List[A] = Nil
      private[this] var draining = false // last result was Partial
      private[this] var finished = false
      private[this] var terminalDone = false

      private def handle(r: ParseResult[A]): Unit = r match {
        case ParseResult.Complete(a)   => pending = List(a); draining = false
        case ParseResult.Partial(a, _) => pending = List(a); draining = true
        case ParseResult.Failure(e)    => throw e
      }

      private def advance(): Unit = {
        while (pending.isEmpty && !terminalDone) {
          if (draining) handle(parser.continueParse())
          else if (chunks.hasNext) handle(parser.absorb(chunks.next()))
          else if (!finished) { finished = true; handle(parser.finish()) }
          else terminalDone = true
        }
      }

      def hasNext: Boolean = {
        advance()
        pending.nonEmpty
      }

      def next(): A = {
        advance()
        val a = pending.head
        pending = pending.tail
        a
      }
    }

  /** Fold every batch of a full parse (reference `foldable` shape). */
  def fold[A, B](chunks: Iterator[Array[Byte]], parser: BaseParser[A], zero: B)(f: (B, A) => B): B =
    transduce(chunks, parser).foldLeft(zero)(f)
}

/** Row-count harness: stream a byte source through a parser counting rows
  * per batch and folding the counts (reference harness/RowCountHarness
  * .scala:37-92) — the cheapest end-to-end sanity drive for a backend.
  */
object RowCountHarness {

  def countRowsJson(chunks: Iterator[Array[Byte]], mode: json.JsonParser.Mode): Long = {
    val parser = new json.JsonParser(new RowCountPlate, mode)
    StreamParser.fold(chunks, parser, 0L)(_ + _)
  }

  def countRowsCsv(chunks: Iterator[Array[Byte]], config: csv.CsvParser.Config): Long = {
    val parser = new csv.CsvParser(new RowCountPlate, config)
    StreamParser.fold(chunks, parser, 0L)(_ + _)
  }

  def countRowsFile(path: java.nio.file.Path, chunkSize: Int = 256 * 1024): Long = {
    val in = java.nio.file.Files.newInputStream(path)
    try {
      val it = Iterator.continually {
        val buf = new Array[Byte](chunkSize)
        val n = in.read(buf)
        if (n < 0) null else java.util.Arrays.copyOf(buf, n)
      }.takeWhile(_ != null)
      countRowsJson(it, json.JsonParser.ValueStream)
    } finally in.close()
  }
}
