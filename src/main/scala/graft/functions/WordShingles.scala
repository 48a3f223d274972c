package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True Catalyst `Generator` (UDTF surface, SURVEY §2.11 "UDF/UDAF/UDTF"):
  * `word_shingles(text, n)` emits one row `(pos, shingle)` per n-word
  * window of a single-space-tokenized document — the row-streaming form of
  * the shingle builders used by the dedup operators (q30/q32/q38), which
  * materialize a `transform(sequence(...))` array of every shingle per
  * document before exploding it.
  *
  * Why a Generator and not `explode(transform(...))`: at 100 TB a wide
  * document expands to thousands of shingle strings; the array form holds
  * them ALL in memory per row (and copies them into the explode's input),
  * while a Generator streams one row at a time through `GenerateExec` with
  * O(1) extra state. This is the EventCursor-style "one event at a time"
  * discipline (reference EventCursor.scala:59-128) applied to text.
  *
  * Tokenization contract (matches the repo-wide oracle convention of
  * `split(text, ' ')` ↔ DuckDB `string_split(text, ' ')`): words are the
  * single-space-delimited segments, empty segments included. Because the
  * delimiter is exactly one space, the n-word shingle joined with single
  * spaces is PRECISELY the byte substring of the original text from word
  * i's first byte to word i+n-1's last byte — so the generator emits
  * zero-rebuild slices of the input bytes (one allocation per emitted row,
  * none per word). `pos` is 1-based. Fewer than n words → no rows; null
  * text → no rows.
  */
case class WordShingles(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)
  override def prettyName: String = "word_shingles"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires a STRING first argument, got ${child.dataType.catalogString}")
    n match {
      case Literal(v: Int, IntegerType) if v >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "word_shingles requires a literal INT n >= 1 as the second argument")
    }
  }

  private lazy val nWords: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // word boundaries: starts(i) = first byte of word i, ends(i) = one past
    // its last byte. A single scan; spaces are ASCII so byte-level splitting
    // is UTF-8 safe.
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    if (m < nWords) return Iterator.empty
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val k = nWords
    val total = m - k + 1
    new Iterator[InternalRow] {
      private[this] var pos = 0
      override def hasNext: Boolean = pos < total
      override def next(): InternalRow = {
        val s = starts(pos)
        val e = ends(pos + k - 1)
        pos += 1
        new GenericInternalRow(Array[Any](
          pos, UTF8String.fromBytes(bytes, s, e - s)))
      }
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Iterator.empty

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordShingles =
    copy(child = newChildren(0), n = newChildren(1))
}
