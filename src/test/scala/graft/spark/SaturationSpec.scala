package graft.spark

import graft.core.ParseResult
import graft.core.json.JsonParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Saturation pushdown (Signal.FinishRow): once every schema column has
  * arrived, the parser byte-skips the rest of the row in one scan and
  * still KEEPS the row. Checked for both plates, including suspension at
  * every possible chunk boundary (the skip must checkpoint mid-tail).
  */
class SaturationSpec extends AnyFunSuite {

  private val corpus =
    """{"a": 1, "junk": {"x": [1, 2, "three"], "y": "zzz"}, "tail": "t1", "more": 1.5}
      |{"junk": "before", "a": 2, "tail": "t2"}
      |{"a": 3}
      |{"tail": "only", "junk": 9}
      |""".stripMargin

  private def rowPlateRows(input: String, chunk: Int): Seq[(Boolean, Long)] = {
    val schema = StructType.fromDDL("a LONG")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Long)]
    val plate = new RowPlate(schema, Array.empty,
      r => out += ((r.isNullAt(0), if (r.isNullAt(0)) -1L else r.getLong(0))))
    val p = new JsonParser(plate, JsonParser.ValueStream)
    val bytes = input.getBytes("UTF-8")
    var off = 0
    while (off < bytes.length) {
      val n = math.min(chunk, bytes.length - off)
      p.absorb(bytes, off, n) match {
        case ParseResult.Failure(e) => throw e
        case _ => ()
      }
      off += n
    }
    p.finish() match { case ParseResult.Failure(e) => throw e; case _ => () }
    out.toSeq
  }

  test("RowPlate saturation keeps rows and skips tails at every chunk split") {
    val want = Seq((false, 1L), (false, 2L), (false, 3L), (true, -1L))
    for (chunk <- 1 to corpus.length) {
      assert(rowPlateRows(corpus, chunk) == want, s"chunk=$chunk")
    }
  }

  test("RowPlate saturation accounts the skipped tail bytes") {
    val schema = StructType.fromDDL("a LONG")
    var rows = 0
    val plate = new RowPlate(schema, Array.empty, _ => rows += 1)
    JsonParser.parseAll(corpus, plate, JsonParser.ValueStream)((a: Long, b: Long) => a + b)
    assert(rows == 4)
    // row 1's tail alone is > 40 bytes; the junk values of rows 2/4 are
    // skipped as columns — either way the meter must have moved well past
    // the per-column skips of the unsaturated formulation
    assert(plate.totalSkippedBytes > 60, s"skipped=${plate.totalSkippedBytes}")
  }

  test("ColumnarPlate saturation matches the unsaturated parse exactly") {
    val schema = StructType.fromDDL("a LONG, tail STRING")
    def run(saturate: Boolean, chunk: Int): Seq[String] = {
      val plate = new ColumnarPlate(schema, Array.empty, saturate = saturate)
      val p = new JsonParser[Long](plate, JsonParser.ValueStream)
      val bytes = corpus.getBytes("UTF-8")
      var off = 0
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      def drain(): Unit = while (plate.pendingRows > 0) {
        val b = plate.takeBatch()
        for (i <- 0 until b.numRows()) {
          val a = if (b.column(0).isNullAt(i)) "null" else b.column(0).getLong(i).toString
          val t = if (b.column(1).isNullAt(i)) "null" else b.column(1).getUTF8String(i).toString
          got += s"$a/$t"
        }
      }
      while (off < bytes.length) {
        val n = math.min(chunk, bytes.length - off)
        p.absorb(bytes, off, n) match { case ParseResult.Failure(e) => throw e; case _ => () }
        drain()
        off += n
      }
      p.finish() match { case ParseResult.Failure(e) => throw e; case _ => () }
      drain()
      got.toSeq
    }
    val want = Seq("1/t1", "2/t2", "3/null", "null/only")
    for (chunk <- Seq(1, 3, 7, corpus.length)) {
      assert(run(saturate = true, chunk) == want, s"saturated chunk=$chunk")
      assert(run(saturate = false, chunk) == want, s"unsaturated chunk=$chunk")
    }
  }

  // ---- optimistic saturated tail (round 16): the blind tail scan must
  // fall back to exact re-parsing at every duplicate of a wanted key —
  // plain, escaped, whitespace-separated — while value strings that merely
  // share a wanted key's first byte, over-long keys, and unwanted keys
  // stay on the fast path. All checked at EVERY chunk split (the confirm
  // scan suspends and resumes mid-key).
  private val optCorpus =
    // dup after saturation, scalar: last-wins
    """{"a": 1, "junkazz": "aaa", "a": 7}
      |""".stripMargin +
    // dup after saturation, container value under LONG target: DISCARDED
    // binding never overwrites (spark parity)
    """{"a": 2, "zz": [1, {"q": "x"}], "a": {"x": 1}}
      |""".stripMargin +
    // \u-escaped duplicate key decodes to "a": must rebind (handoff path);
    // the JSON bytes are `"a": 30` (built char-wise to dodge Scala's
    // own unicode-escape processing in literals)
    "{\"a\": 3, \"pad\": \"pppp\", \"" + '\\' + "u0061\": 30}\n" +
    // value strings sharing the wanted first byte (false-positive
    // candidates), incl. one with an escape; then a real dup with
    // whitespace between the key close and ':'
    """{"a": 4, "w1": "abcdef", "w2": "a\\b", "a"  :  40}
      |""".stripMargin +
    // an over-long key sharing the first byte (exceeds the confirm bound)
    // is not actionable; the later short dup still rebinds
    """{"a": 5, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa": 0, "a": 50}
      |""".stripMargin +
    // unwanted key whose first byte matches (confirm resolves via the
    // probe and stays skipping); dup at the very end of the row
    """{"a": 6, "ax": 1, "ay": {"a": 99}, "a": 60}
      |""".stripMargin +
    // no duplicates at all: pure fast path
    """{"a": 8, "tail": "t", "deep": {"a": [1, 2], "b": "x"}}
      |""".stripMargin

  test("optimistic tail rebinds exactly the wanted-key duplicates at every split") {
    val want = Seq(7L, 2L, 30L, 40L, 50L, 60L, 8L)
    for (chunk <- 1 to optCorpus.length) {
      val got = rowPlateRows(optCorpus, chunk)
      assert(got.forall(!_._1) && got.map(_._2) == want, s"chunk=$chunk got=$got")
    }
  }

  test("optimistic tail matches the columnar plate too, at every split") {
    val schema = StructType.fromDDL("a LONG")
    val want = Seq(7L, 2L, 30L, 40L, 50L, 60L, 8L)
    val bytes = optCorpus.getBytes("UTF-8")
    for (chunk <- 1 to bytes.length) {
      val plate = new ColumnarPlate(schema, Array.empty, saturate = true)
      val p = new JsonParser[Long](plate, JsonParser.ValueStream)
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      def drain(): Unit = while (plate.pendingRows > 0) {
        val b = plate.takeBatch()
        for (i <- 0 until b.numRows()) got += b.column(0).getLong(i)
      }
      var off = 0
      while (off < bytes.length) {
        val n = math.min(chunk, bytes.length - off)
        p.absorb(bytes, off, n) match { case ParseResult.Failure(e) => throw e; case _ => () }
        drain()
        off += n
      }
      p.finish() match { case ParseResult.Failure(e) => throw e; case _ => () }
      drain()
      assert(got.toSeq == want, s"chunk=$chunk")
    }
  }

  test("ColumnarPlate duplicate keys overwrite (last-wins), strings and nulls included") {
    // pre-saturation duplicates must match RowPlate/spark.read.json:
    // later binding wins, including string re-pointing and null-bit
    // clearing (putNotNull) when the first binding was null
    val schema = StructType.fromDDL("a LONG, s STRING, z LONG")
    val input =
      """{"a": null, "s": "first", "a": 5, "s": "second-longer", "z": 1}
        |{"s": "x", "s": null, "a": 2, "z": 2}
        |""".stripMargin
    val plate = new ColumnarPlate(schema, Array.empty, saturate = false)
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)
    p.absorb(input.getBytes("UTF-8")) match {
      case ParseResult.Failure(e) => throw e
      case _ => ()
    }
    p.finish() match { case ParseResult.Failure(e) => throw e; case _ => () }
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    while (plate.pendingRows > 0) {
      val b = plate.takeBatch()
      for (i <- 0 until b.numRows()) {
        val a = if (b.column(0).isNullAt(i)) "null" else b.column(0).getLong(i).toString
        val s = if (b.column(1).isNullAt(i)) "null" else b.column(1).getUTF8String(i).toString
        val z = b.column(2).getLong(i)
        got += s"$a/$s/$z"
      }
    }
    assert(got.toSeq == Seq("5/second-longer/1", "2/null/2"))
  }
}
