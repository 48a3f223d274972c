package graft.core

import graft.core.json.JsonParser
import graft.spark.RowPlate
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mison-style key cruise ([[KeyProbe]]): row-depth keys the plate rules
  * out are consumed `"key": value` with no plate notification. These specs
  * pin the semantics the optimization must not change: identical results
  * at every chunk split, escaped/UTF-8/long keys falling back to the full
  * decode path, and wanted keys always delivered.
  */
class KeyCruiseSpec extends AnyFunSuite {

  private def parse(input: String, schema: StructType, chunk: Int): Seq[Seq[Any]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val plate = new RowPlate(schema, Array.empty,
      r => out += (0 until schema.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i, schema(i).dataType)))
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

  private val schema = StructType.fromDDL("bar LONG, a_very_long_column_name LONG")

  test("unwanted keys cruise at every chunk split; wanted keys bind") {
    val input =
      """{"junk": {"x": [1, "two"]}, "bar": 7, "noise": "zz", "a_very_long_column_name": 1}
        |{"bar": 8, "skipme": [[[]]], "other": 1.5e10}
        |{"pre": "a", "mid": true, "a_very_long_column_name": 2}
        |""".stripMargin
    val want = Seq(Seq(7L, 1L), Seq(8L, null), Seq(null, 2L))
    for (chunk <- 1 to input.length)
      assert(parse(input, schema, chunk) == want, s"chunk=$chunk")
  }

  test("escaped and UTF-8 keys fall back to the decode path correctly") {
    // "bar" decodes to "bar" (wanted); "café" + raw UTF-8 keys
    // are unwanted but must not derail the parse
    val input =
      """{"bar": 11, "café": 1}
        |{"bar": 12, "naïve": {"x": 1}}
        |""".stripMargin
    val want = Seq(Seq(11L, null), Seq(12L, null))
    for (chunk <- Seq(1, 2, 3, 5, 8, input.length))
      assert(parse(input, schema, chunk) == want, s"chunk=$chunk")
  }

  test("cruise is disabled when saturate=false (strict validation path)") {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val plate = new RowPlate(StructType.fromDDL("bar LONG"), Array.empty,
      r => out += r.getLong(0), saturate = false)
    assert(!plate.cruisableKey("junk".getBytes, 0, 4))
    JsonParser.parseAll("""{"junk": 1, "bar": 3}""", plate, JsonParser.ValueStream)(
      (a: Long, b: Long) => a + b)
    assert(out.toSeq == Seq(3L))
  }

  test("cruise applies to UnwrapArray row objects too (depth 1)") {
    val input = """[{"junk": [1, 2], "bar": 5}, {"bar": 6, "x": "y"}]"""
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bytes = input.getBytes("UTF-8")
    for (chunk <- Seq(1, 3, input.length)) {
      out.clear()
      val q = new JsonParser(new RowPlate(StructType.fromDDL("bar LONG"), Array.empty,
        r => out += r.getLong(0)), JsonParser.UnwrapArray)
      var off = 0
      while (off < bytes.length) {
        val n = math.min(chunk, bytes.length - off)
        q.absorb(bytes, off, n) match {
          case ParseResult.Failure(e) => throw e
          case _ => ()
        }
        off += n
      }
      q.finish() match { case ParseResult.Failure(e) => throw e; case _ => () }
      assert(out.toSeq == Seq(5L, 6L), s"chunk=$chunk")
    }
  }

  test("probe rules: schema columns and filter heads are never cruisable") {
    import org.apache.spark.sql.sources.GreaterThan
    val plate = new RowPlate(
      StructType.fromDDL("bar LONG, duh STRUCT<a: LONG>"),
      Array(GreaterThan("duh.a", 5L)), _ => ())
    assert(!plate.cruisableKey("bar".getBytes, 0, 3))
    assert(!plate.cruisableKey("duh".getBytes, 0, 3))
    assert(plate.cruisableKey("qux".getBytes, 0, 3))
    // length-discriminated: a prefix of a wanted key is still cruisable
    assert(plate.cruisableKey("ba".getBytes, 0, 2))
    assert(plate.cruisableKey("barr".getBytes, 0, 4))
  }

  // ---- probe ORDER cache adversaries (the by-arrival-position verdict
  // cache must self-verify against the bytes, never trust the position)

  test("order cache: changing key order across rows never flips a verdict") {
    val sch = StructType.fromDDL("bar LONG, baz LONG")
    // row 1 teaches position 0 = junk(cruise), 1 = bar, 2 = baz;
    // row 2 swaps everything; row 3 puts a SAME-LENGTH different key at
    // each learned position (jnk vs bar at pos 0: both 3 bytes); row 4
    // re-uses row 1's order (cache re-learned by then)
    val input =
      """{"junk": 1, "bar": 10, "baz": 100}
        |{"baz": 200, "junk": 2, "bar": 20}
        |{"jnk": 3, "baz": 300, "bar": 30}
        |{"junk": 4, "bar": 40, "baz": 400}
        |""".stripMargin
    val want = Seq(Seq(10L, 100L), Seq(20L, 200L), Seq(30L, 300L), Seq(40L, 400L))
    for (chunk <- Seq(1, 2, 7, input.length))
      assert(parse(input, sch, chunk) == want, s"chunk=$chunk")
  }

  test("order cache: long keys sharing an 8-byte prefix stay distinct") {
    val sch = StructType.fromDDL("prefix_wanted LONG")
    // both keys are > 8 bytes and share the first 8 bytes; position 0
    // alternates between them row to row
    val input =
      """{"prefix_wanted": 1, "prefix_unwanted": 9}
        |{"prefix_unwanted": 9, "prefix_wanted": 2}
        |{"prefix_wanted": 3}
        |""".stripMargin
    val want = Seq(Seq(1L), Seq(2L), Seq(3L))
    for (chunk <- Seq(1, 3, input.length))
      assert(parse(input, sch, chunk) == want, s"chunk=$chunk")
  }

  test("order cache: rows wider than the 64-position cache stay correct") {
    val sch = StructType.fromDDL("bar LONG")
    // 70 junk keys before bar (positions past the cache fall back to the
    // scan), then a second row with bar FIRST (cached positions mismatch)
    val wide = (0 until 70).map(i => s""""junk$i": $i""").mkString(", ")
    val input = s"""{$wide, "bar": 1}\n{"bar": 2, $wide}\n"""
    val want = Seq(Seq(1L), Seq(2L))
    for (chunk <- Seq(1, 13, input.length))
      assert(parse(input, sch, chunk) == want, s"chunk=$chunk")
  }
}
