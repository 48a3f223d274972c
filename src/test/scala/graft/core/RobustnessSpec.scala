package graft.core

import graft.core.json.JsonParser
import graft.core.csv.CsvParser
import graft.testkit.ParserHarness._
import org.scalatest.funsuite.AnyFunSuite

import Event._

/** Edge-of-envelope behavior: deep nesting past the packed 64-level
  * container word, BOM on CSV, parser→replay integration, UTF-8 cells.
  */
class RobustnessSpec extends AnyFunSuite {

  test("nesting deeper than 64 levels (container-kind bitset spills)") {
    val depth = 150
    val input = ("{\"k\": " * depth) + "[1]" + ("}" * depth)
    val events = jsonEvents(input)
    assert(events.count(_ == Unnest) == depth + 1) // 150 map entries + 1 array elem
    assert(events.count { case NestMap("k") => true; case _ => false } == depth)
    // mixed object/array alternation across the word boundary
    val alt = ("[" + "{\"a\": [" * 40) + "1" + ("]}" * 40) + "]"
    assert(jsonEvents(alt).nonEmpty)
  }

  test("deep skip: a 100-level value byte-skips in one Skipped") {
    val deep = ("[" * 100) + "1" + ("]" * 100)
    val events = jsonEvents(s"""{ "a": $deep, "b": 2 }""", wrap = targetMask(Right("b")))
    assert(events == List(
      Skipped(deep.length + 1), NestMap("b"), Num("2", -1, -1), Unnest, FinishRow))
  }

  test("CSV input with a UTF-8 BOM parses cleanly") {
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "h\nvéal\n".getBytes("UTF-8")
    val p = new CsvParser(new ReifiedPlate, CsvParser.Config(row1 = '\n', row2 = 0))
    val events = p.absorb(bytes).unsafeGet ++ p.finish().unsafeGet
    assert(events == List(NestMap("h"), Str("véal"), Unnest, FinishRow))
  }

  test("UTF-8 content in quoted CSV cells") {
    val events = csvEvents("a\r\n\"café 日本\"\r\n")
    assert(events == List(NestMap("a"), Str("café 日本"), Unnest, FinishRow))
  }

  test("parser events record into ReplayPlate and replay identically") {
    val input = """{"a": [1, {"b": "x"}], "c": null} {"a": [], "c": 2.5}"""
    val direct = jsonEvents(input)
    val replay = new ReplayPlate(retainSkips = true)
    val parser = new JsonParser(replay, JsonParser.ValueStream)
    parser.absorb(input)
    val cursor = parser.finish().unsafeGet.get
    val out = new ReifiedPlate
    cursor.drive(out)
    assert(out.finishBatch(true) == direct)
  }

  test("skips pass through record-and-replay when retained") {
    val input = """{ "a": 42, "b": "keep" }"""
    val rp = new ReplayPlate(retainSkips = true)
    val mask = new DelegatingPlate[Option[EventCursor]](rp) {
      private[this] var depth = 0
      override def nestMap(k: CharSequence): Signal =
        if (depth == 0 && k.toString == "b") super.nestMap(k)
        else { depth += 1; Signal.SkipColumn }
      override def unnest(): Signal =
        if (depth == 0) super.unnest() else { depth -= 1; Signal.Continue }
    }
    val parser = new JsonParser(mask, JsonParser.ValueStream)
    parser.absorb(input)
    val cursor = parser.finish().unsafeGet.get
    val out = new ReifiedPlate
    cursor.drive(out)
    assert(out.finishBatch(true) ==
      List(Skipped(3), NestMap("b"), Str("keep"), Unnest, FinishRow))
  }

  test("a million tiny rows stream through without state drift") {
    val row = "{\"v\":1}\n".getBytes("UTF-8")
    val plate = new RowCountPlate
    val parser = new JsonParser(plate, JsonParser.ValueStream)
    var total = 0L
    var i = 0
    while (i < 100000) {
      parser.absorb(row) match {
        case ParseResult.Complete(n) => total += n
        case other => fail(s"unexpected $other")
      }
      i += 1
    }
    parser.finish() match {
      case ParseResult.Complete(n) => total += n
      case other => fail(s"unexpected $other")
    }
    assert(total == 100000L)
  }
}
