package graft.spark

import graft.core.ParseResult
import graft.core.json.JsonParser
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage for the event→ColumnarBatch bridge, in particular
  * the chunk-boundary protocol: the columnar readers call takeBatch()
  * whenever complete rows are pending after a 256 KB chunk, which can
  * happen with a row IN FLIGHT — its already-written cells must carry over
  * into the fresh vectors.
  */
class ColumnarPlateSpec extends AnyFunSuite {

  private def raise[A](r: ParseResult[A]): Unit = r match {
    case ParseResult.Failure(e) => throw e
    case _ => ()
  }

  test("takeBatch mid-row carries the partial row's cells into the new batch") {
    val schema = StructType.fromDDL("a LONG, b STRING, c DOUBLE")
    val plate = new ColumnarPlate(schema, Array.empty)
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)

    // chunk 1 ends mid-row: row 2 has a=2 and b="y" already written
    raise(p.absorb("""{"a": 1, "b": "x", "c": 0.5}""" + "\n" + """{"a": 2, "b": "y", """))
    assert(plate.pendingRows == 1)
    val b1 = plate.takeBatch()
    assert(b1.numRows == 1)
    assert(b1.column(0).getLong(0) == 1L)
    assert(b1.column(1).getUTF8String(0).toString == "x")

    raise(p.absorb(""""c": 2.5}"""))
    raise(p.finish())
    assert(plate.pendingRows == 1)
    val b2 = plate.takeBatch()
    assert(b2.numRows == 1)
    // before the carry-over fix these read stale defaults (0 / empty)
    assert(b2.column(0).getLong(0) == 2L)
    assert(b2.column(1).getUTF8String(0).toString == "y")
    assert(b2.column(2).getDouble(0) == 2.5)
  }

  test("takeBatch mid-row carries explicit nulls and booleans") {
    val schema = StructType.fromDDL("a LONG, b BOOLEAN, c STRING")
    val plate = new ColumnarPlate(schema, Array.empty)
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)
    raise(p.absorb("""{"a": 7, "b": true, "c": "k"}""" + "\n" + """{"a": null, "b": false, """))
    val b1 = plate.takeBatch()
    assert(b1.numRows == 1)
    raise(p.absorb(""""c": "z"}"""))
    raise(p.finish())
    val b2 = plate.takeBatch()
    assert(b2.numRows == 1)
    assert(b2.column(0).isNullAt(0))
    assert(!b2.column(1).getBoolean(0))
    assert(b2.column(2).getUTF8String(0).toString == "z")
  }

  test("every split point of a two-row flat input yields identical batches") {
    val schema = StructType.fromDDL("a LONG, b STRING")
    val input = """{"a": 11, "b": "left"}""" + "\n" + """{"a": 22, "b": "right"}"""
    val bytes = input.getBytes("UTF-8")
    (0 to bytes.length).foreach { i =>
      val plate = new ColumnarPlate(schema, Array.empty)
      val p = new JsonParser[Long](plate, JsonParser.ValueStream)
      raise(p.absorb(bytes.slice(0, i)))
      // the reader takes whatever is pending at the chunk boundary
      val head = if (plate.pendingRows > 0) Some(plate.takeBatch()) else None
      raise(p.absorb(bytes.slice(i, bytes.length)))
      raise(p.finish())
      val tail = if (plate.pendingRows > 0) Some(plate.takeBatch()) else None
      val rows = (head.toSeq ++ tail.toSeq).flatMap { b =>
        (0 until b.numRows).map { r =>
          (b.column(0).getLong(r), b.column(1).getUTF8String(r).toString)
        }
      }
      assert(rows == Seq((11L, "left"), (22L, "right")), s"split $i")
    }
  }

  test("every split point of a struct-lane input yields identical batches") {
    val schema = StructType.fromDDL("id LONG, n STRUCT<x: LONG, y: STRING>")
    val input =
      """{"id": 1, "n": {"x": 10, "y": "a"}}""" + "\n" +
      """{"id": 2, "n": {"y": "b"}}""" + "\n" +
      """{"id": 3}""" + "\n" +
      """{"id": 4, "n": {}}""" + "\n" +
      """{"id": 5, "n": null}"""
    val bytes = input.getBytes("UTF-8")
    def structOf(b: org.apache.spark.sql.vectorized.ColumnarBatch, r: Int) =
      if (b.column(1).isNullAt(r)) null
      else (if (b.column(1).getChild(0).isNullAt(r)) null
            else java.lang.Long.valueOf(b.column(1).getChild(0).getLong(r)),
        if (b.column(1).getChild(1).isNullAt(r)) null
        else b.column(1).getChild(1).getUTF8String(r).toString)
    val want = Seq(
      (1L, (java.lang.Long.valueOf(10L), "a")),
      (2L, (null, "b")),
      (3L, null),
      (4L, (null, null)), // {} = PRESENT struct with null children
      (5L, null))
    (0 to bytes.length).foreach { i =>
      val plate = new ColumnarPlate(schema, Array.empty)
      val p = new JsonParser[Long](plate, JsonParser.ValueStream)
      raise(p.absorb(bytes.slice(0, i)))
      val head = if (plate.pendingRows > 0) Some(plate.takeBatch()) else None
      raise(p.absorb(bytes.slice(i, bytes.length)))
      raise(p.finish())
      val tail = if (plate.pendingRows > 0) Some(plate.takeBatch()) else None
      val rows = (head.toSeq ++ tail.toSeq).flatMap { b =>
        (0 until b.numRows).map(r => (b.column(0).getLong(r), structOf(b, r)))
      }
      assert(rows == want, s"split $i")
    }
  }

  test("takeBatch mid-struct carries the partial struct's children over") {
    val schema = StructType.fromDDL("id LONG, n STRUCT<x: LONG, y: STRING>")
    val plate = new ColumnarPlate(schema, Array.empty)
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)
    // chunk 1 ends INSIDE row 2's struct: x already written, y pending
    raise(p.absorb("""{"id": 1, "n": {"x": 5, "y": "a"}}""" + "\n" +
      """{"id": 2, "n": {"x": 6, """))
    assert(plate.pendingRows == 1)
    val b1 = plate.takeBatch()
    assert(b1.numRows == 1)
    raise(p.absorb(""""y": "late"}}"""))
    raise(p.finish())
    val b2 = plate.takeBatch()
    assert(b2.numRows == 1)
    assert(b2.column(0).getLong(0) == 2L)
    assert(!b2.column(1).isNullAt(0))
    assert(b2.column(1).getChild(0).getLong(0) == 6L)
    assert(b2.column(1).getChild(1).getUTF8String(0).toString == "late")
  }

  // putX value writes never reset a vector's validity bit, so a slot
  // reused after an abandoned row must have its null bits scrubbed —
  // minimal cases found by JsonSourceFuzzSpec (stale nulls leaked into
  // the NEXT row's present values)
  test("a filter-abandoned row's explicit nulls do not leak into the next row") {
    import org.apache.spark.sql.sources.LessThan
    val schema = StructType.fromDDL("id LONG, d DOUBLE, b BOOLEAN")
    val plate = new ColumnarPlate(schema,
      Array(LessThan("id", java.lang.Long.valueOf(100L))))
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)
    // row 1: d null first, then the filter column fails LAST -> abandoned
    raise(p.absorb(
      """{"d": null, "b": null, "id": 9223372036854775806}""" + "\n" +
      """{"d": 7.5, "id": 68, "b": true}""" + "\n"))
    raise(p.finish())
    val b = plate.takeBatch()
    assert(b.numRows == 1)
    assert(!b.column(1).isNullAt(0) && b.column(1).getDouble(0) == 7.5,
      "row 1's null bit leaked into row 2's d")
    assert(!b.column(2).isNullAt(0) && b.column(2).getBoolean(0))
  }

  test("a null-demand-rejected row's explicit nulls do not leak into the next row") {
    import org.apache.spark.sql.sources.IsNotNull
    val schema = StructType.fromDDL("id LONG, s STRING, d DOUBLE")
    val plate = new ColumnarPlate(schema, Array(IsNotNull("s")))
    val p = new JsonParser[Long](plate, JsonParser.ValueStream)
    // row 1: s missing -> rejected at finishRow, after d stamped null
    raise(p.absorb(
      """{"id": 1, "d": null}""" + "\n" +
      """{"d": 0.25, "id": 2, "s": "za"}""" + "\n"))
    raise(p.finish())
    val b = plate.takeBatch()
    assert(b.numRows == 1)
    assert(!b.column(2).isNullAt(0) && b.column(2).getDouble(0) == 0.25,
      "rejected row's null bit leaked into the kept row's d")
    assert(b.column(1).getUTF8String(0).toString == "za")
  }
}
