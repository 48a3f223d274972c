package graft.spark

import graft.core.json.JsonParser
import graft.core.csv.CsvParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import scala.collection.mutable

/** The precomputed converter codes (RowPlate.CvDouble/CvLong/CvString)
  * short-circuit the generic [[Conversions]] match chains on the scalar
  * hot path. These properties pin the invariant that makes that safe:
  * for EVERY lexically-valid JSON number token — including overflow
  * digits, Long.MinValue, exponent forms, and leading-zero fractions —
  * the fast path lands the bit-identical value the generic path
  * computes, through the REAL parser (zero-copy byte views, true
  * decIdx/expIdx) rather than synthetic CharSequences. Same for the CSV
  * str-event route (cells coerce through CvString only for STRING
  * targets; numeric targets must still walk fromString).
  */
object RowPlateConvProps extends Properties("RowPlateConv") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  private val digits = Gen.chooseNum(1, 22).flatMap(n => Gen.stringOfN(n, Gen.numChar))
  // JSON grammar: int part is "0" or nonzero-first digits (no leading zeros)
  private val intPart = Gen.oneOf(
    Gen.const("0"),
    for { h <- Gen.oneOf('1' to '9'); t <- Gen.chooseNum(0, 21).flatMap(n =>
      Gen.stringOfN(n, Gen.numChar)) } yield s"$h$t",
    Gen.const("9223372036854775807"),
    Gen.const("9223372036854775808"), Gen.const("9223372036854775809"))
  private val numToken: Gen[String] = for {
    neg  <- Gen.oneOf("", "-")
    int  <- intPart
    frac <- Gen.oneOf(Gen.const(""), digits.map("." + _))
    exp  <- Gen.oneOf(Gen.const(""), for {
              e <- Gen.oneOf("e", "E"); s <- Gen.oneOf("", "+", "-"); d <- Gen.chooseNum(0, 300)
            } yield s"$e$s$d")
  } yield s"$neg$int$frac$exp"
  // Long.MinValue must parse as a LONG; one past it must overflow to null
  private val numTokenAll = Gen.frequency(
    10 -> numToken,
    1 -> Gen.const("-9223372036854775808"),
    1 -> Gen.const("-9223372036854775809"))

  private val targets: Seq[DataType] = Seq(
    DoubleType, LongType, StringType, IntegerType, FloatType,
    DecimalType(20, 4), BooleanType)

  private def parseJson(schema: StructType, json: String): Seq[InternalRow] = {
    val rows = mutable.ArrayBuffer[InternalRow]()
    val plate = new RowPlate(schema, Array.empty, r => rows.append(r.copy()))
    val parser = new JsonParser(plate, JsonParser.ValueStream)
    parser.absorb(json)
    parser.finish() match {
      case graft.core.ParseResult.Failure(e) => throw e
      case _ => ()
    }
    rows.toSeq
  }

  private def expectedNum(dt: DataType, tok: String): Any =
    Conversions.fromNum(dt, tok, tok.indexOf('.'), tok.indexWhere(c => c == 'e' || c == 'E'))

  private def sameValue(got: Any, want: Any): Boolean = (got, want) match {
    case (null, null) => true
    case (g: java.lang.Double, w: java.lang.Double) =>
      java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w)
    case (g: java.lang.Float, w: java.lang.Float) =>
      java.lang.Float.floatToIntBits(g) == java.lang.Float.floatToIntBits(w)
    case (g, w) => g == w
  }

  // shrinking can mangle tokens into non-JSON; the invariant only covers
  // what the parser can actually emit as a num event
  private val jsonNum = "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?".r

  property("JSON num events match the generic Conversions path bit-for-bit") =
    forAll(numTokenAll) { tok =>
      jsonNum.matches(tok) ==> {
      val schema = StructType(targets.zipWithIndex.map { case (dt, i) =>
        StructField(s"c$i", dt)
      })
      val fields = targets.indices.map(i => s""""c$i": $tok""").mkString(", ")
      val rows = parseJson(schema, s"{$fields}")
      rows.length == 1 && targets.zipWithIndex.forall { case (dt, i) =>
        val got = if (rows.head.isNullAt(i)) null else rows.head.get(i, dt)
        sameValue(got, expectedNum(dt, tok)) || {
          println(s"type $dt token '$tok': got $got want ${expectedNum(dt, tok)}")
          false
        }
      }
      }
    }

  // Container cells have NO per-element partial semantics (spark.read.json
  // partial-results parity, pinned empirically in round 13 and gated by
  // q229/q230): a num token that FAILS conversion to the element/value type
  // poisons the WHOLE array/map cell to null. When conversion succeeds, every
  // element/value must ride the lazily-learned child code bit-identically.
  property("array elements and map values ride the lazily-learned child code") =
    forAll(numTokenAll, Gen.chooseNum(1, 5)) { (tok, n) =>
      jsonNum.matches(tok) ==> {
      val schema = StructType(Seq(
        StructField("a", ArrayType(DoubleType)),
        StructField("m", MapType(StringType, LongType))))
      val arr = Seq.fill(n)(tok).mkString("[", ", ", "]")
      val m = (0 until n).map(i => s""""k$i": $tok""").mkString("{", ", ", "}")
      val rows = parseJson(schema, s"""{"a": $arr, "m": $m}""")
      def containerOk(col: Int, want: Any, dt: DataType): Boolean =
        if (want == null) rows.head.isNullAt(col) // poison: whole cell null, exactly on failure
        else !rows.head.isNullAt(col) && {
          val vals = if (col == 0) rows.head.getArray(0)
                     else rows.head.getMap(1).valueArray
          (0 until n).forall { i =>
            val v = if (vals.isNullAt(i)) null else vals.get(i, dt)
            sameValue(v, want)
          }
        }
      containerOk(0, expectedNum(DoubleType, tok), DoubleType) &&
        containerOk(1, expectedNum(LongType, tok), LongType)
      }
    }

  property("CSV str events: typed coercion equals Conversions.fromString") = {
    val cellGen = Gen.oneOf(numTokenAll, Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""), Gen.const("true"), Gen.const("false"), Gen.const("  7  "))
    val csvTargets = Seq(DoubleType, LongType, StringType, IntegerType, BooleanType)
    forAll(cellGen) { cell =>
      val schema = StructType(csvTargets.zipWithIndex.map { case (dt, i) =>
        StructField(s"c$i", dt)
      })
      val rows = mutable.ArrayBuffer[InternalRow]()
      val plate = new RowPlate(schema, Array.empty, r => rows.append(r.copy()),
        emptyCellsAsNull = true)
      val parser = new CsvParser(plate, CsvParser.Config(
        header = false, providedHeader = csvTargets.indices.map(i => s"c$i")))
      parser.absorb(csvTargets.indices.map(_ => cell).mkString(",") + "\r\n")
      parser.finish()
      rows.length == 1 && csvTargets.zipWithIndex.forall { case (dt, i) =>
        val got = if (rows.head.isNullAt(i)) null else rows.head.get(i, dt)
        val want = if (cell.isEmpty) null else Conversions.fromString(dt, cell)
        sameValue(got, want) || {
          println(s"type $dt cell '$cell': got $got want $want")
          false
        }
      }
    }
  }
}
