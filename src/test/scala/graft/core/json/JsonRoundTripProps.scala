package graft.core.json

import graft.core._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import Event._

/** Generative round-trip: random JSON documents (nested, escaped strings,
  * every number shape), rendered compact or whitespace-padded, absorbed in
  * random chunkings — the parsed event stream must equal the stream
  * derived from the document structure by the protocol rules.
  */
object JsonRoundTripProps extends Properties("JsonRoundTrip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(2000)

  sealed trait J
  case object JNull extends J
  final case class JBool(b: Boolean) extends J
  final case class JNum(text: String) extends J
  final case class JStr(s: String) extends J
  final case class JArr(items: List[J]) extends J
  final case class JObj(fields: List[(String, J)]) extends J

  private val genNum: Gen[JNum] = for {
    neg <- Gen.oneOf("", "-")
    intPart <- Gen.oneOf(Gen.const("0"), Gen.choose(1L, 987654321098L).map(_.toString))
    frac <- Gen.oneOf(Gen.const(""), Gen.choose(0, 99999).map(n => s".$n"))
    exp <- Gen.oneOf(Gen.const(""), for {
      e <- Gen.oneOf("e", "E")
      sign <- Gen.oneOf("", "+", "-")
      d <- Gen.choose(0, 300)
    } yield s"$e$sign$d")
  } yield JNum(s"$neg$intPart$frac$exp")

  private val genChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '!', '#', '{', '}', '[', ']', ',', ':', '/'),
    1 -> Gen.oneOf('"', '\\', '\n', '\t', '\b', '\f', '\r'),
    1 -> Gen.oneOf('é', '中', 'ß', '€'),
    1 -> Gen.choose(0x1F600, 0x1F64F).map(_.toChar)) // NB surrogates handled below

  private val genString: Gen[String] =
    Gen.listOf(genChar).map(_.mkString.take(24))
      // strip unpaired surrogate halves the char generator can produce
      .map(s => s.filter(c => !Character.isSurrogate(c)))

  private def genJ(depth: Int): Gen[J] =
    if (depth >= 3) Gen.frequency(
      2 -> Gen.const(JNull),
      2 -> Gen.oneOf(JBool(true), JBool(false)),
      3 -> genNum,
      3 -> genString.map(JStr))
    else Gen.frequency(
      2 -> Gen.const(JNull),
      2 -> Gen.oneOf(JBool(true), JBool(false)),
      3 -> genNum,
      3 -> genString.map(JStr),
      2 -> Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genJ(depth + 1)).map(JArr(_))),
      2 -> Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
        for { k <- genString; v <- genJ(depth + 1) } yield (k, v)).map(JObj(_))))

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def render(j: J, pad: String): String = j match {
    case JNull     => "null"
    case JBool(b)  => b.toString
    case JNum(t)   => t
    case JStr(s)   => "\"" + escape(s) + "\""
    case JArr(Nil) => s"[$pad]"
    case JArr(xs)  => xs.map(render(_, pad)).mkString(s"[$pad", s"$pad,$pad", s"$pad]")
    case JObj(Nil) => s"{$pad}"
    case JObj(fs)  => fs.map { case (k, v) =>
      "\"" + escape(k) + s"\"$pad:$pad" + render(v, pad)
    }.mkString(s"{$pad", s"$pad,$pad", s"$pad}")
  }

  private def events(j: J): List[Event] = j match {
    case JNull     => List(Nul)
    case JBool(true)  => List(Tru)
    case JBool(false) => List(Fls)
    case JNum(t)   => List(Num(t, t.indexOf('.'), math.max(t.indexOf('e'), t.indexOf('E'))))
    case JStr(s)   => List(Str(s))
    case JArr(Nil) => List(Arr)
    case JArr(xs)  => xs.flatMap(x => NestArr :: events(x) ::: List(Unnest))
    case JObj(Nil) => List(Map)
    case JObj(fs)  => fs.flatMap { case (k, v) => NestMap(k) :: events(v) ::: List(Unnest) }
  }

  private val genPad = Gen.oneOf("", " ", "\n  ", "\t")

  private val genCase = for {
    docs <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genJ(0)))
    pad <- genPad
    cuts <- Gen.listOf(Gen.choose(0.0, 1.0))
  } yield (docs, pad, cuts.take(6))

  property("parse(render(doc)) == protocol events, under any chunking") =
    forAll(genCase) { case (docs, pad, cuts) =>
      val text = docs.map(render(_, pad)).mkString(" ")
      val expected = docs.flatMap(d => events(d) :+ FinishRow)
      val bytes = text.getBytes("UTF-8")
      val cutsAbs = cuts.map(c => (c * bytes.length).toInt).distinct.sorted
      val plate = new ReifiedPlate
      val parser = new JsonParser(plate, JsonParser.ValueStream)
      var acc = List.empty[Event]
      var prev = 0
      (cutsAbs :+ bytes.length).foreach { cut =>
        if (cut > prev) {
          acc = acc ::: parser.absorb(bytes.slice(prev, cut)).unsafeGet
          prev = cut
        }
      }
      acc = acc ::: parser.finish().unsafeGet
      if (acc != expected) {
        println(s"INPUT: $text")
        println(s"GOT:   $acc")
        println(s"WANT:  $expected")
      }
      acc == expected
    }

  property("UnwrapArray: elements of a rendered array become rows") =
    forAll(genCase) { case (docs, pad, cuts) =>
      val text = docs.map(render(_, pad)).mkString("[", s"$pad,$pad", "]")
      val expected = docs.flatMap(d => events(d) :+ FinishRow)
      val bytes = text.getBytes("UTF-8")
      val cutsAbs = cuts.map(c => (c * bytes.length).toInt).distinct.sorted
      val plate = new ReifiedPlate
      val parser = new JsonParser(plate, JsonParser.UnwrapArray)
      var acc = List.empty[Event]
      var prev = 0
      (cutsAbs :+ bytes.length).foreach { cut =>
        if (cut > prev) {
          acc = acc ::: parser.absorb(bytes.slice(prev, cut)).unsafeGet
          prev = cut
        }
      }
      acc = acc ::: parser.finish().unsafeGet
      acc == expected
    }
}
