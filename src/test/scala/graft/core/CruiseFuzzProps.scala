package graft.core

import graft.core.json.JsonParser
import graft.spark.RowPlate
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Differential fuzz for the key-cruise + saturation fast paths: for
  * random rows, a random schema subset, and a random chunk size, the
  * optimized parse (cruise + saturation ON) must produce exactly the rows
  * of the strict parse (both OFF) — INCLUDING duplicate row-level keys
  * since round 20 (the saturated tail cruises and re-parses schema-key
  * duplicates, so last-wins holds in both modes; the old first-wins
  * divergence is retired to option("saturation","fast")).
  */
object CruiseFuzzProps extends Properties("KeyCruise") {

  // deeper soak runs on demand: GRAFT_FUZZ_N=5000 sbt "testOnly ...CruiseFuzzProps"
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_FUZZ_N", "100").toInt)

  private val keyPool = Vector("a", "bb", "ccc", "dddd", "key_five", "sixsix",
    "a_rather_long_key_name", "z9", "q", "nested")

  private val genScalar: Gen[String] = Gen.oneOf(
    Gen.choose(-100000L, 100000L).map(_.toString),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.4f"),
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
    Gen.oneOf("true", "false", "null"),
    Gen.const("\"es\\\"caped\\\\\""),
    Gen.const("\"uni\\u00e9\""))

  private def genValue(depth: Int): Gen[String] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1)).map(_.mkString("[", ", ", "]"))),
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1)).flatMap { vs =>
          Gen.pick(vs.length, keyPool).map(ks =>
            ks.zip(vs).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
        }))

  private val genRow: Gen[String] = for {
    n    <- Gen.choose(1, 6)
    keys <- Gen.pick(n, keyPool)
    vals <- Gen.listOfN(n, genValue(2))
  } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  // WITH-replacement keys: duplicate row-level bindings (incl. rebinds of
  // schema keys before AND after the saturation point)
  private val genDupRow: Gen[String] = for {
    n    <- Gen.choose(2, 8)
    keys <- Gen.listOfN(n, Gen.oneOf(keyPool))
    vals <- Gen.listOfN(n, genValue(2))
  } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  private val genDupCase = for {
    rows   <- Gen.choose(1, 8).flatMap(Gen.listOfN(_, genDupRow))
    nCols  <- Gen.choose(1, 4)
    cols   <- Gen.pick(nCols, keyPool)
    chunk  <- Gen.choose(1, 64)
  } yield (rows.mkString("", "\n", "\n"),
           StructType(cols.map(c => StructField(c, StringType)).toArray), chunk)

  private val genCase = for {
    rows   <- Gen.choose(1, 8).flatMap(Gen.listOfN(_, genRow))
    nCols  <- Gen.choose(1, 4)
    cols   <- Gen.pick(nCols, keyPool)
    chunk  <- Gen.choose(1, 64)
  } yield (rows.mkString("", "\n", "\n"),
           StructType(cols.map(c => StructField(c, StringType)).toArray), chunk)

  private def run(input: String, schema: StructType, chunk: Int,
      fast: Boolean): Seq[Seq[Any]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val plate = new RowPlate(schema, Array.empty,
      r => out += (0 until schema.length).map(i =>
        if (r.isNullAt(i)) null else r.getUTF8String(i).toString),
      saturate = fast)
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

  property("cruise+saturation equals the strict parse on unique-key rows") =
    forAll(genCase) { case (input, schema, chunk) =>
      run(input, schema, chunk, fast = true) == run(input, schema, chunk, fast = false)
    }

  property("cruise+saturation equals the strict parse on DUPLICATE-key rows") =
    forAll(genDupCase) { case (input, schema, chunk) =>
      run(input, schema, chunk, fast = true) == run(input, schema, chunk, fast = false)
    }

  property("chunk size never changes the fast-path result") =
    forAll(genCase) { case (input, schema, _) =>
      val whole = run(input, schema, input.length.max(1), fast = true)
      (1 to 7).forall(c => run(input, schema, c, fast = true) == whole)
    }

  // chain-heavy shape: wide rows of consecutive unwanted fields with a
  // single wanted column — the longest runs through the chained cruise
  // (inline scalar/string consumption + container exits), across chunk
  // splits that force every suspension fallback
  private val genWideCase = for {
    rows  <- Gen.choose(1, 6).flatMap(Gen.listOfN(_, for {
      n    <- Gen.choose(8, 10)
      keys <- Gen.pick(n, keyPool)
      vals <- Gen.listOfN(n, genValue(2))
    } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")))
    col   <- Gen.oneOf(keyPool)
    chunk <- Gen.choose(1, 16)
  } yield (rows.mkString("", "\n", "\n"),
           StructType(Array(StructField(col, StringType))), chunk)

  property("chained cruise over wide rows equals the strict parse") =
    forAll(genWideCase) { case (input, schema, chunk) =>
      run(input, schema, chunk, fast = true) == run(input, schema, chunk, fast = false)
    }
}
