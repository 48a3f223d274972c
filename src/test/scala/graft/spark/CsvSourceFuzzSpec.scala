package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

/** Randomized CSV differential at the DSv2 level: random corpora with
  * quoted delimiters, doubled quotes, empty cells, unicode, and typed
  * columns read through `format("graft-csv")` must collect exactly what
  * `spark.read.csv` collects under the same dialect (quote-doubling:
  * `escape = "`), schema, projection, and filter. Deterministic seed.
  */
class CsvSourceFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-csv-fuzz")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("csv-source-fuzz")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private val strPool = Seq("plain", "with,comma", "dou\"\"bled", "π😀", "za",
    "  spaced  ", "with,two,commas", "q\"mid", "")

  private def cell(rng: scala.util.Random): String = {
    val s = strPool(rng.nextInt(strPool.length))
    // quote when the value contains the delimiter or a quote (the dialect
    // both readers share); doubled quotes are already written escaped
    if (s.contains(",") || s.contains("\"") || (s.nonEmpty && rng.nextInt(4) == 0))
      "\"" + s.replace("\"\"", "").replace("\"", "\"\"").replace("", "\"\"\"\"") + "\""
    else s
  }

  private def corpus(rng: scala.util.Random, rows: Int): String = {
    val sb = new StringBuilder("id,s,d,b\n")
    (1 to rows).foreach { i =>
      sb.append(i)
      sb.append(',').append(if (rng.nextInt(8) == 0) "" else cell(rng))
      sb.append(',').append(rng.nextInt(5) match {
        case 0 => ""
        case 1 => s"${rng.nextInt(2000) - 1000}.${math.abs(rng.nextInt(1000))}"
        case _ => (rng.nextInt(100000) - 50000).toString
      })
      sb.append(',').append(Seq("true", "false", "")(rng.nextInt(3)))
      sb.append('\n')
    }
    sb.toString
  }

  test("dialect variants (delimiter, CRLF) read identically to spark.read.csv") {
    val rng = new scala.util.Random(0xD1A7EC7)
    val schema = "id LONG, s STRING, d DOUBLE, b BOOLEAN"
    for (trial <- 1 to 4 * SoakX.x) {
      val delim = Seq("|", ";", "\t")(rng.nextInt(3))
      val sep = Seq("\n", "\r\n")(rng.nextInt(2))
      val sb = new StringBuilder(s"id${delim}s${delim}d${delim}b$sep")
      (1 to 80).foreach { i =>
        val s0 = strPool(rng.nextInt(strPool.length)).replace(",", delim)
        val v = if (s0.contains(delim) || s0.contains("\""))
          "\"" + s0.replace("\"", "\"\"") + "\"" else s0
        sb.append(i).append(delim).append(v)
          .append(delim).append(if (rng.nextBoolean()) (i * 1.5).toString else "")
          .append(delim).append(Seq("true", "false", "")(rng.nextInt(3)))
          .append(sep)
      }
      val p = dir.resolve(s"dia$trial.csv")
      Files.write(p, sb.toString.getBytes(UTF_8))
      val got = spark.read.format("graft-csv").schema(schema)
        .option(if (trial % 2 == 0) "sep" else "delimiter", delim) // both alias
        .option("linesep", sep).load(p.toString)
        .collect().map(_.toString).sorted.toSeq
      val want = spark.read.schema(schema)
        .option("header", "true").option("escape", "\"").option("sep", delim)
        .csv(p.toString)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"trial $trial delim=${delim.replace("\t", "\\t")} sep=${if (sep == "\n") "LF" else "CRLF"}: " +
          s"${got.size} vs ${want.size}\n" +
          got.zip(want).find { case (a, b) => a != b }.map { case (a, b) =>
            s"first diff:\n  graft: $a\n  spark: $b" }.getOrElse(""))
    }
  }

  test("random corpora read identically to spark.read.csv (dialect, types, filters)") {
    val rng = new scala.util.Random(0xC5FF5EED)
    val schema = "id LONG, s STRING, d DOUBLE, b BOOLEAN"
    val projections = Seq(Seq("id", "s", "d", "b"), Seq("s", "id"), Seq("id", "d"))
    for (trial <- 1 to 8 * SoakX.x) {
      val p = dir.resolve(s"t$trial.csv")
      Files.write(p, corpus(rng, 120).getBytes(UTF_8))
      val proj = projections(rng.nextInt(projections.length))
      val fc = rng.nextInt(3)
      def app(df: DataFrame): DataFrame = fc match {
        case 0 => df
        case 1 => df.filter(col("id") < 80)
        case _ => df.filter(col("s").isNotNull)
      }
      val got = app(spark.read.format("graft-csv").schema(schema).load(p.toString))
        .select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
      val want = app(spark.read.schema(schema)
        .option("header", "true").option("escape", "\"").csv(p.toString))
        .select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"trial $trial proj=$proj fc=$fc: ${got.size} vs ${want.size} rows\n" +
          got.zip(want).find { case (a, b) => a != b }.map { case (a, b) =>
            s"first diff:\n  graft: $a\n  spark: $b" }.getOrElse(
            got.diff(want).take(3).mkString("graft-only: ", " | ", "")))
    }
  }

  test("csv sink metadata batteries agree with a parse of the file") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(0xC5F00D)
    for (trial <- 1 to 4 * SoakX.x) {
      val n = 40 + rng.nextInt(120)
      val rows = (1 to n).map { i =>
        (i.toLong,
         rng.nextInt(7) match {
           case 0 => null
           // empty cells read back as NULL in this dialect: the
           // collector must count empty strings as nulls (the
           // emptyStringsAsNull bug hid here)
           case 1 => ""
           case _ => s"v${rng.nextInt(500)}"
         },
         rng.nextInt(10) match {
           case 0 => null
           // CSV NaN/Infinity tokens round-trip (unlike JSON)
           case 1 => java.lang.Double.valueOf(Double.NaN)
           case _ => java.lang.Double.valueOf(rng.nextDouble() * 1000 - 500)
         })
      }
      val df = rows.toDF("id", "tag", "score")
      val out = dir.resolve(s"sink$trial").toString
      df.repartition(1 + rng.nextInt(3))
        .write.format("graft-csv").mode("overwrite").save(out)

      val battery = Seq(
        min("id"), max("id"), sum("id"), count(col("id")),
        min("tag"), max("tag"), count(col("tag")),
        min("score"), max("score"), count(col("score")), count(lit(1)))
      def readBack(skipping: Boolean) = spark.read.format("graft-csv")
        .schema("id LONG, tag STRING, score DOUBLE")
        .option("dataskipping", skipping.toString)
        .load(out).agg(battery.head, battery.tail: _*).collect()(0)
      // ground truth = parse of the written file (the dialect is lossy
      // for "" → NULL; the metadata must describe the file)
      val got = readBack(skipping = true)
      val want = readBack(skipping = false)
      (0 until got.length).foreach { c =>
        (got.get(c), want.get(c)) match {
          case (a: java.lang.Double, b: java.lang.Double) =>
            assert((a.isNaN && b.isNaN) || math.abs(a - b) <= math.ulp(b) * 64,
              s"trial $trial col $c: $a vs $b")
          case (a, b) => assert(a == b, s"trial $trial col $c: $a vs $b")
        }
      }
    }
  }
}
