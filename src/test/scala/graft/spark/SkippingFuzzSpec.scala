package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Randomized differential over the ENTIRE data-skipping stack: random
  * frames through the graft-json sink (sidecars + blooms + manifests +
  * sorted flags) under random physical layouts (single file, hash,
  * range+sort, hive-partitioned, z-ordered), then random pushed filters
  * read back through the graft scan — results must equal
  * `spark.read.json` over the same files (which never prunes). A single
  * unsound prune (bad bloom bit, wrong range bound, stale manifest
  * trust) silently loses rows, which is exactly what this hunts.
  * Deterministic seeds: failures reproduce.
  */
class SkippingFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-skip-fuzz")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("skipping-fuzz")
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

  private val schemaDdl = "id LONG, v LONG, s STRING, d DOUBLE, g LONG"

  // strings crossing every sidecar boundary: empties, >64B (truncated
  // bounds), >128B (bloom-disabling), unicode, near-0xFF prefixes
  private def strPool(rng: scala.util.Random): String = rng.nextInt(10) match {
    case 0 => ""
    case 1 => "x" * (65 + rng.nextInt(10)) + rng.nextInt(100)
    case 2 => "y" * (130 + rng.nextInt(20)) + rng.nextInt(100)
    case 3 => "π😀" + rng.nextInt(50)
    case 4 => "￿￿" + rng.nextInt(10)
    case _ => s"k-${rng.nextInt(400)}"
  }

  private def mkFrame(rng: scala.util.Random, rows: Int): DataFrame = {
    val s = spark; import s.implicits._
    (1 to rows).map { i =>
      (if (rng.nextInt(12) == 0) None else Some(rng.nextInt(2000).toLong),
       rng.nextLong() % 100000L,
       if (rng.nextInt(10) == 0) None else Some(strPool(rng)),
       rng.nextInt(8) match {
         case 0 => None
         case 1 => Some(Double.NaN)
         case 2 => Some(rng.nextInt(2) * 2.0 - 1.0 * Double.MaxValue)
         case _ => Some(rng.nextDouble() * 1000 - 500)
       },
       (i % 3).toLong)
    }.toDF("id", "v", "s", "d", "g")
  }

  private def writeLayout(rng: scala.util.Random, df: DataFrame, out: String): Unit = {
    val s = spark; import s.implicits._
    // random intra-file block granularity: off, or small enough that the
    // tiny fuzz files split into many blocks — block-pruned aligned
    // ranges then face every filter below (boundary-exactness hunting)
    val bb = Seq("0", "512", "2048")(rng.nextInt(3))
    def w(d: DataFrame) =
      d.write.format("graft-json").option("blockbytes", bb).mode("overwrite")
    rng.nextInt(5) match {
      case 0 => w(df.coalesce(1)).save(out)
      case 1 => w(df.repartition(3, $"id")).save(out)
      case 2 => w(df.repartitionByRange(3, $"id").sortWithinPartitions("id")).save(out)
      case 3 => w(df).partitionBy("g").save(out)
      case 4 => w(graft.api.TrainingData.zorderBy(df, 3, Seq("id", "v"), bits = 5)).save(out)
    }
  }

  private def mkFilter(rng: scala.util.Random): org.apache.spark.sql.Column =
    rng.nextInt(10) match {
      case 0 => col("id") === rng.nextInt(2200) // sometimes absent
      case 1 => col("id").isin(
        Seq.fill(1 + rng.nextInt(3))(rng.nextInt(2200).toLong): _*)
      case 2 => col("id") >= rng.nextInt(2000) && col("id") < rng.nextInt(2000)
      case 3 => col("s") === (if (rng.nextBoolean()) s"k-${rng.nextInt(400)}"
                              else "z-absent-" + rng.nextInt(5))
      case 4 => col("s").startsWith("k-" + rng.nextInt(10))
      case 5 => col("s").isNull
      case 6 => col("id").isNotNull && col("id") <= rng.nextInt(1000)
      case 7 => col("d") > rng.nextInt(400)
      case 8 => col("v") === rng.nextLong() % 100000L
      case 9 => col("g") === rng.nextInt(4) // partition col under layout 3
    }

  private def canon(df: DataFrame): Seq[String] =
    df.selectExpr("concat_ws('', id, v, coalesce(s, ''), " +
        "cast(d AS STRING), g)")
      .collect().map(_.getString(0)).sorted.toSeq

  test("random layouts + random filters: pruned graft scan equals spark.read.json") {
    (1 to 6 * SoakX.x).foreach { trial =>
      val rng = new scala.util.Random(0xC0FFEE + trial)
      val out = dir.resolve(s"t$trial").toString
      writeLayout(rng, mkFrame(rng, 250 + rng.nextInt(200)), out)
      // one trial mutates: drop a random sidecar mid-flight — pruning
      // must degrade, never corrupt
      if (trial == 3) {
        val stats = Files.walk(java.nio.file.Paths.get(out)).toArray
          .map(_.toString).filter(_.endsWith(".stats"))
        if (stats.nonEmpty) Files.delete(java.nio.file.Paths.get(
          stats(rng.nextInt(stats.length))))
      }
      (1 to 8).foreach { fi =>
        val f = mkFilter(rng)
        val got = canon(spark.read.format("graft-json").schema(schemaDdl)
          .load(out).filter(f))
        val want = canon(spark.read.json(out)
          .selectExpr("CAST(id AS LONG) id", "CAST(v AS LONG) v", "s",
            "CAST(d AS DOUBLE) d", "CAST(g AS LONG) g")
          .filter(f))
        assert(got == want,
          s"trial $trial filter #$fi ($f): got ${got.size} rows, want ${want.size}\n" +
            s"missing: ${(want.toSet -- got.toSet).take(3)}\n" +
            s"extra: ${(got.toSet -- want.toSet).take(3)}")
      }
    }
  }
}
