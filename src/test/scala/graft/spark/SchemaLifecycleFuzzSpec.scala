package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files
import scala.util.Random

/** Randomized differential over the SCHEMA lifecycle: random sequences of
  * subset appends, mergeschema adds, widening appends, ALTER add/drop,
  * checkpointLog, and expireLogHistory against a driver-side model of the
  * recorded schema — after every op the schemaless read must serve
  * exactly the model's columns in the model's order with the model's
  * types, and the row count must match. Deterministic seeds.
  */
class SchemaLifecycleFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-schema-fuzz")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("schema-lifecycle-fuzz")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  // the model: ordered (name -> DataType); the pool of columns ops draw on
  private val pool: Vector[(String, DataType)] = Vector(
    "c_int" -> IntegerType, "c_long" -> LongType, "c_dbl" -> DoubleType,
    "c_str" -> StringType, "c_extra" -> DoubleType, "c_more" -> StringType)

  private def lit0(dt: DataType): org.apache.spark.sql.Column = dt match {
    case IntegerType => lit(7)
    case LongType => lit(7L)
    case DoubleType => lit(0.5)
    case StringType => lit("x")
    case other => lit(null).cast(other)
  }

  private def frame(cols: Seq[(String, DataType)], n: Int): DataFrame = {
    val base = spark.range(n.toLong).toDF("__i")
    cols.foldLeft(base) { case (df, (name, dt)) =>
      df.withColumn(name, lit0(dt))
    }.drop("__i")
  }

  test("random evolution sequences keep reads equal to the recorded-schema model") {
    (1 to 4 * SoakX.x).foreach { seed =>
      val rnd = new Random(0xA17E5 + seed)
      val d = root.resolve(s"t$seed").toString
      var model = Vector(pool(0), pool(3)) // (c_int, c_str)
      var rows = 5 + rnd.nextInt(5)
      frame(model, rows).write.format("graft-json").mode("overwrite").save(d)
      val hconf = spark.sparkContext.hadoopConfiguration

      (1 to 10).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => // subset append (keep a random nonempty prefix)
            val keep = model.take(1 + rnd.nextInt(model.length))
            val n = 1 + rnd.nextInt(4)
            frame(keep, n).write.format("graft-json").mode("append").save(d)
            rows += n
          case 1 if !model.exists(_._1 == "c_extra") => // mergeschema add
            val n = 1 + rnd.nextInt(3)
            frame(model :+ pool(4), n).write.format("graft-json")
              .mode("append").option("mergeschema", "true").save(d)
            model = model :+ pool(4)
            rows += n
          case 2 if model.exists(_._1 == "c_int") => // widening append
            val widened = model.map { case ("c_int", IntegerType) =>
              ("c_int", LongType: DataType); case x => x }
            val n = 1 + rnd.nextInt(3)
            frame(widened, n).write.format("graft-json").mode("append").save(d)
            model = widened
            rows += n
          case 3 if model.length > 1 => // ALTER drop a random column
            val victim = model(rnd.nextInt(model.length))._1
            graft.api.TrainingData.alterTableDropColumn(spark, d, victim)
            model = model.filterNot(_._1 == victim)
          case 4 if !model.exists(_._1 == "c_more") => // ALTER add
            graft.api.TrainingData.alterTableAddColumn(spark, d, "c_more", "STRING")
            model = model :+ pool(5)
          case 5 =>
            graft.api.TrainingData.checkpointLog(spark, d)
            if (rnd.nextBoolean())
              graft.api.TrainingData.expireLogHistory(spark, d)
          case _ => () // op not applicable this step
        }
        val back = spark.read.format("graft-json").load(d)
        assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
          model.toSeq,
          s"seed $seed step $step: schema diverged from the model")
        assert(back.count() === rows.toLong,
          s"seed $seed step $step: row count diverged")
        // the recorded schema is what the reads used (not a lucky sample)
        val fs = new Path(d).getFileSystem(hconf)
        val recorded = GraftCommitLog.schemaAsOf(fs, new Path(d),
          GraftCommitLog.versions(fs, new Path(d)).max).get
        assert(recorded.fieldNames.toSeq === model.map(_._1))
      }
    }
  }
}
