package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Extensions.eventTs / shiftTsDays — the driver-data VINTAGE adaptation
  * behind every streaming gate: events.ts was TIMESTAMP(NANOS) parquet
  * (surfacing as LongType nanos under nanosAsLong=true) through round 6
  * and micros TIMESTAMP_NTZ from round 7. All three physical shapes must
  * normalize to the same (event-time TIMESTAMP, epoch-micros BIGINT)
  * pair, and sentinel shifting must preserve the source shape.
  */
class EventTsVintageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("event-ts-vintage-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val micros = 1700000000123456L // a fixed instant, micro precision

  test("all three ts vintages normalize to the same instant") {
    val s = spark; import s.implicits._
    val asNanos = Seq(micros * 1000L).toDF("ts") // LongType nanos vintage
    val asNtz = s.sql(s"SELECT CAST(timestamp_micros(${micros}L) AS TIMESTAMP_NTZ) AS ts")
    val asTs = Seq(new java.sql.Timestamp(0)).toDF("ts")
      .select(timestamp_micros(lit(micros)).as("ts")) // already-normalized vintage
    for ((df, label) <- Seq((asNanos, "nanos-long"), (asNtz, "ntz"), (asTs, "timestamp"))) {
      val (ets, tus) = Extensions.eventTs(df.schema)
      val row = df.select(unix_micros(ets).as("e"), tus.as("u")).collect()(0)
      assert(row.getLong(0) == micros, s"$label event-time column")
      assert(row.getLong(1) == micros, s"$label epoch-micros column")
    }
  }

  test("shiftTsDays preserves each vintage's physical type") {
    val s = spark; import s.implicits._
    val asNanos = Seq(micros * 1000L).toDF("ts")
    val shiftedNanos = asNanos.select(Extensions.shiftTsDays(asNanos.schema, 30).as("ts"))
    assert(shiftedNanos.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(shiftedNanos.collect()(0).getLong(0) ==
      micros * 1000L + 30L * 86400L * 1000000000L)

    val asNtz = s.sql(s"SELECT CAST(timestamp_micros(${micros}L) AS TIMESTAMP_NTZ) AS ts")
    val shiftedNtz = asNtz.select(Extensions.shiftTsDays(asNtz.schema, 30).as("ts"))
    assert(shiftedNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = shiftedNtz.select(
      unix_micros(col("ts").cast("timestamp"))).collect()(0).getLong(0)
    assert(got == micros + 30L * 86400L * 1000000L)
  }
}
