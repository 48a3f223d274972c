package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition of ngramJaccardPairs (optimization-round
  * measurement tool, not a driver surface): times each sub-pipeline of
  * the q32 shape through the noop sink so the dominant stage is measured,
  * not guessed. Usage: sbt "runMain graft.ProbeJaccard"
  */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-jaccard")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables(spark, sfDir, "documents")
    def sh0 = docs.select($"doc_id".as("__gid"),
      explode(graft.api.TrainingData.wordShingles($"text", 3)).as("sh"))
    def hot = sh0.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" > 100).select($"sh")
    def sh = sh0.join(broadcast(hot), Seq("sh"), "left_anti")
    def sizes = sh.groupBy($"__gid").agg(count(lit(1)).as("n"))
    def pairs = sh.as("x").join(sh.as("y"), Seq("sh"))
      .filter($"x.__gid" < $"y.__gid")
      .groupBy($"x.__gid".as("doc_a"), $"y.__gid".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    def rawPairs = sh.as("x").join(sh.as("y"), Seq("sh"))
      .filter($"x.__gid" < $"y.__gid")
      .select($"x.__gid", $"y.__gid")
    def full = graft.api.TrainingData.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, minJaccardBp = 1500, maxDocFreq = 100)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-16s best ${ts.min}%7.3f s")
    }
    println("rawPairs rows = " + rawPairs.count())
    time("sh0")(sh0)
    time("hot")(hot)
    time("sh")(sh)
    time("sizes")(sizes)
    time("rawPairs")(rawPairs)
    time("pairs")(pairs)
    time("full")(full)

    // variants: (a) repartition the doc text before shingling (guide §2.5 —
    // single-row-group input pins the explode to one core), (b) materialize
    // the shingle set once (lazy localCheckpoint) so hot/self-join/sizes
    // stop re-evaluating it, (c) both
    def fullVariant(repart: Boolean, checkpoint: Boolean) = {
      val src = if (repart) docs.repartition(cpus.toInt) else docs
      val s0 = src.select($"doc_id".as("__gid"),
        explode(graft.api.TrainingData.wordShingles($"text", 3)).as("sh"))
      val h = s0.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" > 100).select($"sh")
      val s1 = s0.join(broadcast(h), Seq("sh"), "left_anti")
      val s = if (checkpoint) s1.localCheckpoint(false) else s1
      val sz = s.groupBy($"__gid").agg(count(lit(1)).as("n"))
      s.as("x").join(s.as("y"), Seq("sh"))
        .filter($"x.__gid" < $"y.__gid")
        .groupBy($"x.__gid".as("doc_a"), $"y.__gid".as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sz.select($"__gid".as("doc_a"), $"n".as("na")), "doc_a")
        .join(sz.select($"__gid".as("doc_b"), $"n".as("nb")), "doc_b")
        .select($"doc_a", $"doc_b",
          expr("(10000 * inter) DIV (na + nb - inter)").as("jaccard_bp"))
        .filter($"jaccard_bp" >= 1500)
    }
    time("full+repart")(fullVariant(repart = true, checkpoint = false))
    time("full+ckpt")(fullVariant(repart = false, checkpoint = true))
    time("full+both")(fullVariant(repart = true, checkpoint = true))
    spark.stop()
  }
}
