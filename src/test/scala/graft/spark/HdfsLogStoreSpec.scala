package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Local filesystem enforcing the HDFS RENAME CONTRACT: rename without
  * overwrite REFUSES an existing destination (atomically — serialized
  * here by a JVM lock; the NameNode serializes it server-side).
  * RawLocalFileSystem's own rename goes through POSIX rename(2), which
  * silently REPLACES the target — exactly the divergence that makes the
  * `hdfs` store unsafe on file:// and safe on HDFS; this wrapper gives
  * the tests the HDFS behavior. Registered under the `hdfsish` scheme.
  */
class HdfsContractFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "hdfsish"
  override def getUri: java.net.URI = java.net.URI.create("hdfsish:///")
  override def rename(src: Path, dst: Path): Boolean =
    HdfsContractFileSystem.lock.synchronized {
      if (exists(dst)) false
      else super.rename(src, dst)
    }
}
object HdfsContractFileSystem {
  private[spark] val lock = new Object
}

/** The `graft.logstore.impl=hdfs` store ([[GraftLogStore.HdfsRenameClaim]]):
  * entries become visible ATOMICALLY (rename-claim at close — no
  * claimed-but-unwritten window, no observable torn entry), a lost race
  * surfaces as the close-time IOException the commit loop's retry path
  * expects, and the staged temp never lingers. The contention and COW
  * soaks rerun through it below (HdfsCommitLogContentionSpec /
  * HdfsCowFuzzSpec).
  */
class HdfsLogStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-hdfsish")
  private val schema = "id BIGINT, v STRING"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("hdfs-logstore-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.hdfsish.impl",
        classOf[HdfsContractFileSystem].getName)
      .config("spark.hadoop." + GraftLogStore.ImplKey, "hdfs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def conf = spark.sparkContext.hadoopConfiguration
  private def dir(name: String): String = s"hdfsish://${root.resolve(name)}"
  private def fsOf(d: String): FileSystem = new Path(d).getFileSystem(conf)

  test("the alias resolves to the rename-claim store; class names still work") {
    val c = new org.apache.hadoop.conf.Configuration()
    c.set(GraftLogStore.ImplKey, "hdfs")
    assert(GraftLogStore.forConf(c) eq GraftLogStore.HdfsRenameClaim)
    c.set(GraftLogStore.ImplKey, "rename")
    assert(GraftLogStore.forConf(c) eq GraftLogStore.HadoopRename)
    c.unset(GraftLogStore.ImplKey)
    assert(GraftLogStore.forConf(c) eq GraftLogStore.HadoopRename)
  }

  test("an entry is NEVER observable half-written: invisible until close, whole after") {
    val d = dir("atomvis")
    val fs = fsOf(d)
    fs.mkdirs(new Path(d))
    val slot = new Path(d, "00000000000000000000")
    val out = GraftLogStore.HdfsRenameClaim.createAtomic(fs, slot)
    out.write("graft-commit v7\nt 1\n".getBytes("UTF-8"))
    out.flush()
    // mid-write: the slot does not exist AT ALL (vs the default store,
    // where a claimed entry is visible empty/partial until the body lands)
    assert(!fs.exists(slot), "slot visible before close — the claim leaked")
    out.write("f a.jsonl\n".getBytes("UTF-8"))
    out.close()
    assert(fs.exists(slot))
    val in = fs.open(slot)
    val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(body == "graft-commit v7\nt 1\nf a.jsonl\n")
    // no temp debris
    assert(!fs.listStatus(new Path(d)).exists(_.getPath.getName.endsWith(".claim")))
  }

  test("losing the race at CLOSE throws, keeps the winner intact, leaves no debris") {
    val d = dir("closerace")
    val fs = fsOf(d)
    fs.mkdirs(new Path(d))
    val slot = new Path(d, "00000000000000000001")
    val loser = GraftLogStore.HdfsRenameClaim.createAtomic(fs, slot)
    loser.write("loser body\n".getBytes("UTF-8"))
    // the competitor lands the slot first (its close wins the rename)
    val winner = GraftLogStore.HdfsRenameClaim.createAtomic(fs, slot)
    winner.write("winner body\n".getBytes("UTF-8"))
    winner.close()
    val e = intercept[java.io.IOException] { loser.close() }
    assert(e.getMessage.contains("lost the claim race"))
    val in = fs.open(slot)
    val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(body == "winner body\n")
    assert(!fs.listStatus(new Path(d)).exists(_.getPath.getName.endsWith(".claim")))
  }

  test("early loss detection: claiming an existing slot refuses at create") {
    val d = dir("earlyloss")
    val fs = fsOf(d)
    fs.mkdirs(new Path(d))
    val slot = new Path(d, "00000000000000000002")
    val out = GraftLogStore.HdfsRenameClaim.createAtomic(fs, slot)
    out.write("x".getBytes("UTF-8")); out.close()
    intercept[java.io.IOException] {
      GraftLogStore.HdfsRenameClaim.createAtomic(fs, slot)
    }
  }

  test("the full table lifecycle commits through the hdfs store") {
    val d = dir("lifecycle")
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(2).write.format("graft-json").mode("overwrite").save(d) // v0
    graft.api.TrainingData.deleteWhereDV(spark, d, schema, "id % 5 = 0")   // v1
    graft.api.TrainingData.updateWhere(spark, d, schema, "id = 1",
      Map("v" -> "'one'"), retainHistory = true, changeDataFeed = true)    // v2
    val fs = fsOf(d)
    val vs = GraftCommitLog.versions(fs, new Path(d))
    assert(vs == Seq(0L, 1L, 2L))
    val got = spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (0L until 40L).filter(_ % 5 != 0)
      .map(i => (i, if (i == 1) "one" else s"r$i")).toSet
    assert(got == want)
    // CDF flows through the hdfs store's commits too
    val feed = graft.api.TrainingData.changeFeed(spark, d, schema, 0L)
    assert(feed.count() > 0)
  }
}

/** The full many-writer contention soak rerun through the `hdfs` store:
  * version allocation serializes on close-time rename-no-overwrite (late
  * losses, NO claimed-but-unwritten window) against a filesystem
  * enforcing the HDFS rename contract. The serializable-history
  * postconditions are inherited unchanged.
  */
class HdfsCommitLogContentionSpec extends CommitLogContentionSpec {
  override protected def logStoreImpl: Option[String] = Some("hdfs")
  override protected def fsScheme: Option[String] = Some("hdfsish")
  override protected def extraHadoopConf: Map[String, String] =
    Map("fs.hdfsish.impl" -> classOf[HdfsContractFileSystem].getName)
}

/** The COW lifecycle differential fuzz rerun through the `hdfs` store
  * (same inherited model checks).
  */
class HdfsCowFuzzSpec extends CowFuzzSpec {
  override protected def logStoreImpl: Option[String] = Some("hdfs")
  override protected def fsScheme: Option[String] = Some("hdfsish")
  override protected def extraHadoopConf: Map[String, String] =
    Map("fs.hdfsish.impl" -> classOf[HdfsContractFileSystem].getName)
}
