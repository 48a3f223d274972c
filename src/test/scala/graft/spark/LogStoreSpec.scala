package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Fault-injecting [[GraftLogStore]] — resolved by class name through the
  * seam (`graft.logstore.impl`), driven by static knobs. Simulates the
  * storage failures an object-store deployment actually hits: lost
  * put-if-absent races (optionally with a REAL competing entry landing
  * first), post-create write failures (truncated entries), and
  * non-atomic publish failures.
  */
class FaultInjectingLogStore extends GraftLogStore {
  import FaultInjectingLogStore._

  override def createAtomic(fs: FileSystem, path: Path): java.io.OutputStream = {
    val competing = competingBody.getAndSet(null)
    if (competing != null) {
      // a competitor wins the slot for real, then WE lose the race
      val out = GraftLogStore.HadoopRename.createAtomic(fs, path)
      try out.write(competing.getBytes("UTF-8")) finally out.close()
      throw new java.io.IOException(s"injected: lost the race for $path")
    }
    if (failCreates.get() > 0) {
      failCreates.decrementAndGet()
      throw new java.io.IOException(s"injected: create failed for $path")
    }
    val out = GraftLogStore.HadoopRename.createAtomic(fs, path)
    if (failWriteAfterCreate.getAndSet(false))
      new java.io.OutputStream {
        override def write(b: Int): Unit =
          throw new java.io.IOException("injected: write failed after create")
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          throw new java.io.IOException("injected: write failed after create")
        override def close(): Unit = out.close()
      }
    else out
  }

  override def publish(fs: FileSystem, tmp: Path, target: Path,
      overwrite: Boolean): Unit = {
    if (failPublishes.get() > 0) {
      failPublishes.decrementAndGet()
      throw new java.io.IOException(s"injected: publish failed for $target")
    }
    GraftLogStore.HadoopRename.publish(fs, tmp, target, overwrite)
  }
}

object FaultInjectingLogStore {
  val failCreates = new java.util.concurrent.atomic.AtomicInteger(0)
  val failWriteAfterCreate = new java.util.concurrent.atomic.AtomicBoolean(false)
  val failPublishes = new java.util.concurrent.atomic.AtomicInteger(0)
  val competingBody = new java.util.concurrent.atomic.AtomicReference[String](null)
  def reset(): Unit = {
    failCreates.set(0); failWriteAfterCreate.set(false)
    failPublishes.set(0); competingBody.set(null)
  }
}

/** The LogStore seam: every correctness-bearing publish routes through
  * [[GraftLogStore]], and the commit protocol's OCC retry/abort paths
  * hold under injected storage faults.
  */
class LogStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-logstore")
  private val schema = "id BIGINT, v STRING"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("logstore-spec")
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

  private def conf = spark.sparkContext.hadoopConfiguration
  private def dir(name: String): String = root.resolve(name).toString

  private def withFaultStore[A](body: => A): A = {
    FaultInjectingLogStore.reset()
    conf.set(GraftLogStore.ImplKey, classOf[FaultInjectingLogStore].getName)
    try body
    finally {
      conf.unset(GraftLogStore.ImplKey)
      FaultInjectingLogStore.reset()
    }
  }

  /** A two-file logged table; returns its root-relative data files. */
  private def mkTable(d: String): Seq[String] = {
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(2).write.format("graft-json").mode("overwrite").save(d)
    val p = new Path(d)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted.toSeq
  }

  test("transient create failures retry and commit at the right version") {
    val d = dir("retry")
    val files = mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    withFaultStore {
      FaultInjectingLogStore.failCreates.set(2)
      val v = GraftCommitLog.appendEntry(conf, d, adds = Nil,
        removes = Seq(files.head), removesBase = 0L)
      assert(v === 1L)
    }
    assert(GraftCommitLog.liveFilesAsOf(fs, new Path(d), 1L) === files.tail.toSet)
  }

  test("losing a real race to a compatible competitor: delta re-validation passes") {
    val d = dir("race-ok")
    val files = mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    withFaultStore {
      // the competitor retires file(1); we retire file(0) — compatible
      FaultInjectingLogStore.competingBody.set(
        s"graft-commit v2\nr ${files(1)}\n")
      val v = GraftCommitLog.appendEntry(conf, d, adds = Nil,
        removes = Seq(files.head), removesBase = 0L)
      assert(v === 2L, "the loser must land AFTER the competitor")
    }
    assert(GraftCommitLog.liveFilesAsOf(fs, new Path(d), 2L) === Set.empty[String])
    assert(GraftCommitLog.liveFilesAsOf(fs, new Path(d), 1L) === Set(files.head))
  }

  test("losing a real race to a CONFLICTING competitor aborts loudly") {
    val d = dir("race-bad")
    val files = mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    withFaultStore {
      // the competitor retires the SAME file we want to retire
      FaultInjectingLogStore.competingBody.set(
        s"graft-commit v2\nr ${files.head}\n")
      val e = intercept[java.util.ConcurrentModificationException] {
        GraftCommitLog.appendEntry(conf, d, adds = Nil,
          removes = Seq(files.head), removesBase = 0L)
      }
      assert(e.getMessage.contains("concurrent"), e.getMessage)
    }
    // the competitor's entry is the only one that landed
    assert(GraftCommitLog.versions(fs, new Path(d)).max === 1L)
    assert(GraftCommitLog.liveFilesAsOf(fs, new Path(d), 1L) === files.tail.toSet)
  }

  test("a write failure AFTER create tombstones the slot: no torn entry, no version hole") {
    val d = dir("truncated")
    val files = mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    withFaultStore {
      FaultInjectingLogStore.failWriteAfterCreate.set(true)
      val e = intercept[java.io.IOException] {
        GraftCommitLog.appendEntry(conf, d, adds = Nil,
          removes = Seq(files.head), removesBase = 0L)
      }
      assert(e.getMessage.contains("injected"), e.getMessage)
    }
    // the claimed slot holds a valid NO-OP commit (deleting it instead
    // would leave a version hole whenever a competitor claimed past us)
    assert(GraftCommitLog.versions(fs, new Path(d)) === Seq(0L, 1L))
    assert(GraftCommitLog.entryActions(fs, new Path(d), 1L).isEmpty)
    assert(GraftCommitLog.entryOp(fs, new Path(d), 1L) === Some("aborted-commit"))
    // the fold is unchanged by the tombstone
    assert(GraftCommitLog.liveFilesAsOf(fs, new Path(d), 1L) === files.toSet)
    // and the next commit lands after it
    val v = GraftCommitLog.appendEntry(conf, d, adds = Nil,
      removes = Seq(files.head), removesBase = 0L)
    assert(v === 2L)
  }

  test("a failed artifact publish aborts the DV delete with nothing visible") {
    val d = dir("dvpub")
    mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    withFaultStore {
      FaultInjectingLogStore.failPublishes.set(64) // every publish fails
      val e = intercept[Exception] {
        graft.api.TrainingData.deleteWhereDV(spark, d, schema, "id < 5")
      }
      assert(e.getMessage != null)
    }
    // no version committed, no visible artifact, reads unchanged
    assert(GraftCommitLog.versions(fs, new Path(d)) === Seq(0L))
    val arts = {
      val dvDir = new Path(d, DeletionVectors.DirName)
      if (!fs.exists(dvDir)) Array.empty[String]
      else fs.listStatus(dvDir).map(_.getPath.getName).filter(_.endsWith(".dv"))
    }
    assert(arts.isEmpty, arts.mkString(", "))
    assert(spark.read.format("graft-json").schema(schema).load(d).count() === 40L)
  }

  test("a failed schema read during commit validation aborts instead of assuming no conflict") {
    val d = dir("schemaread")
    mkTable(d)
    val fs = new Path(d).getFileSystem(conf)
    val rootP = new Path(d)
    val recorded = GraftCommitLog.schemaAsOfStrict(fs, rootP, 0L).get
    // make the predecessor entry UNREADABLE at the IO level (open fails):
    // the commit's schema-conflict re-read must abort loudly — the lenient
    // old behavior (treat the racer's schema as absent and defer) would
    // land the entry while a genuinely conflicting schema sits unread
    val entry = new Path(GraftCommitLog.logDir(rootP), f"${0L}%020d")
    val bytes = {
      val in = fs.open(entry)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }
    fs.delete(entry, false)
    fs.mkdirs(entry) // fs.open(directory) throws IOException
    val e = intercept[java.io.IOException] {
      GraftCommitLog.appendEntry(conf, d, adds = Seq("late.json"),
        schema = recorded, schemaBase = recorded)
    }
    assert(e.getMessage.contains("recorded schema"), e.getMessage)
    // nothing landed
    assert(GraftCommitLog.versions(fs, rootP).max === 0L)
    // restore the entry: the same commit now lands cleanly
    fs.delete(entry, true)
    val out = fs.create(entry, false)
    try out.write(bytes) finally out.close()
    assert(GraftCommitLog.appendEntry(conf, d, adds = Seq("late.json"),
      schema = recorded, schemaBase = recorded) === 1L)
  }

  test("checkpoints and data files publish through the seam") {
    val d = dir("routed")
    withFaultStore {
      // every publish fails -> the data write itself must fail (proof the
      // task-commit rename routes through the store)
      FaultInjectingLogStore.failPublishes.set(1024)
      val s = spark
      import s.implicits._
      intercept[Exception] {
        (0L until 10L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
          .write.format("graft-json").mode("overwrite").save(dir("routed-w"))
      }
    }
    // checkpoint publish: route + fault
    mkTable(d)
    withFaultStore {
      FaultInjectingLogStore.failPublishes.set(1)
      intercept[Exception] { graft.api.TrainingData.checkpointLog(spark, d) }
    }
    // clean retry works
    graft.api.TrainingData.checkpointLog(spark, d)
  }

  // ----------------------------------------- v7 footer / tailing reads

  private def entryPath(d: String): Path =
    new Path(new Path(d), ".graft-log/00000000000000000000")

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def writeBytes(fs: FileSystem, p: Path, b: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(b) finally out.close()
  }

  test("v7 entries end with a footer; a torn prefix is INCOMPLETE, never a smaller commit") {
    val d = dir("footer")
    mkTable(d)
    val p = entryPath(d)
    val fs = p.getFileSystem(conf)
    val full = new String(readBytes(fs, p), "UTF-8")
    assert(full.startsWith("graft-commit v7\n"), full.takeWhile(_ != '\n'))
    val lines = full.split('\n')
    assert(lines.last.matches("e \\d+ [0-9a-f]{8}"), s"footer line: ${lines.last}")
    val rootP = new Path(d)
    // tear at a LINE BOUNDARY before the footer: without the footer this
    // would parse as a valid one-file commit and silently drop the rest
    try {
      writeBytes(fs, p, lines.init.mkString("", "\n", "\n").getBytes("UTF-8"))
      val e = intercept[IncompleteCommitException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      assert(e.getMessage.contains("footer"), e.getMessage)
      // torn mid-line: also incomplete (no footer yet), not malformed
      writeBytes(fs, p, full.substring(0, full.length - 10).getBytes("UTF-8"))
      intercept[IncompleteCommitException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      // EMPTY entry = the put-if-absent claim window
      writeBytes(fs, p, Array.emptyByteArray)
      val e2 = intercept[IncompleteCommitException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      assert(e2.getMessage.contains("in-flight"), e2.getMessage)
      // a footer declaring FEWER actions than the body carries is what a
      // read torn inside the footer digits looks like ('e 12' seen as
      // 'e 1'): incomplete, retriable within the grace
      val tornFooter = (lines.init :+ "e 1").mkString("", "\n", "\n")
      writeBytes(fs, p, tornFooter.getBytes("UTF-8"))
      val e3 = intercept[IncompleteCommitException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      assert(e3.getMessage.contains("torn mid-footer"), e3.getMessage)
      // declaring MORE than the body carries cannot come from a tear
      // (digits truncate to a smaller prefix): instant corruption
      val corrupted = (lines.init :+ "e 99 deadbeef").mkString("", "\n", "\n")
      writeBytes(fs, p, corrupted.getBytes("UTF-8"))
      val e4 = intercept[IllegalArgumentException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      assert(e4.getMessage.contains("corrupt"), e4.getMessage)
      // a FLIPPED crc with an intact count is in-line bit rot: corrupt
      val rotten = (lines.init :+ (lines.last.dropRight(8) + "00000000"))
        .mkString("", "\n", "\n")
      writeBytes(fs, p, rotten.getBytes("UTF-8"))
      val e5 = intercept[IllegalArgumentException] {
        GraftCommitLog.entryActions(fs, rootP, 0L)
      }
      assert(e5.getMessage.contains("checksum"), e5.getMessage)
    } finally writeBytes(fs, p, full.getBytes("UTF-8"))
    // restored: parses, and the footer is not an action
    assert(GraftCommitLog.entryActions(fs, rootP, 0L).forall(_.add))
  }

  test("entryActionsTailing rides out an in-flight body write; expires to the real error") {
    val d = dir("tailing")
    mkTable(d)
    val p = entryPath(d)
    val fs = p.getFileSystem(conf)
    val full = readBytes(fs, p)
    val rootP = new Path(d)
    try {
      // simulate the claim window: entry exists, body not yet written
      writeBytes(fs, p, Array.emptyByteArray)
      val t = new Thread(() => { Thread.sleep(300L); writeBytes(fs, p, full) })
      t.start()
      // a tailing reader polls through the window and gets the commit
      val acts = GraftCommitLog.entryActionsTailing(fs, rootP, 0L, graceMs = 10000L)
      t.join()
      assert(acts.nonEmpty && acts.forall(_.add))
      // grace expiry: an entry that STAYS incomplete rethrows the truth
      writeBytes(fs, p, Array.emptyByteArray)
      intercept[IncompleteCommitException] {
        GraftCommitLog.entryActionsTailing(fs, rootP, 0L, graceMs = 200L)
      }
    } finally writeBytes(fs, p, full)
  }
}
