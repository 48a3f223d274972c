package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files
import scala.util.Random

/** Top-level row shape (Encoder derivation needs a stable outer scope). */
case class CowFuzzRow(id: Long, grp: Long, v: Double)

/** Differential fuzz of the COW table lifecycle: random sequences of
  * append / deleteWhere / updateWhere / expireRetired / vacuum against an
  * in-memory model of the table. After EVERY op the raw read must equal
  * the model exactly; pinned reads of retained snapshots must equal the
  * model's history; the protocol invariants (vacuum never shrinks the
  * readable set, expire never touches the live set) must hold at any
  * interleaving — the same deterministic-seed discipline as the source
  * fuzzers (JsonSourceFuzzSpec et al).
  */
class CowFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-cow-fuzz")
  private val schema = "id BIGINT, grp BIGINT, v DOUBLE"

  /** Subclasses rerun the whole fuzz through an alternate [[GraftLogStore]]
    * (e.g. the S3-semantics fake) by overriding this with its class name.
    */
  protected def logStoreImpl: Option[String] = None

  /** Subclasses route all table paths through a custom filesystem scheme
    * (e.g. the lag-listing fake) by overriding this.
    */
  protected def fsScheme: Option[String] = None
  protected def extraHadoopConf: Map[String, String] = Map.empty
  protected final def tablePath(p: java.nio.file.Path): String =
    fsScheme.map(sch => s"$sch://$p").getOrElse(p.toString)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("cow-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    logStoreImpl.foreach(c =>
      spark.sparkContext.hadoopConfiguration.set(GraftLogStore.ImplKey, c))
    extraHadoopConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      if (logStoreImpl.isDefined)
        spark.sparkContext.hadoopConfiguration.unset(GraftLogStore.ImplKey)
      spark.stop()
    }
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  

  private def toDf(rows: Seq[CowFuzzRow]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "grp", "v")
  }

  private def readAll(dir: String): Set[CowFuzzRow] =
    spark.read.format("graft-json").schema(schema).load(dir)
      .collect().map(r => CowFuzzRow(r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("random append/delete/update/expire/vacuum sequences match the model") {
    for (seed <- 1 to 4 * SoakX.x) {
      val rnd = new Random(seed)
      val dir = tablePath(root.resolve(s"t$seed"))
      var nextId = 0L
      def freshRows(n: Int): Seq[CowFuzzRow] = {
        val out = (0 until n).map { i =>
          CowFuzzRow(nextId + i, rnd.nextInt(5).toLong, (rnd.nextInt(1000) - 500) / 4.0)
        }
        nextId += n
        out
      }
      // half the seeds run HIVE-PARTITIONED (grp=k/ layout) — the
      // review-found relativize bug lived exactly in that blind spot
      val partitioned = seed % 2 == 0
      val cowSchema = if (partitioned) "id BIGINT, v DOUBLE" else schema
      // a third of the seeds record TINY stats blocks, so the COW
      // lifecycle's own reads (phase-1 predicate pushdown, restrictFiles
      // rewrites, pinned snapshots) run over block-pruned aligned ranges
      val blockBytes = Seq("0", "256", "1024")(seed % 3)
      def writeOut(df: org.apache.spark.sql.DataFrame, mode: String): Unit = {
        val w = df.write.format("graft-json").mode(mode)
          .option("blockbytes", blockBytes)
        (if (partitioned) w.partitionBy("grp") else w).save(dir)
      }
      // model state + per-version history of RETAINED snapshots
      var model = freshRows(10 + rnd.nextInt(20))
      writeOut(toDf(model).coalesce(1 + rnd.nextInt(3)), "overwrite")
      var history = Vector(model.toSet) // history(v) = rows as of version v
      var earliestReadable = 0L  // bumped by expireLogHistory
      var historyValid = true    // false once a non-retained rewrite/expire ran
      var retiredPresent = false // retain=true rewrites leave retired files on
                                 // disk: raw listings see them (documented) —
                                 // the exact read is then the pinned-latest one

      def exactRead(): Set[CowFuzzRow] =
        if (!retiredPresent) readAll(dir)
        else {
          val fsRoot = new org.apache.hadoop.fs.Path(dir)
          val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val latest = GraftCommitLog.versions(fs, fsRoot).max
          spark.read.format("graft-json").schema(schema)
            .option("versionAsOf", latest.toString).load(dir)
            .collect().map(r => CowFuzzRow(r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        }

      val ops = 12
      for (op <- 1 to ops) {
        rnd.nextInt(13) match {
          case 0 => // append
            val add = freshRows(1 + rnd.nextInt(15))
            writeOut(toDf(add).coalesce(1 + rnd.nextInt(2)), "append")
            model = model ++ add
            history :+= model.toSet
          case 1 => // delete (sometimes retaining history)
            val cut = rnd.nextInt(5)
            val retain = rnd.nextBoolean()
            val pred = s"grp = $cut AND v > 0.0"
            val rewritten = TrainingData.deleteWhere(spark, dir, cowSchema, pred,
              retainHistory = retain)
            val before = model
            model = model.filterNot(r => r.grp == cut && r.v > 0.0)
            if (model.size != before.size) {
              history :+= model.toSet
              if (retain) retiredPresent = true else historyValid = false
            } else assert(rewritten.isEmpty, "no-op delete must not rewrite")
          case 2 => // update
            val cut = rnd.nextInt(5)
            val retain = rnd.nextBoolean()
            val touched = model.exists(r => r.grp == cut)
            TrainingData.updateWhere(spark, dir, cowSchema, s"grp = $cut",
              Map("v" -> "v + 1.0"), retainHistory = retain)
            if (touched) {
              model = model.map(r => if (r.grp == cut) r.copy(v = r.v + 1.0) else r)
              history :+= model.toSet
              if (retain) retiredPresent = true else historyValid = false
            }
          case 3 => // expire retired snapshots (invalidates old pins, not latest)
            val expired = TrainingData.expireRetired(spark, dir)
            if (expired.nonEmpty) historyValid = false
            retiredPresent = false
          case 4 => // vacuum never changes any readable state
            TrainingData.vacuumOrphans(spark, dir)
          case 5 => // in-place OPTIMIZE: rows identical, one new version
            val retain = rnd.nextBoolean()
            val rewritten = TrainingData.optimizeTable(spark, dir, cowSchema,
              targetFileBytes = 1L << 20,
              clusterBy = if (rnd.nextBoolean()) Seq("id") else Nil,
              retainHistory = retain)
            if (rewritten.nonEmpty) {
              history :+= model.toSet // same rows, new snapshot
              if (retain) retiredPresent = true else historyValid = false
            }
          case 6 => // checkpoint: derived state, transparent to every read
            TrainingData.checkpointLog(spark, dir)
          case 7 => // expire the log below the latest checkpoint (if any):
            // pinned reads below it must fail LOUDLY from now on
            val fsR = new org.apache.hadoop.fs.Path(dir)
            val fsE = fsR.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (GraftCommitLog.checkpointVersions(fsE, fsR).isEmpty)
              TrainingData.checkpointLog(spark, dir)
            TrainingData.expireLogHistory(spark, dir)
            earliestReadable = GraftCommitLog.versions(fsE, fsR).min
          case 8 => // merge-on-read delete, mixing the auto-materialize dial:
            // whatever mix of vectors and escalated rewrites lands, the
            // final state must equal the all-COW oracle (the model)
            val cut = rnd.nextInt(5)
            val ratio = Seq(1.0, 0.5, 0.2)(rnd.nextInt(3))
            val affected = TrainingData.deleteWhereDV(spark, dir, cowSchema,
              s"grp = $cut AND v < 0.0", dvMaxRatio = ratio, retainHistory = true)
            val before = model
            model = model.filterNot(r => r.grp == cut && r.v < 0.0)
            if (model.size != before.size) {
              history :+= model.toSet
              // escalated originals stay on disk (retainHistory): raw
              // listings may see them — exact reads pin from here on
              if (ratio < 1.0) retiredPresent = true
            } else assert(affected.isEmpty, "no-op DV delete must not commit")
          case 9 => // RESTORE to a random readable version: either ONE
            // atomic commit rolls the model back to its history at that
            // version, or (bytes physically reclaimed by a
            // retain=false rewrite) it refuses LOUDLY with nothing
            // committed — both outcomes verified
            val fsR = new org.apache.hadoop.fs.Path(dir)
            val fsE = fsR.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val latest = GraftCommitLog.versions(fsE, fsR).max
            val target = earliestReadable +
              rnd.nextInt((latest - earliestReadable + 1).toInt)
            try {
              val nv = TrainingData.restoreTable(spark, dir, target)
              if (nv >= 0) {
                assert(nv == latest + 1, s"restore must commit one version")
                model = history(target.toInt).toSeq
                history :+= model.toSet
                // restore retires files without deleting bytes: raw
                // listings may see them — exact reads pin from here on
                retiredPresent = true
              } else assert(model.toSet == history(target.toInt),
                s"no-op restore but model differs from v$target")
            } catch {
              case e: IllegalArgumentException
                  if e.getMessage.contains("physically gone") =>
                assert(GraftCommitLog.versions(fsE, fsR).max == latest,
                  "a refused restore must commit nothing")
            }
          case 10 => // CLONE at the latest version: the fork reads the
            // pinned image, then DIVERGES independently — mutations on
            // the clone never leak into the source (and vice versa)
            val cdir = tablePath(root.resolve(s"t$seed-clone$op"))
            TrainingData.cloneTable(spark, dir, cdir)
            assert(readAll(cdir) === model.toSet, s"seed=$seed op=$op clone diverged")
            val extra = freshRows(3)
            val cw = toDf(extra).coalesce(1).write.format("graft-json")
              .mode("append")
            (if (partitioned) cw.partitionBy("grp") else cw).save(cdir)
            assert(readAll(cdir) === (model ++ extra).toSet,
              s"seed=$seed op=$op clone append diverged")
            // the SOURCE is untouched by the clone's own history
            assert(exactRead() === model.toSet,
              s"seed=$seed op=$op source leaked clone rows")
          case 11 => // VACUUM RETAIN: a huge horizon reclaims NOTHING
            // (retirees are seconds old); horizon 0 reclaims every retiree
            // like expireRetired — either way the READABLE latest state
            // never changes
            // the API pair the SQL verb routes to (the verb itself is
            // SqlMaintenanceSpec's; this session has no injected parser)
            val h = if (rnd.nextBoolean()) 1000000L else 0L
            val ms = h * 3600000L
            val out = TrainingData.expireRetired(spark, dir, retainMillis = ms) ++
              TrainingData.vacuumOrphans(spark, dir, retainMillis = ms)
            val reclaimedData = out.filterNot(_.startsWith(".graft-dv/"))
            if (h == 1000000L) assert(reclaimedData.isEmpty,
              s"seed=$seed op=$op: a huge retention horizon reclaimed $reclaimedData")
            else if (reclaimedData.nonEmpty) {
              historyValid = false
              retiredPresent = false
            }
          case 12 => // table_changes: a span with no rewrite-retired files
            // yields the EXACT set-diff of the model history; a span
            // crossing a rewrite/restore refuses LOUDLY (a row feed
            // cannot express moved rows) — both lanes verified
            val fsR = new org.apache.hadoop.fs.Path(dir)
            val fsE = fsR.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val latest = GraftCommitLog.versions(fsE, fsR).max
            assert(latest.toInt == history.size - 1,
              s"seed=$seed op=$op: version/history misalignment")
            val from = earliestReadable +
              rnd.nextInt((latest - earliestReadable + 1).toInt)
            try {
              val feed = TrainingData.changeFeed(spark, dir, cowSchema,
                from, untilVersion = latest)
              val got = feed.collect().map(r => (CowFuzzRow(
                r.getAs[Long]("id"), r.getAs[Long]("grp"), r.getAs[Double]("v")),
                r.getAs[String]("_change_type"))).toSet
              val want =
                (history(from.toInt) -- model.toSet).map((_, "delete")) ++
                  (model.toSet -- history(from.toInt)).map((_, "insert"))
              assert(got === want, s"seed=$seed op=$op feed($from..$latest) diverged")
            } catch {
              case e: IllegalStateException =>
                assert(e.getMessage.contains("retired") ||
                  e.getMessage.contains("RESTORE") ||
                  e.getMessage.contains("restore"),
                  s"seed=$seed op=$op unexpected feed refusal: ${e.getMessage}")
            }
        }
        assert(exactRead() === model.toSet, s"seed=$seed op=$op read diverged")
      }
      // retained histories: every surviving version's pinned read equals
      // the model's history at that version; expired versions fail loudly
      if (historyValid) {
        history.zipWithIndex.foreach { case (want, v) =>
          def pin() = spark.read.format("graft-json").schema(schema)
            .option("versionAsOf", v.toString).load(dir)
            .collect().map(r => CowFuzzRow(r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
          if (v >= earliestReadable)
            assert(pin() === want, s"seed=$seed versionAsOf=$v diverged")
          else {
            val e = intercept[Exception](pin())
            assert(e.getMessage.contains("expired"),
              s"seed=$seed versionAsOf=$v (< earliest $earliestReadable): ${e.getMessage}")
          }
        }
      }
      // latest pinned read always equals the raw read
      val fsRoot = new org.apache.hadoop.fs.Path(dir)
      val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val latest = GraftCommitLog.versions(fs, fsRoot).max
      val pinned = spark.read.format("graft-json").schema(schema)
        .option("versionAsOf", latest.toString).load(dir)
        .collect().map(r => CowFuzzRow(r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pinned === model.toSet, s"seed=$seed latest pin diverged")
    }
  }
}
