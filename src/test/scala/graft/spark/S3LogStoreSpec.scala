package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** [[GraftLogStore]] with MODERN OBJECT-STORE semantics (S3 after the
  * 2020 strong-consistency change, with 2024 conditional writes) — the
  * cloud deployment shape the protocol documents, faked over the local
  * filesystem so the contention/lifecycle soaks can actually exercise
  * its failure windows in this sandbox:
  *
  *   - NO atomic rename. [[publish]] is a full-object copy (PUT) of the
  *     staged bytes followed by a delete of the stage — a crash between
  *     the two leaves the stage behind (vacuumOrphans food), but the
  *     target appears ALL-OR-NOTHING (an object PUT is atomic), never
  *     torn.
  *   - PUT-IF-NONE-MATCH decided at CLOSE, not at open. [[createAtomic]]
  *     buffers the whole entry and runs the conditional PUT when the
  *     stream closes — so unlike POSIX O_EXCL, (a) two racing writers
  *     both think they hold the slot until the loser's close throws, and
  *     (b) readers NEVER observe a zero-byte/partial claimed entry (the
  *     "unwritten-entry window" disappears; the late-loss window appears
  *     in its place).
  *   - Listing / read-after-write are strongly consistent (modern S3),
  *     so no lag is injected on the read side.
  *
  * The local emulation of "atomic PUT" is a hidden unique stage +
  * ATOMIC_MOVE with REPLACE_EXISTING — internal mechanics; what the
  * protocol code observes is exactly the semantics above. A JVM-global
  * lock serializes same-JVM conditional PUTs (S3 serializes them
  * server-side).
  */
class S3SemanticsLogStore extends GraftLogStore {
  import S3SemanticsLogStore._

  override def createAtomic(fs: FileSystem, path: Path): java.io.OutputStream =
    new java.io.ByteArrayOutputStream() {
      private var done = false
      override def close(): Unit = if (!done) {
        done = true
        super.close()
        // the conditional PUT happens HERE: S3 completes (and can reject)
        // the object only when the upload finishes
        putObject(fs, path, toByteArray, ifNoneMatch = true)
        casPuts.incrementAndGet()
      }
    }

  override def publish(fs: FileSystem, tmp: Path, target: Path,
      overwrite: Boolean): Unit = {
    // no rename on an object store: copy the staged object as one
    // all-or-nothing PUT, then delete the stage
    val bytes = {
      val in = fs.open(tmp)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    }
    putObject(fs, target, bytes, ifNoneMatch = !overwrite)
    copyPublishes.incrementAndGet()
    if (dropStageDeleteOnce.getAndSet(false)) () // injected crash window:
      // the PUT landed, the stage delete never ran — the caller must
      // treat the lingering stage as an orphan, never as table state
    else fs.delete(tmp, false)
  }
}

object S3SemanticsLogStore {
  private val lock = new Object
  val casPuts = new java.util.concurrent.atomic.AtomicLong(0)
  val casLosses = new java.util.concurrent.atomic.AtomicLong(0)
  val copyPublishes = new java.util.concurrent.atomic.AtomicLong(0)
  val dropStageDeleteOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def putObject(fs: FileSystem, path: Path, bytes: Array[Byte],
      ifNoneMatch: Boolean): Unit = lock.synchronized {
    val target = Paths.get(path.toUri.getPath)
    if (ifNoneMatch && fs.exists(path)) {
      casLosses.incrementAndGet()
      throw new java.io.IOException(
        s"PreconditionFailed: if-none-match, object already exists: $path")
    }
    Option(target.getParent).foreach(Files.createDirectories(_))
    val stage = target.resolveSibling(
      s".s3put-${java.util.UUID.randomUUID().toString.take(8)}-${target.getFileName}")
    Files.write(stage, bytes)
    Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Direct unit pins of the fake's semantics (the soaks below are the
  * real payload — they rerun the full contention and COW-lifecycle
  * suites through it).
  */
class S3LogStoreSpec extends AnyFunSuite {
  private val conf = new org.apache.hadoop.conf.Configuration()
  private val store = new S3SemanticsLogStore
  private val dir = Files.createTempDirectory("graft-s3fake")

  private def fs = new Path(dir.toString).getFileSystem(conf)

  test("conditional PUT is decided at close: both writers stream, one loses") {
    val p = new Path(dir.toString, "entry-1")
    val a = store.createAtomic(fs, p)
    val b = store.createAtomic(fs, p) // S3: both uploads are in flight
    a.write("winner".getBytes("UTF-8"))
    b.write("loser".getBytes("UTF-8"))
    a.close() // first completed upload wins
    val e = intercept[java.io.IOException] { b.close() }
    assert(e.getMessage.contains("PreconditionFailed"))
    val content = new String(Files.readAllBytes(
      Paths.get(p.toUri.getPath)), "UTF-8")
    assert(content == "winner", "the losing upload must not clobber the winner")
  }

  test("no partial entry is ever visible before close") {
    val p = new Path(dir.toString, "entry-2")
    val out = store.createAtomic(fs, p)
    out.write("half".getBytes("UTF-8"))
    assert(!fs.exists(p), "S3 shows nothing until the PUT completes")
    out.close()
    assert(fs.exists(p))
  }

  test("publish copies all-or-nothing and leaves the stage on a crashed delete") {
    val tmp = new Path(dir.toString, "stage-1")
    Files.write(Paths.get(tmp.toUri.getPath), "payload".getBytes("UTF-8"))
    val target = new Path(dir.toString, "final-1")
    S3SemanticsLogStore.dropStageDeleteOnce.set(true)
    store.publish(fs, tmp, target, overwrite = false)
    assert(fs.exists(target))
    assert(fs.exists(tmp), "injected crash window: the stage lingers as an orphan")
    // publishing the SAME unique name again must lose the CAS
    val e = intercept[java.io.IOException] {
      store.publish(fs, tmp, target, overwrite = false)
    }
    assert(e.getMessage.contains("PreconditionFailed"))
    // overwrite publishes (checkpoints/manifests) replace atomically
    val tmp2 = new Path(dir.toString, "stage-2")
    Files.write(Paths.get(tmp2.toUri.getPath), "v2".getBytes("UTF-8"))
    store.publish(fs, tmp2, target, overwrite = true)
    assert(new String(Files.readAllBytes(
      Paths.get(target.toUri.getPath)), "UTF-8") == "v2")
    assert(!fs.exists(tmp2), "stage deleted after a clean publish")
  }
}

/** The full many-writer contention soak rerun through the S3-semantics
  * store: version allocation now serializes on a close-time conditional
  * PUT (late losses, no unwritten-entry window) and every artifact
  * publish is copy+delete. The serializable-history postconditions are
  * inherited unchanged — divergence here means the protocol leans on a
  * POSIX-only property.
  */
class S3CommitLogContentionSpec extends CommitLogContentionSpec {
  override protected def logStoreImpl: Option[String] =
    Some(classOf[S3SemanticsLogStore].getName)
}

/** The COW lifecycle differential fuzz rerun through the S3-semantics
  * store (same inherited model checks).
  */
class S3CowFuzzSpec extends CowFuzzSpec {
  override protected def logStoreImpl: Option[String] =
    Some(classOf[S3SemanticsLogStore].getName)
}
