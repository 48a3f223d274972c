package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The TWO storage primitives the graft table protocol's correctness
  * rests on (docs/TABLE_FORMAT.md "Storage primitives") — extracted
  * behind a seam so object stores without atomic rename / put-if-absent
  * can plug a coordinated implementation (the Delta `LogStore` shape):
  *
  *   - [[createAtomic]] — PUT-IF-ABSENT: create `path`, failing with an
  *     `IOException` when it already exists. Commit-log version
  *     allocation serializes concurrent writers on exactly this
  *     primitive; an implementation that silently overwrites loses
  *     committed entries (the one unrecoverable failure).
  *   - [[publish]] — ATOMIC VISIBILITY: move a fully-written staged file
  *     to its final name such that readers see the whole file or no
  *     file. Data files, checkpoints, manifests, and deletion-vector
  *     artifacts all publish this way; a store where rename copies
  *     non-atomically can surface torn artifacts (DV reads fail loudly
  *     on them, stats sidecars degrade — but correctness-bearing
  *     surfaces should not rely on luck).
  *
  * The default [[GraftLogStore.HadoopRename]] maps both to the
  * filesystem's native operations — exactly right on local FS and HDFS,
  * NOT on S3-class stores (S3 rename is copy+delete; S3 create has no
  * if-absent). Deployments there set `graft.logstore.impl` (Hadoop conf,
  * so it reaches executors via the serialized configuration) to a class
  * name implementing this trait over a coordination service — the same
  * deployment contract as Delta's `spark.delta.logStore.class`.
  */
trait GraftLogStore {
  /** Create `path` exclusively (put-if-absent). MUST throw
    * `java.io.IOException` when the path already exists — callers treat
    * that as "lost the race" and retry at the next version.
    */
  def createAtomic(fs: FileSystem, path: Path): java.io.OutputStream

  /** Make the fully-written `tmp` visible at `target` all-or-nothing.
    * `overwrite = true` replaces an existing target (checkpoints,
    * manifests — deterministic or merged content, so replacement under
    * races is safe); `overwrite = false` expects `target` absent
    * (uniquely-named data files and DV artifacts). Throws on failure —
    * callers decide best-effort vs abort.
    */
  def publish(fs: FileSystem, tmp: Path, target: Path,
      overwrite: Boolean): Unit
}

object GraftLogStore {
  /** Hadoop-conf key naming the [[GraftLogStore]] implementation class
    * (no-arg constructor); unset = [[HadoopRename]].
    */
  val ImplKey = "graft.logstore.impl"

  /** Native-rename implementation — correct where `create(path, false)`
    * is exclusive and `rename` is atomic (local FS, HDFS).
    */
  object HadoopRename extends GraftLogStore {
    override def createAtomic(fs: FileSystem, path: Path): java.io.OutputStream =
      if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
        // Hadoop's local filesystems implement create(path, false) as a
        // NON-ATOMIC exists()+create — two racing version claims can both
        // succeed, the later truncating the earlier's committed entry
        // (silent loss of a committed write, the one unrecoverable
        // failure; found by CommitLogContentionSpec). POSIX O_EXCL via
        // File.createNewFile IS atomic: claim the slot there, then write
        // via java.io into the claimed file (no .crc sidecar — entry
        // integrity comes from the v7 CRC32 footer, not ChecksumFileSystem).
        val f = new java.io.File(path.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        if (!f.createNewFile())
          throw new java.io.IOException(
            s"already exists (lost the claim race): $path")
        // write through java.io on the file the claim just created: one
        // failure domain (no second filesystem-layer create that could
        // fail and orphan the claim). Entries get no .crc sidecar this
        // way — ChecksumFileSystem reads crc-less files fine.
        try new java.io.FileOutputStream(f)
        catch { case e: Throwable =>
          // pathological (permissions flipped between the two syscalls):
          // release the claim rather than leave a 0-byte entry
          try f.delete() catch { case _: Throwable => () }
          throw e
        }
      } else fs.create(path, false)
    override def publish(fs: FileSystem, tmp: Path, target: Path,
        overwrite: Boolean): Unit = {
      if (overwrite) fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"could not publish $tmp -> $target")
    }
  }

  /** HDFS-contract implementation (`graft.logstore.impl=hdfs`) — the
    * 100-TB-cluster deployment story: the version CLAIM happens at CLOSE
    * via rename-WITHOUT-overwrite, so a commit-log entry is NEVER
    * observable half-written — readers see the whole entry or no entry,
    * and the torn-entry grace machinery ([[GraftCommitLog]]'s
    * IncompleteCommitException retries) never has to engage.
    * [[createAtomic]] streams the body into a dot-prefixed unique temp
    * sibling; close() renames it onto the version slot — HDFS's rename
    * is atomic at the NameNode and REFUSES an existing destination, so a
    * lost race surfaces as the close-time `IOException` the commit
    * loop's onLostRace path already expects (the "at CLOSE on
    * conditional-put stores" leg). [[publish]] is the same staged
    * create-then-rename as the default.
    *
    * Correctness envelope: any HCFS whose rename-without-overwrite is
    * atomic and refuses an existing destination — HDFS, viewfs, HA
    * proxies over them. NOT `file://` (RawLocalFileSystem renames
    * through POSIX rename(2), which silently REPLACES an existing
    * target — local dev keeps the default store's O_EXCL claim) and NOT
    * S3-class stores (rename is copy+delete; plug a conditional-put
    * implementation there). HdfsLogStoreSpec exercises the mechanics
    * locally through a contract-enforcing test filesystem.
    */
  object HdfsRenameClaim extends GraftLogStore {
    override def createAtomic(fs: FileSystem, path: Path): java.io.OutputStream = {
      // cheap early loss detection — the RENAME still decides the race
      if (fs.exists(path))
        throw new java.io.IOException(
          s"already exists (lost the claim race): $path")
      val tmp = new Path(path.getParent,
        s".${path.getName}.${java.util.UUID.randomUUID().toString}.claim")
      val out = fs.create(tmp, false)
      new java.io.FilterOutputStream(out) {
        private[this] var done = false
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          out.write(b, off, len)
        override def close(): Unit = if (!done) {
          done = true
          super.close() // flush + close the fully-written temp
          val won =
            try fs.rename(tmp, path)
            catch { case _: java.io.IOException => false }
          if (!won) {
            try fs.delete(tmp, false) catch { case _: Exception => () }
            throw new java.io.IOException(
              s"already exists (lost the claim race at close): $path")
          }
        }
      }
    }
    override def publish(fs: FileSystem, tmp: Path, target: Path,
        overwrite: Boolean): Unit =
      HadoopRename.publish(fs, tmp, target, overwrite)
  }

  // one instance per implementation class per JVM (executors resolve
  // through the serialized Hadoop conf)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, GraftLogStore]()

  def forConf(conf: Configuration): GraftLogStore = {
    val cls = conf.get(ImplKey)
    if (cls == null || cls.isEmpty) HadoopRename
    // short deployment aliases (the class-name form stays for custom impls)
    else if (cls == "hdfs") HdfsRenameClaim
    else if (cls == "default" || cls == "rename") HadoopRename
    else cache.computeIfAbsent(cls, c =>
      Class.forName(c).getDeclaredConstructor().newInstance()
        .asInstanceOf[GraftLogStore])
  }
}
