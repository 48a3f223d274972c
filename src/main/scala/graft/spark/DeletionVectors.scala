package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Deletion-vector artifacts — merge-on-read row-level DELETE for the
  * graft table protocol (docs/TABLE_FORMAT.md).
  *
  * A vector is the FULL set of deleted row ordinals for ONE data file
  * (the `withRowIndex` address space: a row's 0-based position within its
  * file), stored as a hidden artifact under `<table>/.graft-dv/` and
  * attached to the file by a `d <artifact> <path>` commit-log line
  * (`graft-commit v4`). A later vector for the same file REPLACES the
  * mapping — each artifact is cumulative (prior ∪ new), the Delta DV
  * shape — so snapshot resolution needs only the newest `d` per file and
  * time travel needs only the mapping as of the pinned version.
  *
  * Format (`<uuid>.dv`): two text header lines
  * {{{
  *   graft-dv v1
  *   <root-relative target path>
  * }}}
  * followed by the deleted ordinals as 8-byte big-endian longs, strictly
  * ascending, to EOF. No count field: artifacts publish by atomic
  * tmp+rename, so a readable artifact is complete, and completeness is
  * re-checked structurally ((len - header) % 8 == 0, ascending order).
  * Unlike stats sidecars, a vector is CORRECTNESS state for log-mediated
  * reads: an unreadable one fails the read loudly (never "read the file
  * whole and resurrect deleted rows").
  */
object DeletionVectors {
  val DirName = ".graft-dv"

  def artifactPath(root: Path, name: String): Path =
    new Path(new Path(root, DirName), name)

  private def freshName(): String =
    java.util.UUID.randomUUID().toString.replace("-", "") + ".dv"

  /** Write one vector for `target` (root-relative): the sorted union of
    * `ordinals` (ascending, may contain duplicates) and, when `mergeFrom`
    * names a prior artifact, its ordinals (streamed — never materialized).
    * Returns the new artifact's name. Executor-safe: unique staged name,
    * atomic rename.
    */
  def write(fs: FileSystem, root: Path, target: String,
      ordinals: Iterator[Long], mergeFrom: Option[String]): String = {
    val name = freshName()
    val dir = new Path(root, DirName)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$name.tmp")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
    var ok = false
    try {
      out.write(s"graft-dv v1\n$target\n".getBytes("UTF-8"))
      val prior: java.io.DataInputStream = mergeFrom.map(prev =>
        openValidated(fs, artifactPath(root, prev), target)).orNull
      var priorNext: Long = 0L
      var priorHas = false
      def advancePrior(): Unit =
        if (prior != null) {
          try { priorNext = prior.readLong(); priorHas = true }
          catch { case _: java.io.EOFException => priorHas = false }
        }
      advancePrior()
      var last = Long.MinValue
      def emit(v: Long): Unit = if (v != last) {
        require(v > last,
          s"deletion-vector ordinals for '$target' not ascending: $v after $last")
        out.writeLong(v); last = v
      }
      try {
        ordinals.foreach { v =>
          while (priorHas && priorNext <= v) { emit(priorNext); advancePrior() }
          emit(v)
        }
        while (priorHas) { emit(priorNext); advancePrior() }
      } finally if (prior != null) prior.close()
      ok = true
    } finally {
      out.close()
      if (!ok) fs.delete(tmp, false)
    }
    if (!fs.rename(tmp, artifactPath(root, name)))
      throw new java.io.IOException(
        s"could not publish deletion vector ${artifactPath(root, name)}")
    name
  }

  /** Open an artifact positioned at its first ordinal, after validating
    * the header, the recorded target, and 8-byte payload alignment.
    * Throws on any mismatch — vectors are correctness state.
    */
  private def openValidated(fs: FileSystem, p: Path,
      expectTarget: String): java.io.DataInputStream = {
    val len = fs.getFileStatus(p).getLen
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p), 1 << 16))
    var ok = false
    try {
      // header lines are UTF-8 (targets may carry non-ASCII partition
      // values — escapePathValue passes them through); decode the
      // collected BYTES, never byte-as-char, and count the bytes
      // actually consumed for the alignment check
      var consumed = 0L
      def line(): String = {
        val buf = new java.io.ByteArrayOutputStream(64)
        var b = in.read()
        while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
        require(b == '\n', s"deletion vector $p: truncated header")
        consumed += buf.size() + 1
        new String(buf.toByteArray, "UTF-8")
      }
      val h = line()
      require(h == "graft-dv v1", s"deletion vector $p: bad header '$h'")
      val target = line()
      require(expectTarget == null || target == expectTarget,
        s"deletion vector $p records target '$target', expected '$expectTarget' " +
          "— the commit log and the artifact disagree")
      require((len - consumed) % 8 == 0,
        s"deletion vector $p: payload not 8-byte aligned (len=$len)")
      ok = true
      in
    } finally if (!ok) in.close()
  }

  /** Refuse a listing that carries any deletion vector — for reader
    * surfaces with no mask path (byte-offset streams, the avro reader):
    * silently resurrecting deleted rows is the one failure the contract
    * forbids, so they fail loudly instead.
    */
  def requireNone(files: Seq[GraftSources.ListedFile], surface: String): Unit =
    files.find(_.dv != null).foreach { f =>
      throw new IllegalStateException(
        s"$surface: '${f.path}' carries a deletion vector, which this read " +
          "path cannot apply — materialize the deletes " +
          "(TrainingData.materializeDeletes) first")
    }

  /** Delete `.dv` artifacts under `.graft-dv/` no surviving entry or checkpoint
    * references (single-maintainer op, like the other reclamation APIs:
    * a CONCURRENT deleteWhereDV's already-renamed-but-not-yet-committed
    * artifact would be reclaimed and its commit's readers then fail
    * loudly — never wrongly). Staged `.*.tmp` files are their writer's to
    * clean. Returns the artifact names removed (in dryRun, the names that
    * WOULD be — nothing is deleted). Pass `referenced` when the caller
    * already folded the log (`GraftCommitLog.allReferenced`) to avoid a
    * second full fold.
    */
  def reclaimUnreferenced(fs: FileSystem, root: Path,
      dryRun: Boolean = false, referenced: Set[String] = null): Seq[String] = {
    val dir = new Path(root, DirName)
    if (!fs.exists(dir)) return Nil
    val live = Option(referenced)
      .getOrElse(GraftCommitLog.allReferenced(fs, root)._2)
    val orphans = fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".dv") && !live.contains(p.getName))
    if (!dryRun) orphans.foreach(p => fs.delete(p, false))
    orphans.map(_.getName).sorted
  }

  /** All deleted ordinals of the artifact at `p` (absolute), ascending.
    * `expectTarget` (root-relative; null skips the check) cross-checks the
    * artifact against the commit-log mapping that named it.
    */
  def readOrdinals(conf: Configuration, p: Path,
      expectTarget: String): Array[Long] = {
    val fs = p.getFileSystem(conf)
    val in = openValidated(fs, p, expectTarget)
    try {
      val buf = new scala.collection.mutable.ArrayBuffer[Long]
      var last = Long.MinValue
      var done = false
      while (!done) {
        try {
          val v = in.readLong()
          require(v > last,
            s"deletion vector $p: ordinals not strictly ascending")
          require(v >= 0, s"deletion vector $p: negative ordinal $v")
          buf += v
          last = v
        } catch { case _: java.io.EOFException => done = true }
      }
      buf.toArray
    } finally in.close()
  }
}
