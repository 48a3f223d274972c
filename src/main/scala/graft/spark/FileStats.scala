package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file data-skipping statistics (Delta/parquet-footer-style min/max
  * pruning for JSON corpora, which have no native footer): the graft-json
  * and graft-csv sinks write one hidden `.<file>.stats` sidecar per part
  * with row count and per-column (nulls, min, max) for top-level atomic
  * columns; the graft scan consults it at PLANNING time to drop whole
  * files whose value ranges cannot satisfy a pushed filter — no task, no
  * bytes.
  *
  * Sidecar format is line-oriented (version line, `rows`, `len`, then one
  * `col` line per column) with base64-encoded strings so no value can
  * corrupt the framing. Missing or unreadable sidecars simply disable
  * pruning for that file.
  *
  * Staleness binding: the sidecar records the data file's byte length at
  * write time (`len` line) and [[load]] validates it against the actual
  * file status — a data file later rewritten by another tool no longer
  * matches and its stale sidecar is ignored (parse instead of trusting
  * wrong COUNT/MIN/MAX). Sidecars predating the `len` line are accepted
  * best-effort.
  *
  * String bounds are TRUNCATED like parquet footers: values longer than
  * [[FileStats.MaxStringStatBytes]] store a bounded prefix for min and a
  * prefix-successor for max. Truncated bounds stay valid for pruning
  * (min only ever lowered, max only ever raised — conservative) but are
  * flagged inexact so metadata-only MIN/MAX answers refuse them.
  *
  * Scale note: sidecar loads are driver-side, one small read per
  * CANDIDATE file, cached per scan, and consulted only when a pushed
  * filter or metadata-answerable aggregate makes them useful — and only
  * AFTER hive partition pruning has already cut the listing. At millions
  * of surviving files the per-file reads would dominate planning; the
  * production evolution is a per-directory manifest compacting the
  * sidecars (exactly Delta's checkpoint trajectory), which the format's
  * versioned line protocol leaves room for.
  */
object FileStats {

  /** Bound on stored string min/max bytes (parquet's default is 64). */
  val MaxStringStatBytes = 64

  /** Bloom filter sizing: 64 Kbit (8 KiB) per tracked column, 4 probes.
    * At k=4 a bloom stays useful (≤ 50% load, FPR ≤ 6.25%) up to ~11k
    * distinct values per file; past that [[FileStatsCollector.snapshot]]
    * drops it rather than ship a filter that can no longer prune.
    */
  val BloomBits: Int = 1 << 16
  val BloomK: Int = 4

  /** Values longer than this disable the column's bloom: whole-document
    * text columns would pay per-row hashing for a filter nobody ever
    * equality-probes (ids, hashes, domains, categories are all short).
    */
  val MaxBloomValueBytes: Int = 128

  /** A per-column bloom filter over the file's non-null values — the
    * point-lookup complement to min/max ranges: a hash-partitioned or
    * unsorted layout gives every file the full [min, max] span, so range
    * stats prune nothing for `key = v` / `key IN (...)`, while the bloom
    * answers "definitely not in this file" for exactly those filters
    * (the same role parquet bloom filters / Delta bloom indexes play).
    * Double hashing (Kirsch–Mitzenmacher): probe i = h1 + i·h2 mod bits.
    */
  final case class Bloom(k: Int, bits: Array[Long]) {
    def numBits: Int = bits.length << 6
    def mightContain(h: (Long, Long)): Boolean = {
      val m = numBits
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h._1 + i.toLong * h._2, m).toInt
        if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
    /** Fraction of set bits — the saturation measure. */
    def load: Double =
      bits.foldLeft(0L)((a, w) => a + java.lang.Long.bitCount(w)).toDouble / numBits
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** Hash pair for an integral value (no byte materialization). */
  def bloomHashLong(v: Long): (Long, Long) = {
    val h1 = fmix64(v ^ 0xcbf29ce484222325L)
    (h1, fmix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L)
  }

  /** Hash pair for a string value's UTF-8 bytes (FNV-1a then finalize). */
  def bloomHashBytes(b: Array[Byte]): (Long, Long) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val h1 = fmix64(h)
    (h1, fmix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L)
  }

  /** Hash pair for a filter literal against a column of `kind`; null when
    * the literal's type does not canonically map onto the column's value
    * space (then the bloom must not be consulted). Integral literals use
    * the Long hash (matching the writer's inserts); string literals hash
    * their UTF-8 bytes.
    */
  def bloomHashes(kind: Char, v: Any): (Long, Long) = kind match {
    case 'i' => v match {
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        bloomHashLong(n.asInstanceOf[java.lang.Number].longValue)
      case _ => null
    }
    case 's' => v match {
      case u: UTF8String => bloomHashBytes(u.getBytes)
      case s: String => bloomHashBytes(s.getBytes("UTF-8"))
      case _ => null
    }
    case _ => null
  }

  /** True when the bloom PROVES no row of the file can satisfy the
    * filter: every (non-null) equality probe is definitely absent. Only
    * equality shapes consult the bloom — ranges stay with min/max. A
    * null literal never matches any row under IN/=, so all-null sets
    * prune correctly; an unmappable literal type keeps the file.
    */
  /** Filters whose shape a bloom can answer — the gate for paying a
    * per-file sidecar read when the manifest (bloom-less by design)
    * served the range stats.
    */
  def bloomEligible(f: org.apache.spark.sql.sources.Filter): Boolean = f match {
    case org.apache.spark.sql.sources.EqualTo(_, _) => true
    case org.apache.spark.sql.sources.In(_, _) => true
    case org.apache.spark.sql.sources.EqualNullSafe(_, v) => v != null
    case _ => false
  }

  def bloomExcludes(c: ColStats, f: org.apache.spark.sql.sources.Filter): Boolean = {
    if (c.bloom == null) return false
    def absent(v: Any): Boolean = v != null && {
      val h = bloomHashes(c.kind, v)
      h != null && !c.bloom.mightContain(h)
    }
    f match {
      case org.apache.spark.sql.sources.EqualTo(_, v) => absent(v)
      case org.apache.spark.sql.sources.EqualNullSafe(_, v) => v != null && absent(v)
      case org.apache.spark.sql.sources.In(_, vs) =>
        vs.nonEmpty && vs.forall(v => v == null || absent(v))
      case _ => false
    }
  }

  private def longsToBytes(ls: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ls.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(ls)
    bb.array()
  }

  private def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](b.length / 8)
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  /** One column's stats. kind: 'i' integral (Long), 'f' floating (Double),
    * 's' string (UTF8String), 'b' boolean, 'd' decimal
    * (java.math.BigDecimal). min/max null = no non-null values observed.
    * minExact/maxExact false = the bound is a truncation artifact (valid
    * for pruning, unusable as a metadata MIN/MAX answer).
    * `sum` (java.lang.Long / java.lang.Double / java.math.BigDecimal by
    * kind) is the file's exact non-null sum, accumulated in WRITE order —
    * the same fold the parsing reader would produce — so a pushed SUM
    * battery can answer from metadata; null = untracked kind, no rows,
    * or an integral sum that left the Long range (the parse fallback
    * piece-splits those).
    */
  /** `sorted` = the file's WRITE order is ascending-nulls-first on this
    * column (nulls, if any, all precede the first non-null value, and
    * non-null values never decrease) — exactly Spark's default ASC
    * NULLS FIRST SortOrder, so a scan over such files may report a
    * per-partition output ordering and downstream sorts are elided.
    */
  final case class ColStats(kind: Char, nulls: Long, min: Any, max: Any,
      minExact: Boolean = true, maxExact: Boolean = true, sum: Any = null,
      bloom: Bloom = null, sorted: Boolean = false)

  /** One intra-file block: `[start, end)` BYTE range whose boundaries the
    * writer guarantees to be exact row starts (so a reader may begin at
    * `start` with no realignment and stop at `end` exactly), with the
    * block's own (rows, per-column nulls/min/max) — the parquet row-group
    * analog for the line formats. Blocks carry no sums/blooms/sorted
    * flags: they exist for range pruning only.
    */
  final case class Block(start: Long, end: Long, rows: Long,
      cols: Map[String, ColStats])

  /** dataLen -1 = unknown (legacy sidecar without a `len` line).
    * `blocks`: intra-file block stats (empty = none recorded); use
    * [[validBlocks]] rather than reading this raw.
    * `header`: the writer's DATA column order (`hdr` line) — what lets a
    * mid-file CSV range prove the file's physical layout matches the
    * table schema before mapping cells positionally.
    */
  final case class Stats(rows: Long, cols: Map[String, ColStats],
      dataLen: Long = -1L, blocks: Seq[Block] = Nil,
      header: Option[Seq[String]] = None) {
    /** Blocks, iff they provably tile the file: contiguous, ascending,
      * starting at 0 and ending exactly at `expectedLen` (the LISTING's
      * length). Anything else — a partial recording, a stale sidecar, a
      * compressed member — yields Nil and planning treats the file as
      * one opaque range, never a wrong subset.
      */
    def validBlocks(expectedLen: Long): Seq[Block] = {
      if (blocks.isEmpty || expectedLen <= 0) return Nil
      var prev = 0L
      var i = 0
      while (i < blocks.length) {
        val b = blocks(i)
        if (b.start != prev || b.end <= b.start) return Nil
        prev = b.end
        i += 1
      }
      if (prev != expectedLen) Nil else blocks
    }
  }

  def sidecarFor(dataFile: Path): Path =
    new Path(dataFile.getParent, "." + dataFile.getName + ".stats")

  /** Per-directory compacted stats: one hidden manifest holding every
    * part's (rows, len, cols) block, written by the batch sinks' driver-
    * side commit from the tasks' commit messages — planning then reads ONE
    * small file per directory instead of one sidecar per candidate file
    * (the Delta-checkpoint trajectory the per-file design points at).
    * Entries are validated against the LISTING's file length (already in
    * hand at planning), so a stale manifest degrades to the per-file
    * sidecar fallback, never to wrong results.
    */
  def manifestFor(dir: Path): Path = new Path(dir, ".graft-manifest")

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64Bytes(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Inexact (truncated) bounds carry a `~` marker so exactness survives
    * the round-trip; their payload is RAW bytes (a prefix-successor need
    * not be valid UTF-8).
    */
  private[spark] def encodeValue(kind: Char, v: Any, exact: Boolean = true): String =
    if (v == null) "-"
    else kind match {
      case 'i' | 't' | 'y' => v.toString // temporal lanes ride the Long form
      case 'f' => java.lang.Double.toString(v.asInstanceOf[Double]) // exact round-trip
      case 's' =>
        if (exact) b64(v.toString)
        else "~" + b64Bytes(v.asInstanceOf[UTF8String].getBytes)
      case 'b' => if (v.asInstanceOf[Boolean]) "t" else "f"
      case 'd' => v.asInstanceOf[java.math.BigDecimal].toPlainString
    }

  private[spark] def decodeValue(kind: Char, s: String): Any =
    if (s == "-") null
    else kind match {
      case 'i' | 't' | 'y' => java.lang.Long.valueOf(s)
      case 'f' => java.lang.Double.valueOf(s)
      case 's' =>
        if (s.startsWith("~"))
          UTF8String.fromBytes(java.util.Base64.getDecoder.decode(s.substring(1)))
        else UTF8String.fromString(unb64(s))
      case 'b' => java.lang.Boolean.valueOf(s == "t")
      case 'd' => new java.math.BigDecimal(s)
    }

  private def encodeSum(kind: Char, v: Any): String =
    if (v == null) "-"
    else kind match {
      case 'i' => v.toString
      case 'f' => java.lang.Double.toString(v.asInstanceOf[Double])
      case 'd' => v.asInstanceOf[java.math.BigDecimal].toPlainString
      case _ => "-"
    }

  private def decodeSum(kind: Char, s: String): Any =
    if (s == "-") null
    else kind match {
      case 'i' => java.lang.Long.valueOf(s)
      case 'f' => java.lang.Double.valueOf(s)
      case 'd' => new java.math.BigDecimal(s)
      case _ => null
    }

  /** Attach parsed bloom lines to their columns (a bloom for an unknown
    * column is dropped — it can only have come from a corrupt sidecar).
    */
  private def withBlooms(cols: Map[String, ColStats],
      blooms: Map[String, Bloom]): Map[String, ColStats] =
    if (blooms.isEmpty) cols
    else cols.map { case (n, c) =>
      n -> blooms.get(n).map(b => c.copy(bloom = b)).getOrElse(c)
    }

  private def renderBody(sb: StringBuilder, stats: Stats): Unit = {
    sb.append("rows\t").append(stats.rows).append('\n')
    if (stats.dataLen >= 0) sb.append("len\t").append(stats.dataLen).append('\n')
    stats.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      sb.append("col\t").append(b64(name)).append('\t').append(c.kind)
        .append('\t').append(c.nulls)
        .append('\t').append(encodeValue(c.kind, c.min, c.minExact))
        .append('\t').append(encodeValue(c.kind, c.max, c.maxExact))
        .append('\t').append(encodeSum(c.kind, c.sum))
        .append('\t').append(if (c.sorted) "a" else "-")
        .append('\n')
      if (c.bloom != null)
        sb.append("bloom\t").append(b64(name)).append('\t').append(c.bloom.k)
          .append('\t').append(b64Bytes(longsToBytes(c.bloom.bits)))
          .append('\n')
    }
    stats.header.foreach { cols =>
      sb.append("hdr")
      cols.foreach(c => sb.append('\t').append(b64(c)))
      sb.append('\n')
    }
    // intra-file blocks: a `blk` header then one `bcol` per tracked column
    // (both tags are ignored by pre-block parsers — forward-compatible)
    stats.blocks.foreach { b =>
      sb.append("blk\t").append(b.start).append('\t').append(b.end)
        .append('\t').append(b.rows).append('\n')
      b.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
        sb.append("bcol\t").append(b64(name)).append('\t').append(c.kind)
          .append('\t').append(c.nulls)
          .append('\t').append(encodeValue(c.kind, c.min, c.minExact))
          .append('\t').append(encodeValue(c.kind, c.max, c.maxExact))
          .append('\n')
      }
    }
  }

  def render(stats: Stats): String = {
    val sb = new StringBuilder("graft-stats v1\n")
    renderBody(sb, stats)
    sb.toString
  }

  /** Render a manifest from per-file rendered sidecar contents (as
    * produced by [[render]]) — the commit messages carry the rendered
    * text, so no reparse happens on the driver. BLOOM LINES ARE
    * STRIPPED: a bloom is ~11 KB of base64 per column per file, which
    * would turn the "one small read per directory" manifest into tens
    * of MB at thousands of files; ranges/counts/sums stay here, blooms
    * stay in the per-file sidecars and are consulted lazily — only for
    * equality-shaped filters, only for files the ranges kept (where one
    * small read can still cancel a whole task).
    */
  def renderManifest(entries: Seq[(String, String)]): String = {
    val sb = new StringBuilder("graft-manifest v1\n")
    entries.sortBy(_._1).foreach { case (name, rendered) =>
      sb.append("entry\t").append(b64(name)).append('\n')
      // strip the per-file version line; keep body lines minus blooms AND
      // block lanes — both scale with file size/count and would defeat
      // the "one small read per directory" invariant (a 1 GB file is
      // ~128 blk lines × N bcol lines). Planning reads them lazily from
      // the per-file sidecar, only for files the file-level stats kept.
      rendered.linesIterator.drop(1).foreach { line =>
        if (!line.startsWith("bloom\t") && !line.startsWith("blk\t") &&
            !line.startsWith("bcol\t"))
          sb.append(line).append('\n')
      }
    }
    sb.toString
  }

  /** Parse a manifest into basename → Stats; None on malformed content. */
  def parseManifest(text: String): Option[Map[String, Stats]] = {
    val lines = text.split('\n').filter(_.nonEmpty)
    if (lines.isEmpty || lines(0) != "graft-manifest v1") return None
    try {
      val out = Map.newBuilder[String, Stats]
      var name: String = null
      var rows = -1L
      var dlen = -1L
      var header: Option[Seq[String]] = None
      var cols = Map.newBuilder[String, ColStats]
      var blooms = Map.newBuilder[String, Bloom]
      var blocks = Seq.newBuilder[Block]
      var bStart = -1L; var bEnd = -1L; var bRows = -1L
      var bCols = Map.newBuilder[String, ColStats]
      def flushBlk(): Unit = if (bRows >= 0) {
        blocks += Block(bStart, bEnd, bRows, bCols.result())
        bRows = -1L; bCols = Map.newBuilder[String, ColStats]
      }
      def flush(): Unit = if (name != null && rows >= 0) {
        flushBlk()
        out += name -> Stats(rows, withBlooms(cols.result(), blooms.result()),
          dlen, blocks.result(), header)
      }
      lines.drop(1).foreach { line =>
        val p = line.split("\t", -1)
        p(0) match {
          case "entry" =>
            flush()
            name = unb64(p(1)); rows = -1L; dlen = -1L; header = None
            cols = Map.newBuilder[String, ColStats]
            blooms = Map.newBuilder[String, Bloom]
            blocks = Seq.newBuilder[Block]; bRows = -1L
            bCols = Map.newBuilder[String, ColStats]
          case "rows" => rows = p(1).toLong
          case "len" => dlen = p(1).toLong
          case "hdr" => header = Some(p.drop(1).toSeq.map(unb64))
          case "col" =>
            val kind = p(2).charAt(0)
            cols += unb64(p(1)) -> ColStats(
              kind, p(3).toLong, decodeValue(kind, p(4)), decodeValue(kind, p(5)),
              minExact = !p(4).startsWith("~"), maxExact = !p(5).startsWith("~"),
              sum = if (p.length > 6) decodeSum(kind, p(6)) else null,
              sorted = p.length > 7 && p(7) == "a")
          case "bloom" =>
            blooms += unb64(p(1)) -> Bloom(p(2).toInt,
              bytesToLongs(java.util.Base64.getDecoder.decode(p(3))))
          case "blk" =>
            flushBlk()
            bStart = p(1).toLong; bEnd = p(2).toLong; bRows = p(3).toLong
          case "bcol" => if (bRows >= 0) {
            val kind = p(2).charAt(0)
            bCols += unb64(p(1)) -> ColStats(
              kind, p(3).toLong, decodeValue(kind, p(4)), decodeValue(kind, p(5)),
              minExact = !p(4).startsWith("~"), maxExact = !p(5).startsWith("~"))
          }
          case _ => ()
        }
      }
      flush()
      Some(out.result())
    } catch { case _: Exception => None }
  }

  /** Load and parse a directory's manifest; None when absent/unreadable. */
  def loadManifest(fs: FileSystem, dir: Path): Option[Map[String, Stats]] = {
    val p = manifestFor(dir)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      try parseManifest(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: Exception => None }
  }

  /** Stats for a data file whose on-disk length is already known (from a
    * listing or an input partition): per-file sidecar first, then the
    * directory manifest — manifest entries must carry a matching length
    * to be trusted (the listing length costs no extra RPC).
    */
  def loadFor(fs: FileSystem, dataFile: Path, expectedLen: Long): Option[Stats] =
    load(fs, dataFile).orElse(
      loadManifest(fs, dataFile.getParent)
        .flatMap(_.get(dataFile.getName))
        .filter(st => st.dataLen >= 0 && st.dataLen == expectedLen))

  /** Parse a sidecar; None on any malformed content (no pruning). */
  def parse(text: String): Option[Stats] = {
    val lines = text.split('\n').filter(_.nonEmpty)
    if (lines.isEmpty || lines(0) != "graft-stats v1") return None
    try {
      var rows = -1L
      var len = -1L
      var header: Option[Seq[String]] = None
      val cols = Map.newBuilder[String, ColStats]
      val blooms = Map.newBuilder[String, Bloom]
      val blocks = Seq.newBuilder[Block]
      var bStart = -1L; var bEnd = -1L; var bRows = -1L
      var bCols = Map.newBuilder[String, ColStats]
      def flushBlk(): Unit = if (bRows >= 0) {
        blocks += Block(bStart, bEnd, bRows, bCols.result())
        bRows = -1L; bCols = Map.newBuilder[String, ColStats]
      }
      lines.drop(1).foreach { line =>
        val p = line.split("\t", -1)
        p(0) match {
          case "rows" => rows = p(1).toLong
          case "len" => len = p(1).toLong
          case "hdr" => header = Some(p.drop(1).toSeq.map(unb64))
          case "col" =>
            val kind = p(2).charAt(0)
            cols += unb64(p(1)) -> ColStats(
              kind, p(3).toLong, decodeValue(kind, p(4)), decodeValue(kind, p(5)),
              minExact = !p(4).startsWith("~"), maxExact = !p(5).startsWith("~"),
              sum = if (p.length > 6) decodeSum(kind, p(6)) else null,
              sorted = p.length > 7 && p(7) == "a")
          case "bloom" =>
            blooms += unb64(p(1)) -> Bloom(p(2).toInt,
              bytesToLongs(java.util.Base64.getDecoder.decode(p(3))))
          case "blk" =>
            flushBlk()
            bStart = p(1).toLong; bEnd = p(2).toLong; bRows = p(3).toLong
          case "bcol" => if (bRows >= 0) {
            val kind = p(2).charAt(0)
            bCols += unb64(p(1)) -> ColStats(
              kind, p(3).toLong, decodeValue(kind, p(4)), decodeValue(kind, p(5)),
              minExact = !p(4).startsWith("~"), maxExact = !p(5).startsWith("~"))
          }
          case _ => () // forward-compatible: unknown lines ignored
        }
      }
      flushBlk()
      if (rows < 0) None
      else Some(Stats(rows, withBlooms(cols.result(), blooms.result()), len,
        blocks.result(), header))
    } catch { case _: Exception => None }
  }

  /** Load the sidecar for a data file; None when absent/unreadable, or
    * when its recorded data-file length no longer matches the file on
    * disk (stale sidecar after an out-of-band rewrite — trusting it would
    * return wrong results, so fall back to parsing).
    */
  def load(fs: FileSystem, dataFile: Path): Option[Stats] = {
    val p = sidecarFor(dataFile)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val st =
        try parse(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      st.filter(s => s.dataLen < 0 || s.dataLen == fs.getFileStatus(dataFile).getLen)
    } catch { case _: Exception => None }
  }

  /** Codepoint-safe byte-bounded prefix: backs off past UTF-8
    * continuation bytes so the result is valid UTF-8 and byte-wise ≤ the
    * original (a prefix always is).
    */
  private[spark] def truncatePrefix(u: UTF8String, maxBytes: Int): UTF8String = {
    val b = u.getBytes
    if (b.length <= maxBytes) return u
    var i = maxBytes
    while (i > 0 && (b(i) & 0xC0) == 0x80) i -= 1
    UTF8String.fromBytes(java.util.Arrays.copyOf(b, i))
  }

  /** Smallest byte string greater than every string with the prefix
    * `truncatePrefix(u, maxBytes)` (increment the last non-0xFF byte,
    * drop the tail); None when every prefix byte is 0xFF — the caller
    * then keeps the untruncated value. The result may not be valid
    * UTF-8, which is fine: it is only ever byte-compared.
    */
  private[spark] def truncateUpperBound(u: UTF8String, maxBytes: Int): Option[UTF8String] = {
    val b = java.util.Arrays.copyOf(u.getBytes, math.min(u.numBytes, maxBytes))
    var i = b.length - 1
    while (i >= 0 && b(i) == -1) i -= 1
    if (i < 0) None
    else {
      b(i) = (b(i) + 1).toByte
      Some(UTF8String.fromBytes(java.util.Arrays.copyOf(b, i + 1)))
    }
  }
}

/** Streaming min/max/null collector over InternalRows for the sinks. Only
  * top-level atomic columns participate; everything else is skipped (the
  * sidecar simply omits them).
  *
  * Stats must describe the FILE, not the in-memory rows, or
  * metadata-only COUNT/SUM/MIN/MAX answers and sorted-flag claims
  * diverge from what a parse returns. Two serializer lossy spots:
  * `nonFiniteAsNull` — the JSON serializer writes NaN/±Infinity as
  * `null` (JSON has no literals for them; the CSV writer emits
  * `NaN`/`Infinity` tokens its reader parses back, so CSV keeps them);
  * `emptyStringsAsNull` — the CSV dialect reads an empty cell as NULL
  * (Spark/DuckDB parity), and an empty string writes as an empty cell,
  * so the CSV collectors must count empty strings as nulls (JSON
  * round-trips `""` exactly, so JSON keeps them).
  */
private[spark] final class FileStatsCollector(schema: StructType,
    nonFiniteAsNull: Boolean = false,
    emptyStringsAsNull: Boolean = false,
    blockBytes: Long = 0L) {
  import FileStats._

  // (field index, name, kind) for supported columns
  private val tracked: Array[(Int, String, Char)] =
    schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => Some((i, f.name, 'i'))
        case DoubleType | FloatType => Some((i, f.name, 'f'))
        case StringType => Some((i, f.name, 's'))
        case BooleanType => Some((i, f.name, 'b'))
        case _: DecimalType => Some((i, f.name, 'd'))
        // temporal lanes: micros ('t') / days ('y') as Longs — the
        // time-range file pruning every time-series corpus lives on
        case TimestampType | TimestampNTZType => Some((i, f.name, 't'))
        case DateType => Some((i, f.name, 'y'))
        case _ => None
      }
    }
  private val mins = new Array[Any](tracked.length)
  private val maxs = new Array[Any](tracked.length)
  private val nulls = new Array[Long](tracked.length)
  private val nonNull = new Array[Long](tracked.length)
  // write-order sums (the same fold the parsing reader produces): Long
  // lane with overflow REFUSAL (sum = null past the Long range — the
  // parse fallback piece-splits those), Double lane, BigDecimal lane
  private val lsums = new Array[Long](tracked.length)
  private val lovf = new Array[Boolean](tracked.length)
  private val dsums = new Array[Double](tracked.length)
  private val bsums = new Array[java.math.BigDecimal](tracked.length)
  // per-column blooms for equality pruning: integral + string kinds only
  // (range kinds keep min/max; floats/decimals have no canonical equality
  // bytes worth the cost). A column goes bloom-dead on the first value
  // past MaxBloomValueBytes — whole-document text columns never pay.
  private val blooms: Array[Array[Long]] = tracked.map { case (_, _, kind) =>
    if (kind == 'i' || kind == 's') new Array[Long](BloomBits >>> 6) else null
  }
  private val bloomDead = new Array[Boolean](tracked.length)
  // write-order sortedness (ASC NULLS FIRST): prev non-null value per
  // column; cleared on any decrease or on a null AFTER a non-null
  private val prevs = new Array[Any](tracked.length)
  private val unsorted = new Array[Boolean](tracked.length)
  private var rows = 0L

  // intra-file block accumulation (blockBytes > 0): per-block min/max/null
  // lanes updated in the same observe pass; the WRITER calls noteBytes
  // after each serialized row, and a block closes at the next row boundary
  // past the byte budget — so every boundary is an exact row start
  private val bmins = new Array[Any](tracked.length)
  private val bmaxs = new Array[Any](tracked.length)
  private val bnulls = new Array[Long](tracked.length)
  private var bRows = 0L
  private var blockStartByte = 0L
  private var totalBytes = 0L
  private val blockBuf =
    if (blockBytes > 0) scala.collection.mutable.ArrayBuffer.empty[FileStats.Block]
    else null

  @inline private def bloomAdd(t: Int, h: (Long, Long)): Unit = {
    val arr = blooms(t)
    var i = 0
    while (i < BloomK) {
      val bit = java.lang.Long.remainderUnsigned(h._1 + i.toLong * h._2, BloomBits).toInt
      arr(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  private def cmp(kind: Char, a: Any, b: Any): Int = kind match {
    case 'i' | 't' | 'y' =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case 'f' => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case 's' => a.asInstanceOf[UTF8String].binaryCompare(b.asInstanceOf[UTF8String])
    case 'b' => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case 'd' => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal])
  }

  def observe(row: InternalRow): Unit = observeProjected(row, null)

  /** Observe a row whose layout is WIDER than this collector's schema:
    * `proj(i)` maps the collector's field index `i` to the row's column
    * index (null = identity) — the partitioned writers' shape, where
    * partition columns are stripped from the written data but the source
    * row still carries them.
    */
  def observeProjected(row: InternalRow, proj: Array[Int]): Unit = {
    rows += 1
    if (blockBuf != null) bRows += 1
    var t = 0
    while (t < tracked.length) {
      val (si, _, kind) = tracked(t)
      val i = if (proj == null) si else proj(si)
      // mirror the serializer's lossy spots: JSON nulls non-finite
      // floats; the CSV dialect reads empty cells (= empty strings on
      // the way out) as null
      val asNull = row.isNullAt(i) ||
        (nonFiniteAsNull && kind == 'f' && {
          val d = schema.fields(si).dataType match {
            case DoubleType => row.getDouble(i)
            case FloatType => row.getFloat(i).toDouble
          }
          java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)
        }) ||
        (emptyStringsAsNull && kind == 's' && row.getUTF8String(i).numBytes == 0)
      if (asNull) {
        nulls(t) += 1
        if (blockBuf != null) bnulls(t) += 1
        // NULLS FIRST: a null after any non-null value breaks the order
        if (nonNull(t) > 0) unsorted(t) = true
      } else {
        val v: Any = kind match {
          case 'i' => schema.fields(si).dataType match {
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i).toLong
            case ShortType => row.getShort(i).toLong
            case ByteType => row.getByte(i).toLong
          }
          case 't' => row.getLong(i)        // micros
          case 'y' => row.getInt(i).toLong  // days
          case 'f' => schema.fields(si).dataType match {
            case DoubleType => row.getDouble(i)
            case FloatType => row.getFloat(i).toDouble
          }
          // rows are recycled by upstream operators: copy the bytes
          case 's' => row.getUTF8String(i).clone()
          case 'b' => row.getBoolean(i)
          case 'd' =>
            val dt = schema.fields(si).dataType.asInstanceOf[DecimalType]
            row.getDecimal(i, dt.precision, dt.scale).toJavaBigDecimal // immutable copy
        }
        if (mins(t) == null || cmp(kind, v, mins(t)) < 0) mins(t) = v
        if (maxs(t) == null || cmp(kind, v, maxs(t)) > 0) maxs(t) = v
        if (blockBuf != null) {
          if (bmins(t) == null || cmp(kind, v, bmins(t)) < 0) bmins(t) = v
          if (bmaxs(t) == null || cmp(kind, v, bmaxs(t)) > 0) bmaxs(t) = v
        }
        if (!unsorted(t)) {
          if (prevs(t) != null && cmp(kind, v, prevs(t)) < 0) unsorted(t) = true
          else prevs(t) = v
        }
        nonNull(t) += 1
        kind match {
          case 'i' =>
            val a = lsums(t)
            val b = v.asInstanceOf[Long]
            val s = a + b
            if (((a ^ s) & (b ^ s)) < 0) lovf(t) = true else lsums(t) = s
            if (!bloomDead(t)) bloomAdd(t, bloomHashLong(b))
          case 'f' => dsums(t) += v.asInstanceOf[Double]
          case 'd' =>
            val bd = v.asInstanceOf[java.math.BigDecimal]
            bsums(t) = if (bsums(t) == null) bd else bsums(t).add(bd)
          case 's' if !bloomDead(t) =>
            val u = v.asInstanceOf[UTF8String]
            if (u.numBytes > MaxBloomValueBytes) bloomDead(t) = true
            else bloomAdd(t, bloomHashBytes(u.getBytes))
          case _ => ()
        }
      }
      t += 1
    }
  }

  /** WRITER hook: account `n` serialized bytes for the row just observed
    * (header bytes count too — block 0 simply includes them). Closing
    * happens here, at a row boundary, once the byte budget is crossed.
    */
  def noteBytes(n: Long): Unit = {
    totalBytes += n
    if (blockBuf != null && totalBytes - blockStartByte >= blockBytes) closeBlock()
  }

  /** WRITER hook for formats with native block framing (avro): close the
    * current block at an EXACT boundary byte position supplied by the
    * format's own writer — a sync-marker edge, so a reader realigning at
    * the boundary starts on a record boundary with zero scan-over. The
    * final call (the published file's length) may arrive with no rows
    * since the previous boundary; the previous block is then EXTENDED to
    * `endPos` — the trailing sync-marker bytes must still be tiled, or
    * [[FileStats.Stats.validBlocks]] would refuse the whole recording.
    */
  def closeBlockAt(endPos: Long): Unit = {
    if (blockBuf == null || endPos <= blockStartByte) return
    totalBytes = endPos
    if (bRows == 0L) {
      if (blockBuf.nonEmpty)
        blockBuf(blockBuf.length - 1) = blockBuf.last.copy(end = endPos)
      blockStartByte = endPos
    } else closeBlock()
  }

  private def closeBlock(): Unit = {
    if (bRows <= 0) { blockStartByte = totalBytes; return }
    val cols = tracked.zipWithIndex.map { case ((_, name, kind), t) =>
      val (mn, mnExact) = (kind, bmins(t)) match {
        case ('s', u: UTF8String) if u.numBytes > MaxStringStatBytes =>
          (truncatePrefix(u, MaxStringStatBytes), false)
        case (_, v) => (v, true)
      }
      val (mx, mxExact) = (kind, bmaxs(t)) match {
        case ('s', u: UTF8String) if u.numBytes > MaxStringStatBytes =>
          truncateUpperBound(u, MaxStringStatBytes) match {
            case Some(ub) => (ub, false)
            case None => (u, true)
          }
        case (_, v) => (v, true)
      }
      name -> ColStats(kind, bnulls(t), mn, mx, mnExact, mxExact)
    }.toMap
    blockBuf += FileStats.Block(blockStartByte, totalBytes, bRows, cols)
    java.util.Arrays.fill(bmins.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(bmaxs.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(bnulls, 0L)
    bRows = 0L
    blockStartByte = totalBytes
  }

  /** The recorded blocks, iff ≥ 2 and the byte accounting matches the
    * published file exactly (compressed sinks count uncompressed bytes,
    * so their accounting can never match — blocks drop out by
    * construction). A single block adds nothing over the file stats.
    */
  private def finishBlocks(dataLen: Long): Seq[FileStats.Block] = {
    if (blockBuf == null) return Nil
    closeBlock()
    val bs = blockBuf.toSeq
    if (bs.length >= 2 && dataLen == totalBytes) bs else Nil
  }

  def snapshot(dataLen: Long = -1L): Stats = Stats(rows,
    tracked.zipWithIndex.map { case ((_, name, kind), t) =>
      // bound string stats like parquet footers: min → prefix (lowered),
      // max → prefix-successor (raised); both flagged inexact
      val (mn, mnExact) = (kind, mins(t)) match {
        case ('s', u: UTF8String) if u.numBytes > MaxStringStatBytes =>
          (truncatePrefix(u, MaxStringStatBytes), false)
        case (_, v) => (v, true)
      }
      val (mx, mxExact) = (kind, maxs(t)) match {
        case ('s', u: UTF8String) if u.numBytes > MaxStringStatBytes =>
          truncateUpperBound(u, MaxStringStatBytes) match {
            case Some(ub) => (ub, false)
            case None => (u, true) // all-0xFF prefix: keep the full value
          }
        case (_, v) => (v, true)
      }
      val sum: Any =
        if (nonNull(t) == 0) null
        else kind match {
          case 'i' => if (lovf(t)) null else java.lang.Long.valueOf(lsums(t))
          case 'f' => java.lang.Double.valueOf(dsums(t))
          case 'd' => bsums(t)
          case _ => null
        }
      // a saturated bloom (load > 0.5 ⇒ FPR > 6%) prunes ~nothing but
      // costs sidecar bytes and probe time on every scan: drop it
      val bloom: Bloom =
        if (blooms(t) == null || bloomDead(t) || nonNull(t) == 0) null
        else {
          val b = Bloom(BloomK, blooms(t))
          if (b.load > 0.5) null else b
        }
      name -> ColStats(kind, nulls(t), mn, mx, mnExact, mxExact, sum, bloom,
        sorted = !unsorted(t))
    }.toMap, dataLen, finishBlocks(dataLen),
    header = Some(schema.fieldNames.toSeq))
}
