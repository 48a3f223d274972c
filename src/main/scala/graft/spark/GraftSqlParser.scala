package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** SQL front for the table-maintenance verbs (the Delta SQL shape;
  * docs/TABLE_FORMAT.md) — statements a SQL-first user reaches for before
  * any DataFrame API:
  *
  * {{{
  *   DESCRIBE HISTORY <table>
  *   DESCRIBE DETAIL <table>
  *   CLONE TABLE <table> TO '<dst path>' [VERSION AS OF <n>]
  *   RESTORE TABLE <table> TO VERSION AS OF <n>
  *   RESTORE TABLE <table> TO TIMESTAMP AS OF <epochMillis>
  *   OPTIMIZE <table> [WHERE <partition predicate>] [ZORDER BY (c, ...)]
  *   VACUUM <table> [DRY RUN]
  *   DELETE FROM '<path>' WHERE <predicate>
  *   UPDATE <table> SET c = <expr> [, ...] WHERE <predicate>
  *   MERGE INTO <table> USING (<query>) ON (k [, ...])
  *   ALTER TABLE <table> ADD COLUMN c <TYPE>
  *   ALTER TABLE <table> RENAME COLUMN a TO b
  *   ALTER TABLE <table> DROP COLUMN c
  *   REORG TABLE <table> APPLY (PURGE)
  * }}}
  *
  * where `<table>` is `'<path>'` or a session-catalog table name.
  *
  * Tables are addressed by PATH (single-quoted, `''` escapes a quote) or
  * — everywhere but DELETE — by session-catalog NAME (`t`, `db.t`,
  * optionally `spark_catalog`-qualified, parts bare or backticked), the
  * Delta dual dialect. A name resolves through the session catalog to a
  * graft-provider table's LOCATION; the table's schema then resolves
  * from its commit log's recorded schema and its data format from the
  * live files (or, for an emptied table, from the log's write history) —
  * exactly the tables maintenance applies to (only graft batch sinks
  * write the log). A name that resolves to a NON-graft table (another
  * provider, a temp view) always delegates — another installed parser
  * extension, or Spark itself, gets to handle its own table; a name
  * that resolves to NOTHING makes the graft-only verbs (DESCRIBE
  * HISTORY, RESTORE, OPTIMIZE, VACUUM, REORG) refuse with a targeted
  * message (a typo should not surface as a bare Spark syntax error),
  * while verbs Spark parses (UPDATE, MERGE, ALTER) delegate to Spark's
  * own resolution errors. `DELETE FROM name` is deliberately NOT
  * intercepted: it already plans through Spark's DSv2 `SupportsDelete`
  * hook (GraftDeleteSupport) — shadowing a native path with a parser
  * rewrite would hide that surface. Everything routes
  * to the [[graft.api.TrainingData]] machinery, so SQL and Scala callers
  * share one implementation: DELETE/UPDATE are merge-on-read (deletion
  * vectors; `materializeDeletes`/`OPTIMIZE` restores the fast paths),
  * OPTIMIZE is the bin-packing/cluster pass, VACUUM removes unreferenced
  * orphans, RESTORE is one metadata-only commit. Name-addressed ALTERs
  * additionally sync the session catalog's recorded schema, so by-name
  * SELECTs keep seeing the evolved table.
  *
  * Installed through [[graft.functions.GraftSparkExtensions]]
  * (`injectParser`); unrecognized statements delegate verbatim, so the
  * extension is zero-cost for normal SQL. The reference has no SQL or
  * maintenance surface (its core is a parser toolkit) — this lane is
  * part of the beyond-reference table protocol.
  */
object GraftMaintenanceSql {

  /** A maintenance target: the resolved storage root, plus the catalog
    * identifier when the statement addressed it by name (ALTERs use it
    * to keep the catalog's recorded schema in sync).
    */
  private[spark] case class Target(dir: String, ident: Option[TableIdentifier])

  /** How a name-form operand resolved against the session catalog. */
  sealed trait CatalogLookup
  object CatalogLookup {
    /** A graft-provider table with a location — ours. */
    final case class Graft(dir: String, ident: TableIdentifier) extends CatalogLookup
    /** The name EXISTS but is not a graft table (another provider, a
      * temp view, a location-less table): DELEGATE even for graft-only
      * verbs, so another installed parser extension (or Spark's own
      * error) gets to handle its table — never pre-empt someone else's
      * valid statement.
      */
    case object NotGraft extends CatalogLookup
    /** Nothing by that name: graft-only verbs refuse with a targeted
      * message (a typo'd DESCRIBE HISTORY should not surface as a
      * bare Spark syntax error).
      */
    case object Missing extends CatalogLookup
  }

  /** Try `sqlText` as a graft maintenance statement; None = not ours,
    * hand it to the delegate parser. Path-only overload (tests, tools).
    */
  def parse(sqlText: String): Option[LogicalPlan] =
    parse(sqlText, _ => CatalogLookup.Missing)

  /** `resolveCatalog` classifies a name-form table operand (identifier
    * parts) — see [[CatalogLookup]] for how each outcome routes.
    */
  def parse(sqlText: String,
      resolveCatalog: Seq[String] => CatalogLookup)
      : Option[LogicalPlan] = {
    val t = sqlText.trim.stripSuffix(";").trim
    def ref(raw: String, verb: String, graftOnly: Boolean): Option[Target] =
      if (raw.startsWith("'"))
        Some(Target(unquote(raw.substring(1, raw.length - 1)), None))
      else resolveCatalog(identParts(raw)) match {
        case CatalogLookup.Graft(dir, id) => Some(Target(dir, Some(id)))
        case CatalogLookup.NotGraft => None // someone else's table: delegate
        case CatalogLookup.Missing if graftOnly && plainName(raw) =>
          throw new IllegalArgumentException(
            s"$verb: $raw does not name a table in the session catalog " +
              "(graft tables register via CREATE TABLE ... USING " +
              "graft-json/graft-csv/graft-avro) — address an unregistered " +
              s"table by path: $verb '<dir>' ...")
        // Missing but NOT a plain 1–2 part name (backticked parts, path
        // separators, 3-part other-catalog shapes): another extension's
        // identifier convention (e.g. delta.`/path`) — delegate rather
        // than pre-empt its valid statement with a graft error.
        case CatalogLookup.Missing => None
      }
    describeHistoryRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "DESCRIBE HISTORY", graftOnly = true)
        .map(tg => history(tg.dir))
    }.orElse(describeDetailRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "DESCRIBE DETAIL", graftOnly = true)
        .map(tg => detail(tg.dir))
    }).orElse(cloneRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "CLONE TABLE", graftOnly = true).map(tg =>
        clone(tg.dir, unquote(m.group(2)),
          Option(m.group(3)).map(_.toLong)))
    }).orElse(restoreVersionRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "RESTORE TABLE", graftOnly = true)
        .map(tg => restore(tg.dir, Left(m.group(2).toLong)))
    }).orElse(restoreTimestampRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "RESTORE TABLE", graftOnly = true)
        .map(tg => restore(tg.dir, Right(m.group(2).toLong)))
    }).orElse(vacuumRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "VACUUM", graftOnly = true).map { tg =>
        // bound far above any sane retention so hours-to-millis can
        // never overflow into "negative = immediate reclaim" (parse
        // overflow clamps to the same friendly refusal)
        val retain = Option(m.group(2)).map(g =>
          try g.toLong catch { case _: NumberFormatException => Long.MaxValue })
        retain.foreach(h => require(h <= 1000000L,
          s"VACUUM RETAIN: ${m.group(2)} hours is not a plausible retention (max 1000000)"))
        vacuum(tg.dir, dryRun = m.group(3) != null, retainHours = retain)
      }
    }).orElse(optimizeRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "OPTIMIZE", graftOnly = true).map(tg =>
        optimize(tg.dir, Option(m.group(2)).map(_.trim),
          Option(m.group(3)).map(_.split(',').toSeq
            .map(c => stripTicks(c.trim)).filter(_.nonEmpty)).getOrElse(Nil)))
    }).orElse(deleteRe.findFirstMatchIn(t).map { m =>
      delete(unquote(m.group(1)), m.group(2).trim)
    }).orElse(updateRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "UPDATE", graftOnly = false).map { tg =>
        val (setPart, wherePart) = splitSetWhere(m.group(2))
        update(tg.dir, parseAssignments(setPart), wherePart)
      }
    }).orElse(mergeRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "MERGE INTO", graftOnly = false).map(tg =>
        merge(tg.dir, m.group(2).trim,
          m.group(3).split(',').toSeq.map(c => stripTicks(c.trim)).filter(_.nonEmpty)))
    }).orElse(alterAddRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "ALTER TABLE", graftOnly = false).map(tg =>
        alterAdd(tg, stripTicks(m.group(2)), m.group(3).trim))
    }).orElse(alterRenameRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "ALTER TABLE", graftOnly = false).map(tg =>
        alterRename(tg, stripTicks(m.group(2)), stripTicks(m.group(3))))
    }).orElse(alterDropRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "ALTER TABLE", graftOnly = false).map(tg =>
        alterDrop(tg, stripTicks(m.group(2))))
    }).orElse(reorgRe.findFirstMatchIn(t).flatMap { m =>
      ref(m.group(1), "REORG TABLE", graftOnly = true).map(tg => reorg(tg.dir))
    })
  }

  /** Session-catalog resolver for name-form operands: a 1–2 part
    * (optionally `spark_catalog`-qualified) identifier naming a
    * graft-provider table resolves to its storage location. Temp views,
    * non-graft providers, and location-less tables classify NotGraft
    * (delegate); an unresolvable name classifies Missing.
    */
  def catalogResolver(session: SparkSession)(
      parts0: Seq[String]): CatalogLookup = {
    val parts =
      if (parts0.length == 3 && parts0.head.equalsIgnoreCase("spark_catalog"))
        parts0.tail
      else parts0
    val ident = parts match {
      case Seq(t1) => TableIdentifier(t1)
      case Seq(db, t1) => TableIdentifier(t1, Some(db))
      // a 3-part name under a DIFFERENT catalog is someone else's table
      // — delegate, never pre-empt another extension's valid statement
      case _ => return CatalogLookup.NotGraft
    }
    val cat = session.sessionState.catalog
    // a temp view shadowing the name is never a maintenance target
    if (cat.getLocalOrGlobalTempView(parts).isDefined) return CatalogLookup.NotGraft
    if (!cat.tableExists(ident)) return CatalogLookup.Missing
    val meta = cat.getTableMetadata(ident)
    val isGraft = meta.provider.exists(p =>
      stripTicks(p.trim).toLowerCase(java.util.Locale.ROOT).startsWith("graft-"))
    if (!isGraft) CatalogLookup.NotGraft
    else meta.storage.locationUri match {
      case Some(loc) =>
        val dir =
          if (loc.getScheme == null || loc.getScheme == "file") loc.getPath
          else loc.toString
        CatalogLookup.Graft(dir, ident)
      case None => CatalogLookup.NotGraft
    }
  }

  /** THE name-or-path resolution seam for string table refs (TVFs, APIs
    * taking one argument that may be either): a ref carrying a path
    * separator is a storage root verbatim; anything else resolves through
    * the session catalog with full identifier splitting (backticks,
    * `spark_catalog` qualification — everything [[catalogResolver]]
    * gives the SQL verbs). New surfaces route here so catalog-name
    * support is inherited, never re-implemented.
    */
  def resolveRef(spark: SparkSession, ref: String, surface: String): String =
    if (ref.contains('/') || ref.contains('\\')) ref
    else catalogResolver(spark)(identParts(ref)) match {
      case CatalogLookup.Graft(d, _) => d
      case _ => throw new IllegalArgumentException(
        s"$surface: '$ref' is not a graft-provider table in the session " +
          "catalog — pass the table path instead")
    }

  /** A "plain" catalog name — 1–2 bare dotted parts, no backticks, no
    * path separators. Only these earn the targeted typo refusal on a
    * Missing lookup; anything fancier (delta.`/path` and friends) is
    * plausibly another extension's convention and must delegate.
    */
  private def plainName(raw: String): Boolean =
    !raw.contains('`') && {
      val parts = identParts(raw)
      parts.length <= 2 && parts.forall(p =>
        !p.contains('/') && !p.contains('\\'))
    }

  /** Split a (validated-by-regex) dotted identifier into parts, honoring
    * backticks.
    */
  private def identParts(raw: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < raw.length) {
      if (raw.charAt(i) == '`') {
        val j = raw.indexOf('`', i + 1)
        out += raw.substring(i + 1, j)
        i = j + 1
        if (i < raw.length && raw.charAt(i) == '.') i += 1
      } else {
        val j = raw.indexOf('.', i)
        if (j < 0) { out += raw.substring(i); i = raw.length }
        else { out += raw.substring(i, j); i = j + 1 }
      }
    }
    out.result()
  }

  // path literal: single-quoted, '' escapes a quote
  private val P = """'((?:[^']|'')+)'"""
  // table operand: quoted path OR catalog identifier (1–3 dotted parts,
  // each bare or backticked) — ONE capture group either way, so verb
  // regexes keep their group numbering
  private val IPART = """(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"""
  private val R = s"""('(?:[^']|'')+'|$IPART(?:\\.$IPART){0,2})"""
  private val describeHistoryRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$R\\s*$$""".r
  private val describeDetailRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$R\\s*$$""".r
  // deep clone: source by path or name; target is a PATH literal (a
  // fresh directory — a name would need a managed location to invent)
  private val cloneRe =
    s"""(?is)^\\s*CLONE\\s+TABLE\\s+$R\\s+TO\\s+$P(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*$$""".r
  private val restoreVersionRe =
    s"""(?is)^\\s*RESTORE\\s+TABLE\\s+$R\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*$$""".r
  private val restoreTimestampRe =
    s"""(?is)^\\s*RESTORE\\s+TABLE\\s+$R\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)\\s*$$""".r
  private val vacuumRe =
    s"""(?is)^\\s*VACUUM\\s+$R(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*$$""".r
  private val optimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$R(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*$$""".r
  private val deleteRe =
    s"""(?is)^\\s*DELETE\\s+FROM\\s+$P\\s+WHERE\\s+(.+)$$""".r
  private val updateRe =
    s"""(?is)^\\s*UPDATE\\s+$R\\s+SET\\s+(.+)$$""".r
  // upsert shape: whenMatched whole-row replace + whenNotMatched insert —
  // the streaming-merge contract TrainingData.upsert implements; the
  // richer clause grammar stays with the API
  private val mergeRe =
    s"""(?is)^\\s*MERGE\\s+INTO\\s+$R\\s+USING\\s+\\((.+)\\)\\s+ON\\s+\\(([^)]+)\\)\\s*$$""".r
  private val alterAddRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$R\\s+ADD\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+(.+)$$""".r
  private val alterRenameRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$R\\s+RENAME\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+TO\\s+(`[^`]+`|\\w+)\\s*$$""".r
  private val alterDropRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$R\\s+DROP\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s*$$""".r
  private val reorgRe =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$R\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*$$""".r

  private def unquote(s: String): String = s.replace("''", "'")
  private def stripTicks(s: String): String = s.stripPrefix("`").stripSuffix("`")

  /** Index of the first top-level (outside quotes/backticks/parens)
    * occurrence of the keyword, as a whole word, case-insensitive; -1
    * when absent.
    */
  private def topLevelKeyword(s: String, kw: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => // string literal ('' escapes)
          i += 1
          while (i < s.length && (s.charAt(i) != '\'' ||
              (i + 1 < s.length && s.charAt(i + 1) == '\'' && { i += 1; true })))
            i += 1
        case '`' =>
          i += 1
          while (i < s.length && s.charAt(i) != '`') i += 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case c if depth == 0 && (c.toLower == kw.charAt(0).toLower) =>
          if (s.regionMatches(true, i, kw, 0, kw.length) &&
              (i == 0 || !isWordChar(s.charAt(i - 1))) &&
              (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length))))
            return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Split on top-level commas (quote/backtick/paren aware). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && (s.charAt(i) != '\'' ||
              (i + 1 < s.length && s.charAt(i + 1) == '\'' && { i += 1; true })))
            i += 1
        case '`' =>
          i += 1
          while (i < s.length && s.charAt(i) != '`') i += 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def splitSetWhere(rest: String): (String, String) = {
    val w = topLevelKeyword(rest, "WHERE")
    require(w > 0,
      "graft UPDATE requires a WHERE clause (an unconditioned UPDATE " +
        "rewrites the whole table — say WHERE true explicitly via the " +
        "TrainingData API if that is really intended)")
    (rest.substring(0, w).trim, rest.substring(w + "WHERE".length).trim)
  }

  private def parseAssignments(setPart: String): Map[String, String] = {
    val pairs = splitTopLevel(setPart).map { a =>
      // locate the first top-level '=' (the assignment; the value side
      // may contain its own '=' inside CASE/parens/strings)
      val idx = {
        var depth = 0
        var i = 0
        var found = -1
        while (found < 0 && i < a.length) {
          a.charAt(i) match {
            case '\'' =>
              i += 1
              while (i < a.length && (a.charAt(i) != '\'' ||
                  (i + 1 < a.length && a.charAt(i + 1) == '\'' && { i += 1; true })))
                i += 1
            case '`' =>
              i += 1
              while (i < a.length && a.charAt(i) != '`') i += 1
            case '(' | '[' => depth += 1
            case ')' | ']' => depth -= 1
            case '=' if depth == 0 => found = i
            case _ => ()
          }
          i += 1
        }
        found
      }
      require(idx > 0, s"malformed SET assignment: '$a'")
      (stripTicks(a.substring(0, idx).trim), a.substring(idx + 1).trim)
    }
    // standard SQL rejects duplicate assignment targets; .toMap would
    // silently keep the last one
    val dup = pairs.groupBy(_._1).collect { case (c, as) if as.length > 1 => c }
    require(dup.isEmpty,
      s"UPDATE SET assigns column(s) ${dup.mkString("'", "', '", "'")} more than once")
    pairs.toMap
  }

  // ------------------------------------------------------------ resolution

  /** Resolve (data DDL, graft format) for a logged table root: the
    * recorded schema minus the layout's k=v columns, the format from the
    * live files' extensions (falling back to the log's write history for
    * an emptied table; None = the log never added a data file). Loud on
    * untracked/logless directories — maintenance SQL must never guess a
    * schema.
    */
  private[spark] def resolveTable(spark: SparkSession, dir: String)
      : (String, Option[String]) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = GraftCommitLog.versions(fs, root)
    require(vs.nonEmpty,
      s"maintenance SQL addresses graft-logged tables; no commit log under $dir")
    val listing = GraftSources.resolvePartitioned(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir)))
    val ddl = recordedDataDdl(spark, fs, root, vs.max, listing, dir)
    val live = GraftCommitLog.liveFilesAsOf(fs, root, vs.max)
    val format = resolveFormat(dir, live,
      () => vs.iterator.flatMap(v =>
        GraftCommitLog.entryActionsAwait(fs, root, v).iterator
          .filter(_.add).map(_.path)))
    (ddl, format)
  }

  /** The recorded DATA DDL: the schema-tracked log schema as of
    * `version` minus the layout's k=v columns (matched with the session
    * resolver, so a case-drifted layout column neither duplicates nor —
    * under caseSensitive=true — drops a legitimately distinct field).
    * Loud on untracked tables: maintenance SQL never guesses a schema.
    */
  private def recordedDataDdl(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
      version: Long, listing: GraftSources.Listing, dir: String): String = {
    val recorded = GraftCommitLog.schemaAsOfStrict(fs, root, version).getOrElse(
      throw new IllegalArgumentException(
        s"$dir is not schema-tracked (its log predates schema tracking) — " +
          "maintenance SQL resolves the table schema from the commit log; " +
          "use the TrainingData API with an explicit schema instead"))
    val resolver = spark.sessionState.conf.resolver
    StructType(recorded.fields.filterNot(f =>
      listing.partCols.exists(resolver(_, f.name)))).toDDL
  }

  /** The table's graft format from the live files' extensions, falling
    * back to every file the log EVER added (lazily — an emptied table
    * has no live files but still a format lane, so a committed
    * maintenance entry lands under the real one). None = the log never
    * recorded a data file; mixed formats refuse loudly.
    */
  private def resolveFormat(dir: String, live: Iterable[String],
      everAdded: () => Iterator[String]): Option[String] = {
    def stripCodec(n0: String): String = {
      val n = n0.toLowerCase(java.util.Locale.ROOT)
      Seq(".gz", ".gzip", ".zst", ".zstd").foldLeft(n)((a, s) => a.stripSuffix(s))
    }
    def fmtOf(n0: String): Option[String] = {
      val n = stripCodec(n0)
      if (n.endsWith(".json") || n.endsWith(".jsonl")) Some("graft-json")
      else if (n.endsWith(".csv") || n.endsWith(".tsv")) Some("graft-csv")
      else if (n.endsWith(".avro")) Some("graft-avro")
      else None
    }
    val fmts: Set[String] = {
      val fromLive = live.iterator.flatMap(fmtOf).toSet
      if (fromLive.nonEmpty) fromLive
      else everAdded().flatMap(fmtOf).toSet
    }
    fmts.toList match {
      case Nil => None // the log never recorded a data file
      case f :: Nil => Some(f)
      case many => throw new IllegalArgumentException(
        s"mixed data formats under $dir (${many.sorted.mkString(", ")}) — " +
          "maintenance SQL needs one; use the TrainingData API per format")
    }
  }

  private def attrs(st: StructType): Seq[Attribute] =
    st.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  // -------------------------------------------------------------- commands

  private def history(dir: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("ts_millis", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("n_adds", LongType, nullable = false),
      StructField("n_removes", LongType, nullable = false),
      StructField("n_dvs", LongType, nullable = false),
      StructField("schema_recorded", LongType, nullable = false)))),
      s => graft.api.TrainingData.tableHistory(s, dir).collect().toSeq)

  /** `DESCRIBE DETAIL` — the Delta table-metadata verb: one row of
    * format / location / latest version / live-file count / attached
    * deletion vectors / live bytes / partition columns / recorded data
    * DDL. Metadata-only: the live set folds from the log and byte sizes
    * come from the SAME directory walk planning already does — no data
    * file is opened.
    */
  private def detail(dir: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("location", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("num_files", LongType, nullable = false),
      StructField("num_deletion_vectors", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("partition_columns", StringType, nullable = false),
      StructField("schema_ddl", StringType, nullable = false)))),
      s => {
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        // ONE version listing, ONE log fold, ONE directory walk — the
        // whole point of this verb is to be cheap on a huge table, so
        // the DDL/format derive from the same resolution (not a second
        // resolveTable pass repeating all three)
        val vs = GraftCommitLog.versions(fs, root)
        require(vs.nonEmpty,
          s"DESCRIBE DETAIL addresses graft-logged tables; no commit log under $dir")
        val state = GraftCommitLog.liveStateAsOf(fs, root, vs.max)
        val listing = GraftSources.resolvePartitioned(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            java.util.Map.of("path", dir)))
        val ddl = recordedDataDdl(s, fs, root, vs.max, listing, dir)
        val live = state.keySet
        val format = resolveFormat(dir, live,
          () => vs.iterator.flatMap(v =>
            GraftCommitLog.entryActionsAwait(fs, root, v).iterator
              .filter(_.add).map(_.path)))
        val rootQ = fs.makeQualified(root).toString
        val size = listing.files.iterator
          .filter { f =>
            val rel = f.path.stripPrefix(rootQ).stripPrefix("/")
            live.contains(rel)
          }.map(_.len).sum
        Seq(Row(format.getOrElse("none"), dir, vs.max, state.size.toLong,
          state.valuesIterator.count(_ != null).toLong, size,
          listing.partCols.mkString(","), ddl))
      })

  /** `CLONE TABLE <src> TO '<dst>' [VERSION AS OF n]` — the deep-clone
    * corpus fork ([[graft.api.TrainingData.cloneTable]]): bytes copy on
    * executors, one fresh version-0 commit lands at the target.
    */
  private def clone(src: String, dst: String,
      versionAsOf: Option[Long]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(
        graft.api.TrainingData.cloneTable(s, src, dst, versionAsOf))))

  private def restore(dir: String, target: Either[Long, Long]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(target match {
        case Left(v) => graft.api.TrainingData.restoreTable(s, dir, v)
        case Right(ts) => graft.api.TrainingData.restoreTableToTimestamp(s, dir, ts)
      })))

  /** Plain VACUUM = uncommitted-orphan cleanup; `RETAIN n HOURS` runs
    * BOTH sweeps behind the same age horizon — the retention reclaim of
    * RETIRED files (expireRetired) plus the orphan sweep gated on file
    * modification time, so aborted-write debris does not accumulate for
    * users who only ever run the RETAIN form (Delta's VACUUM semantics:
    * one verb, both classes, one retention horizon).
    */
  private def vacuum(dir: String, dryRun: Boolean,
      retainHours: Option[Long]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("path", StringType, nullable = false)))),
      s => (retainHours match {
        case Some(h) =>
          val ms = h * 3600000L
          (graft.api.TrainingData.expireRetired(s, dir,
            dryRun = dryRun, retainMillis = ms) ++
            graft.api.TrainingData.vacuumOrphans(s, dir,
              dryRun = dryRun, retainMillis = ms)).distinct.sorted
        case None => graft.api.TrainingData.vacuumOrphans(s, dir, dryRun = dryRun)
      }).map(Row(_)))

  private def optimize(dir: String, where: Option[String],
      zorderBy: Seq[String]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_rewritten", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(format.fold(0L)(f => // formatless table holds no files
          graft.api.TrainingData.optimizeTable(s, dir, ddl,
            clusterBy = zorderBy, format = f,
            where = where.orNull).size.toLong)))
      })

  private def delete(dir: String, predicate: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_changed", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(format.fold(0L)(f => // formatless table holds no rows
          graft.api.TrainingData.deleteWhereDV(
            s, dir, ddl, predicate, format = f).size.toLong)))
      })

  private def update(dir: String, set: Map[String, String],
      predicate: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_changed", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(format.fold(0L)(f => // formatless table holds no rows
          graft.api.TrainingData.updateWhereDV(
            s, dir, ddl, predicate, set, format = f).size.toLong)))
      })

  /** Upsert merge (whenMatched replace ∪ whenNotMatched insert — the
    * TrainingData.upsert contract): the USING query text is captured at
    * parse and run against the session at execution, so CTEs/joins/
    * views all work as the source.
    */
  private def merge(dir: String, sourceSql: String,
      keyCols: Seq[String]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("merged_rows", LongType, nullable = false)))),
      s => {
        val (ddl, format0) = resolveTable(s, dir)
        // MERGE must APPEND the not-matched rows, so an empty table with
        // no write history has no lane to land them in — refuse loudly
        val format = format0.getOrElse(throw new IllegalArgumentException(
          s"MERGE INTO $dir: the table's log never recorded a data file, " +
            "so no format lane exists to write into — use " +
            "TrainingData.upsert with an explicit format"))
        // PIN the source before touching the target: a self-referencing
        // or non-deterministic USING query must merge and report ONE
        // consistent snapshot (upsert consumes it twice — delete-matching
        // then append — and the count must be the pre-merge row count)
        val src = s.sql(sourceSql)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = src.count()
          graft.api.TrainingData.upsert(s, dir, ddl, src, keyCols, format = format)
          Seq(Row(n))
        } finally src.unpersist()
      })

  /** After a name-addressed ALTER, mirror the log's recorded schema into
    * the catalog entry (data columns only; the partition schema is the
    * catalog's own) so by-name SELECTs resolve the evolved shape.
    * Path-addressed ALTERs leave the catalog alone — there may be no
    * entry at all, and if there is, its declared schema is the
    * registrant's contract.
    */
  private def syncCatalog(s: SparkSession, tg: Target): Unit = tg.ident.foreach { id =>
    graft.api.TrainingData.tableSchema(s, tg.dir).foreach { recorded =>
      val cat = s.sessionState.catalog
      val meta = cat.getTableMetadata(id)
      // the session resolver (case-insensitive by default, exact under
      // spark.sql.caseSensitive=true), or a case-drifted layout column
      // would duplicate — or a legitimately distinct one vanish
      val resolver = s.sessionState.conf.resolver
      val dataFields = recorded.fields.filterNot(f =>
        meta.partitionColumnNames.exists(resolver(_, f.name)))
      cat.alterTable(meta.copy(
        schema = StructType(dataFields ++ meta.partitionSchema.fields)))
    }
  }

  private def alterAdd(tg: Target, colName: String, ddlType: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => {
        val v = graft.api.TrainingData.alterTableAddColumn(s, tg.dir, colName, ddlType)
        syncCatalog(s, tg)
        Seq(Row(v))
      })

  private def alterRename(tg: Target, from: String, to: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => {
        val v = graft.api.TrainingData.alterTableRenameColumn(s, tg.dir, from, to)
        syncCatalog(s, tg)
        Seq(Row(v))
      })

  private def alterDrop(tg: Target, colName: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => {
        val v = graft.api.TrainingData.alterTableDropColumn(s, tg.dir, colName)
        syncCatalog(s, tg)
        Seq(Row(v))
      })

  /** Delta's REORG TABLE ... APPLY (PURGE): rewrite every vector-carrying
    * file without its masked rows — restores the metadata/split fast
    * paths merge-on-read deletes trade away.
    */
  private def reorg(dir: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_rewritten", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(format.fold(0L)(f => // formatless table holds no files
          graft.api.TrainingData.materializeDeletes(
            s, dir, ddl, format = f).size.toLong)))
      })
}

/** One maintenance statement as an eagerly-executed command plan: `body`
  * runs against the session when the `spark.sql(...)` result
  * materializes (the standard RunnableCommand contract — external Rows,
  * converted by the command exec).
  */
case class GraftMaintenanceCommand(
    override val output: Seq[Attribute],
    @transient body: SparkSession => Seq[Row])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = body(spark)
}

/** The injected session parser: graft maintenance statements short-
  * circuit to [[GraftMaintenanceSql]]; everything else — including every
  * identifier/type/expression parse — delegates verbatim, so the
  * extension is invisible to normal SQL.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenanceSql.parse(sqlText,
        GraftMaintenanceSql.catalogResolver(session))
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
