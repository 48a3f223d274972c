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
  *   DESCRIBE HISTORY '<path>'
  *   RESTORE TABLE '<path>' TO VERSION AS OF <n>
  *   RESTORE TABLE '<path>' TO TIMESTAMP AS OF <epochMillis>
  *   OPTIMIZE '<path>' [WHERE <partition predicate>] [ZORDER BY (c, ...)]
  *   VACUUM '<path>' [DRY RUN]
  *   DELETE FROM '<path>' WHERE <predicate>
  *   UPDATE '<path>' SET c = <expr> [, ...] WHERE <predicate>
  *   MERGE INTO '<path>' USING (<query>) ON (k [, ...])
  *   ALTER TABLE '<path>' ADD COLUMN c <TYPE>
  *   ALTER TABLE '<path>' RENAME COLUMN a TO b
  *   ALTER TABLE '<path>' DROP COLUMN c
  *   REORG TABLE '<path>' APPLY (PURGE)
  * }}}
  *
  * Tables are addressed by PATH (single-quoted, `''` escapes a quote):
  * the table's schema resolves from its commit log's recorded schema and
  * its data format from the live files — exactly the tables maintenance
  * applies to (only graft batch sinks write the log). Everything routes
  * to the [[graft.api.TrainingData]] machinery, so SQL and Scala callers
  * share one implementation: DELETE/UPDATE are merge-on-read (deletion
  * vectors; `materializeDeletes`/`OPTIMIZE` restores the fast paths),
  * OPTIMIZE is the bin-packing/cluster pass, VACUUM removes unreferenced
  * orphans, RESTORE is one metadata-only commit.
  *
  * Installed through [[graft.functions.GraftSparkExtensions]]
  * (`injectParser`); unrecognized statements delegate verbatim, so the
  * extension is zero-cost for normal SQL. The reference has no SQL or
  * maintenance surface (its core is a parser toolkit) — this lane is
  * part of the beyond-reference table protocol.
  */
object GraftMaintenanceSql {

  /** Try `sqlText` as a graft maintenance statement; None = not ours,
    * hand it to the delegate parser.
    */
  def parse(sqlText: String): Option[LogicalPlan] = {
    val t = sqlText.trim.stripSuffix(";").trim
    describeHistoryRe.findFirstMatchIn(t).map { m =>
      history(unquote(m.group(1)))
    }.orElse(restoreVersionRe.findFirstMatchIn(t).map { m =>
      restore(unquote(m.group(1)), Left(m.group(2).toLong))
    }).orElse(restoreTimestampRe.findFirstMatchIn(t).map { m =>
      restore(unquote(m.group(1)), Right(m.group(2).toLong))
    }).orElse(vacuumRe.findFirstMatchIn(t).map { m =>
      vacuum(unquote(m.group(1)), dryRun = m.group(2) != null)
    }).orElse(optimizeRe.findFirstMatchIn(t).map { m =>
      optimize(unquote(m.group(1)), Option(m.group(2)).map(_.trim),
        Option(m.group(3)).map(_.split(',').toSeq
          .map(c => stripTicks(c.trim)).filter(_.nonEmpty)).getOrElse(Nil))
    }).orElse(deleteRe.findFirstMatchIn(t).map { m =>
      delete(unquote(m.group(1)), m.group(2).trim)
    }).orElse(updateRe.findFirstMatchIn(t).map { m =>
      val (setPart, wherePart) = splitSetWhere(m.group(2))
      update(unquote(m.group(1)), parseAssignments(setPart), wherePart)
    }).orElse(mergeRe.findFirstMatchIn(t).map { m =>
      merge(unquote(m.group(1)), m.group(2).trim,
        m.group(3).split(',').toSeq.map(c => stripTicks(c.trim)).filter(_.nonEmpty))
    }).orElse(alterAddRe.findFirstMatchIn(t).map { m =>
      alterAdd(unquote(m.group(1)), stripTicks(m.group(2)), m.group(3).trim)
    }).orElse(alterRenameRe.findFirstMatchIn(t).map { m =>
      alterRename(unquote(m.group(1)), stripTicks(m.group(2)), stripTicks(m.group(3)))
    }).orElse(alterDropRe.findFirstMatchIn(t).map { m =>
      alterDrop(unquote(m.group(1)), stripTicks(m.group(2)))
    }).orElse(reorgRe.findFirstMatchIn(t).map { m =>
      reorg(unquote(m.group(1)))
    })
  }

  // path literal: single-quoted, '' escapes a quote
  private val P = """'((?:[^']|'')+)'"""
  private val describeHistoryRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$P\\s*$$""".r
  private val restoreVersionRe =
    s"""(?is)^\\s*RESTORE\\s+TABLE\\s+$P\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*$$""".r
  private val restoreTimestampRe =
    s"""(?is)^\\s*RESTORE\\s+TABLE\\s+$P\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)\\s*$$""".r
  private val vacuumRe =
    s"""(?is)^\\s*VACUUM\\s+$P(\\s+DRY\\s+RUN)?\\s*$$""".r
  private val optimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$P(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*$$""".r
  private val deleteRe =
    s"""(?is)^\\s*DELETE\\s+FROM\\s+$P\\s+WHERE\\s+(.+)$$""".r
  private val updateRe =
    s"""(?is)^\\s*UPDATE\\s+$P\\s+SET\\s+(.+)$$""".r
  // upsert shape: whenMatched whole-row replace + whenNotMatched insert —
  // the streaming-merge contract TrainingData.upsert implements; the
  // richer clause grammar stays with the API
  private val mergeRe =
    s"""(?is)^\\s*MERGE\\s+INTO\\s+$P\\s+USING\\s+\\((.+)\\)\\s+ON\\s+\\(([^)]+)\\)\\s*$$""".r
  private val alterAddRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+(.+)$$""".r
  private val alterRenameRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+RENAME\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+TO\\s+(`[^`]+`|\\w+)\\s*$$""".r
  private val alterDropRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s*$$""".r
  private val reorgRe =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$P\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*$$""".r

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

  /** Resolve (data DDL, graft format, partition columns) for a logged
    * table root: the recorded schema minus the layout's k=v columns, the
    * format from the live files' extensions. Loud on untracked/logless
    * directories — maintenance SQL must never guess a schema.
    */
  private def resolveTable(spark: SparkSession, dir: String)
      : (String, String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = GraftCommitLog.versions(fs, root)
    require(vs.nonEmpty,
      s"maintenance SQL addresses graft-logged tables; no commit log under $dir")
    val recorded = GraftCommitLog.schemaAsOfStrict(fs, root, vs.max).getOrElse(
      throw new IllegalArgumentException(
        s"$dir is not schema-tracked (its log predates schema tracking) — " +
          "maintenance SQL resolves the table schema from the commit log; " +
          "use the TrainingData API with an explicit schema instead"))
    val listing = GraftSources.resolvePartitioned(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir)))
    val ddl = StructType(
      recorded.fields.filterNot(f => listing.partCols.contains(f.name))).toDDL
    val live = GraftCommitLog.liveFilesAsOf(fs, root, vs.max)
    def stripCodec(n0: String): String = {
      val n = n0.toLowerCase(java.util.Locale.ROOT)
      Seq(".gz", ".gzip", ".zst", ".zstd").foldLeft(n)((a, s) => a.stripSuffix(s))
    }
    val fmts = live.map(stripCodec).flatMap { n =>
      if (n.endsWith(".json") || n.endsWith(".jsonl")) Some("graft-json")
      else if (n.endsWith(".csv") || n.endsWith(".tsv")) Some("graft-csv")
      else if (n.endsWith(".avro")) Some("graft-avro")
      else None
    }
    val format =
      if (fmts.isEmpty) "graft-json" // empty table: no rows to touch anyway
      else {
        require(fmts.size == 1,
          s"mixed data formats under $dir (${fmts.mkString(", ")}) — " +
            "maintenance SQL needs one; use the TrainingData API per format")
        fmts.head
      }
    (ddl, format)
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

  private def restore(dir: String, target: Either[Long, Long]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(target match {
        case Left(v) => graft.api.TrainingData.restoreTable(s, dir, v)
        case Right(ts) => graft.api.TrainingData.restoreTableToTimestamp(s, dir, ts)
      })))

  private def vacuum(dir: String, dryRun: Boolean): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("path", StringType, nullable = false)))),
      s => graft.api.TrainingData.vacuumOrphans(s, dir, dryRun = dryRun)
        .map(Row(_)))

  private def optimize(dir: String, where: Option[String],
      zorderBy: Seq[String]): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_rewritten", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(graft.api.TrainingData.optimizeTable(s, dir, ddl,
          clusterBy = zorderBy, format = format,
          where = where.orNull).size.toLong))
      })

  private def delete(dir: String, predicate: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_changed", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(graft.api.TrainingData.deleteWhereDV(
          s, dir, ddl, predicate, format = format).size.toLong))
      })

  private def update(dir: String, set: Map[String, String],
      predicate: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_changed", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(graft.api.TrainingData.updateWhereDV(
          s, dir, ddl, predicate, set, format = format).size.toLong))
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
        val (ddl, format) = resolveTable(s, dir)
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

  private def alterAdd(dir: String, colName: String, ddlType: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(
        graft.api.TrainingData.alterTableAddColumn(s, dir, colName, ddlType))))

  private def alterRename(dir: String, from: String, to: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(
        graft.api.TrainingData.alterTableRenameColumn(s, dir, from, to))))

  private def alterDrop(dir: String, colName: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("committed_version", LongType, nullable = false)))),
      s => Seq(Row(
        graft.api.TrainingData.alterTableDropColumn(s, dir, colName))))

  /** Delta's REORG TABLE ... APPLY (PURGE): rewrite every vector-carrying
    * file without its masked rows — restores the metadata/split fast
    * paths merge-on-read deletes trade away.
    */
  private def reorg(dir: String): LogicalPlan =
    GraftMaintenanceCommand(attrs(StructType(Seq(
      StructField("files_rewritten", LongType, nullable = false)))),
      s => {
        val (ddl, format) = resolveTable(s, dir)
        Seq(Row(graft.api.TrainingData.materializeDeletes(
          s, dir, ddl, format = format).size.toLong))
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
    GraftMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
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
