package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.sources.{CloudLocation, ExecSource, WebSink, WebSource}

/** `CREATE [READABLE|WRITABLE] EXTERNAL [WEB] TABLE` — the reference's
  * signature load/unload DDL (grammar `src/backend/parser/gram.y`
  * CreateExternalStmt; dispatch of the LOCATION protocols in
  * `src/backend/access/external/url.c:37-47`). Every production
  * Greengage ETL script starts here, so the statement router accepts
  * the full common form:
  *
  * {{{
  * CREATE EXTERNAL TABLE t (a int, b text)
  *   LOCATION ('gpfdist://h1:8080/f1', 'gpfdist://h2:8080/f2')
  *   FORMAT 'CSV' (DELIMITER '|' NULL '' HEADER)
  *   LOG ERRORS SEGMENT REJECT LIMIT 10 ROWS;
  * CREATE EXTERNAL WEB TABLE u (...) EXECUTE 'cmd' ON 4 FORMAT 'TEXT';
  * CREATE WRITABLE EXTERNAL TABLE w (...)
  *   LOCATION ('gpfdist://h:8080/out') FORMAT 'CSV';
  * }}}
  *
  * Spark mapping, per protocol: `file://` → the SREH PERMISSIVE csv
  * scan ([[Sreh.readCsvPaths]]); `gpfdist://`/`http(s)://` →
  * [[WebSource]] (one segment per URL, gpfdist IS http); `EXECUTE` →
  * [[ExecSource]] (one process per segment). A READABLE table
  * registers the parsed rows as a temp view (the reject-limit check
  * runs on the first scan, and the cached snapshot is what queries
  * see); `LOG ERRORS` additionally registers `<name>_errors` — the
  * queryable analog of `gp_read_error_log('<name>')`. A WRITABLE
  * table registers a sink spec; `INSERT INTO w SELECT ...` through
  * [[graft.Graft.execute]] streams partitions to the target
  * ([[WebSink]] POST per partition / csv append / program stdin).
  */
object ExternalTable {

  final case class ExtSpec(
      name: String,
      writable: Boolean,
      columns: Seq[(String, String)], // (name, Spark type)
      locations: Seq[String], // empty for the EXECUTE form
      execCmd: Option[String],
      segments: Int,
      format: String, // TEXT | CSV
      delimiter: String,
      nullToken: String,
      header: Boolean,
      logErrors: Boolean,
      rejectRows: Option[Long],
      rejectPercent: Option[Double],
      formatter: Option[String] = None, // FORMAT 'CUSTOM' (formatter=...)
      fwWidths: Seq[(String, Int)] = Nil,
      preserveBlanks: Boolean = false,
      lineDelim: String = "\n",
      fwNull: Option[String] = None) {
    def schema: StructType =
      StructType.fromDDL(columns.map { case (n, t) => s"$n $t" }.mkString(", "))
  }

  /** Writable sink registry: INSERT INTO routes here, not to a view. */
  private val writables = new ConcurrentHashMap[String, ExtSpec]()

  def isWritable(name: String): Boolean =
    writables.containsKey(name.replace("\"", ""))

  private val headRe =
    ("(?is)^\\s*CREATE\\s+(READABLE\\s+|WRITABLE\\s+)?EXTERNAL\\s+" +
      "(WEB\\s+)?(TEMP\\s+|TEMPORARY\\s+)?TABLE\\s+([\\w.\"]+)\\s*(.*)$").r

  private def quoted(s: String): Seq[String] =
    "'([^']*+(?:''[^']*+)*+)'".r.findAllMatchIn(s).map(_.group(1).replace("''", "'")).toSeq

  def parse(ddl: String): ExtSpec = {
    val sql = ddl.trim.stripSuffix(";").trim
    val m = headRe.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE EXTERNAL TABLE: $ddl"))
    val writable = Option(m.group(1)).exists(_.trim.equalsIgnoreCase("WRITABLE"))
    val name = m.group(4).replace("\"", "")
    var rest = m.group(5).trim
    require(rest.startsWith("("), s"external table needs a column list: $ddl")
    val (colBlock, after) = GreengageDdl.balanced(rest, 0)
    rest = rest.substring(after).trim
    val columns = GreengageDdl.splitTop(colBlock).map { cdef =>
      // (LIKE t) column shorthand (gram.y TableLikeClause): resolved
      // against the catalog here — external tables snapshot eagerly
      if ("(?i)^LIKE\\s".r.findFirstIn(cdef.trim).isDefined)
        ("__like__", cdef.trim.split("\\s+")(1).replace("\"", ""))
      else {
        val parts = cdef.trim.split("\\s+", 2)
        require(parts.length == 2, s"cannot parse column def: '$cdef'")
        (parts(0).replace("\"", ""), GreengageDdl.mapType(parts(1)))
      }
    }

    // LOCATION ('url', ...) | EXECUTE 'cmd' [ON ...]
    var locations = Seq.empty[String]
    var execCmd: Option[String] = None
    var segments = 0
    val locRe = "(?is)\\bLOCATION\\s*\\(".r
    val execRe = "(?is)\\bEXECUTE\\s+'([^']*+(?:''[^']*+)*+)'(\\s+ON\\s+(ALL|MASTER|HOST|SEGMENT\\s+\\d+|\\d+))?".r
    locRe.findFirstMatchIn(rest) match {
      case Some(l) =>
        val (urls, a2) = GreengageDdl.balanced(rest, l.end - 1)
        locations = quoted(urls)
        require(locations.nonEmpty, s"empty LOCATION list: $ddl")
        segments = locations.length
        rest = (rest.substring(0, l.start) + " " + rest.substring(a2)).trim
      case None =>
        val e = execRe.findFirstMatchIn(rest).getOrElse(throw
          new IllegalArgumentException(s"external table needs LOCATION or EXECUTE: $ddl"))
        execCmd = Some(e.group(1).replace("''", "'"))
        // ON ALL/MASTER/HOST → one segment per default-parallelism slot
        // (capped); ON [SEGMENT] n → exactly n
        segments = Option(e.group(3)).map(_.trim.toUpperCase) match {
          case Some(s) if s.forall(_.isDigit) => s.toInt
          case Some(s) if s.startsWith("SEGMENT") => s.split("\\s+").last.toInt
          case Some("MASTER") => 1
          case _ => 4
        }
        rest = (rest.substring(0, e.start) + " " + rest.substring(e.end)).trim
    }

    // FORMAT 'TEXT'|'CSV'|'CUSTOM' [( options )]
    var format = "TEXT"
    var delimiter: Option[String] = None
    var nullToken: Option[String] = None
    var header = false
    var formatter: Option[String] = None
    var fwWidths = Seq.empty[(String, Int)]
    var preserveBlanks = false
    var lineDelim = "\n"
    val fmtRe = "(?is)\\bFORMAT\\s+'(\\w+)'\\s*".r
    fmtRe.findFirstMatchIn(rest).foreach { f =>
      format = f.group(1).toUpperCase
      require(format == "TEXT" || format == "CSV" || format == "CUSTOM",
        s"unsupported external FORMAT '$format' (TEXT, CSV, CUSTOM)")
      var tail = rest.substring(f.end).trim
      if (tail.startsWith("(")) {
        val (opts, a3) = GreengageDdl.balanced(tail, 0)
        if (format == "CUSTOM") {
          // formatter=fixedwidth_in, col='width', ..., preserve_blanks,
          // line_delim, null — ORDER of the width pairs defines the
          // file layout (fixedwidth.c load_format_config:154-192)
          val pairRe = "(?s)([\\w\"]+)\\s*=\\s*(?:'([^']*+(?:''[^']*+)*+)'|([\\w.]+))".r
          pairRe.findAllMatchIn(opts).foreach { p =>
            val key = p.group(1).replace("\"", "")
            val value = Option(p.group(2)).map(_.replace("''", "'"))
              .getOrElse(p.group(3))
            key.toLowerCase match {
              case "formatter" => formatter = Some(value.toLowerCase)
              case "preserve_blanks" =>
                preserveBlanks = value.equalsIgnoreCase("on")
              case "line_delim" => lineDelim = value
              case "null" => nullToken = Some(value)
              case colName => fwWidths :+= (colName -> value.trim.toInt)
            }
          }
          require(formatter.exists(_.startsWith("fixedwidth")),
            s"unsupported CUSTOM formatter ${formatter.getOrElse("(none)")}" +
              " (fixedwidth_in/fixedwidth_out)")
        } else {
          // E'...' escape-string spellings decode their backslash
          // escapes (scan.l xe rules) — `DELIMITER AS E'\t'`
          val dRe = "(?is)\\bDELIMITER\\s+(?:AS\\s+)?(E)?'([^']*+(?:''[^']*+)*+)'".r
          val nRe = "(?is)\\bNULL\\s+(?:AS\\s+)?(E)?'([^']*+(?:''[^']*+)*+)'".r
          def unesc(e: String, v0: String): String = {
            val v = v0.replace("''", "'")
            if (e == null) v
            else v.replace("\\t", "\t").replace("\\n", "\n")
              .replace("\\r", "\r").replace("\\\\", "\\")
          }
          delimiter = dRe.findFirstMatchIn(opts)
            .map(m => unesc(m.group(1), m.group(2)))
          nullToken = nRe.findFirstMatchIn(opts)
            .map(m => unesc(m.group(1), m.group(2)))
          header = "(?i)\\bHEADER\\b".r.findFirstIn(opts).isDefined
        }
        tail = tail.substring(a3).trim
      }
      rest = (rest.substring(0, f.start) + " " + tail).trim
    }
    val delim = delimiter.getOrElse(if (format == "CSV") "," else "\t")
    val nullTok = nullToken.getOrElse(if (format == "CSV") "" else "\\N")

    // ENCODING 'x' — UTF-8 only (everything here is UTF-8 end-to-end)
    "(?is)\\bENCODING\\s+'([^']*)'".r.findFirstMatchIn(rest).foreach { e =>
      val enc = e.group(1).replace("-", "").toUpperCase
      require(enc == "UTF8", s"unsupported external ENCODING '${e.group(1)}'")
      rest = (rest.substring(0, e.start) + " " + rest.substring(e.end)).trim
    }

    val logErrors =
      "(?is)\\bLOG\\s+ERRORS\\b".r.findFirstIn(rest).isDefined
    var rejectRows: Option[Long] = None
    var rejectPercent: Option[Double] = None
    "(?is)\\bSEGMENT\\s+REJECT\\s+LIMIT\\s+(\\d+)\\s*(ROWS|PERCENT)?".r
      .findFirstMatchIn(rest).foreach { r =>
        if (Option(r.group(2)).exists(_.equalsIgnoreCase("PERCENT")))
          rejectPercent = Some(r.group(1).toDouble)
        else rejectRows = Some(r.group(1).toLong)
      }

    ExtSpec(name, writable, columns, locations, execCmd, segments, format,
      delim, nullTok, header, logErrors, rejectRows, rejectPercent,
      formatter, fwWidths, preserveBlanks, lineDelim,
      if (format == "CUSTOM") nullToken else None)
  }

  /** Parse + register: READABLE → temp view (+ `<name>_errors` under
    * LOG ERRORS); WRITABLE → sink registry for INSERT routing. */
  def create(spark: SparkSession, ddl: String): ExtSpec = {
    val spec0 = parse(ddl)
    // (LIKE t): borrow the referenced table's columns (catalog lookup
    // deferred to here, where a session exists)
    val spec =
      if (spec0.columns.exists(_._1 == "__like__"))
        spec0.copy(columns = spec0.columns.flatMap {
          case ("__like__", ref) =>
            spark.table(ref).schema.fields.toSeq
              .map(f => (f.name, f.dataType.sql))
          case other => Seq(other)
        })
      else spec0
    if (spec.writable) {
      require(spec.rejectRows.isEmpty && spec.rejectPercent.isEmpty,
        "SEGMENT REJECT LIMIT applies to readable external tables")
      writables.put(spec.name, spec)
    } else {
      try {
        val res = read(spark, spec)
        register(spark, spec.name, res.good)
        if (spec.logErrors)
          register(spark, s"${spec.name}_errors", res.errorLog)
      } catch {
        case e: Exception
            if spec.locations.headOption.exists(
              _.matches("(?i)^(gpfdists?|https?)://.*")) =>
          // GP's CREATE validates NOTHING for a web external table —
          // an unreachable gpfdist host errors at SCAN time. The SREH
          // reject count forced our read eager; register the LAZY
          // parse instead, so the failure lands where PG's does.
          val urls = spec.locations.map(_
            .replaceFirst("(?i)^gpfdists://", "https://")
            .replaceFirst("(?i)^gpfdist://", "http://"))
          import org.apache.spark.sql.functions._
          val lazyDf = graft.sources.WebSource
            .lines(spark, urls, math.max(1, spec.segments))
            .select(from_csv(col("line"), spec.schema,
              Map("sep" -> spec.delimiter)).as("r"))
            .select(col("r.*"))
          lazyDf.createOrReplaceTempView(spec.name)
          lazyExternals.add(spec.name.toLowerCase)
          ()
      }
    }
    spec
  }

  // web external tables registered LAZILY (unreachable at CREATE):
  // EXCHANGE PARTITION treats them metadata-only
  private val lazyExternals =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def isLazyExternal(name: String): Boolean =
    lazyExternals.contains(name.replace("\"", "").toLowerCase)

  /** Temp views cannot carry a schema-qualified name — a qualified
    * external table materializes its snapshot as a real table in its
    * schema instead (the read already happened eagerly either way). */
  private def register(spark: SparkSession, name: String,
                       df: org.apache.spark.sql.DataFrame): Unit =
    if (name.contains(".")) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").format("parquet").saveAsTable(name)
    } else df.createOrReplaceTempView(name)

  /** DROP EXTERNAL TABLE: unregister whichever side holds the name. */
  def drop(spark: SparkSession, name: String): Unit = {
    val n = name.replace("\"", "")
    lazyExternals.remove(n.toLowerCase)
    if (writables.remove(n) == null) {
      if (n.contains(".")) spark.sql(s"DROP TABLE IF EXISTS $n")
      else {
        spark.catalog.dropTempView(n)
        spark.catalog.dropTempView(s"${n}_errors")
      }
    }
  }

  private def read(spark: SparkSession, spec: ExtSpec): Sreh.SrehResult = {
    // no SEGMENT REJECT LIMIT → PG's strict default: one bad row fails
    val limit = if (spec.rejectPercent.isDefined) Long.MaxValue
      else spec.rejectRows.getOrElse(0L)
    val res = spec.execCmd match {
      case _ if spec.format == "CUSTOM" =>
        // fixedwidth_in over file or cloud LOCATIONs (contrib/
        // formatter_fixedwidth); same SREH reject accounting
        require(spec.execCmd.isEmpty,
          "CUSTOM fixedwidth formatter needs LOCATION, not EXECUTE")
        val paths =
          if (CloudLocation.isCloud(spec.locations.head))
            graft.sources.CloudLocation.resolve(spark, spec.locations)
          else spec.locations.map(filePath)
        FixedWidth.read(spark, paths, spec.schema, spec.fwWidths, limit,
          spec.preserveBlanks, spec.fwNull, spec.lineDelim)
      case Some(cmd) =>
        val r = ExecSource.readCsv(spark, cmd, spec.schema, spec.segments,
          limit, spec.delimiter, spec.nullToken)
        r.copy(good = r.good.drop("segment"))
      case None if spec.locations.head.matches("(?i)^(gpfdists?|https?)://.*") =>
        // gpfdist speaks http (gpfdists = the TLS variant): one
        // segment per URL, round-robin
        val urls = spec.locations.map(_
          .replaceFirst("(?i)^gpfdists://", "https://")
          .replaceFirst("(?i)^gpfdist://", "http://"))
        val r = WebSource.readCsv(spark, urls, spec.schema, spec.segments,
          limit, spec.delimiter)
        r.copy(good = r.good.drop("segment"))
      case None if CloudLocation.isCloud(spec.locations.head) =>
        // s3/gs/abfss: gpcloud-style URL + config options translate to
        // Hadoop FS settings; the scan is the same SREH CSV reader,
        // splittable and executor-parallel (gpcontrib/gpcloud)
        Sreh.readCsvPaths(spark,
          graft.sources.CloudLocation.resolve(spark, spec.locations),
          spec.schema, limit, spec.header, spec.delimiter, spec.nullToken)
      case None =>
        require(spec.locations.forall(_.matches("(?i)^file://.*")),
          s"unsupported LOCATION protocol: ${spec.locations.head}")
        Sreh.readCsvPaths(spark, spec.locations.map(filePath), spec.schema,
          limit, spec.header, spec.delimiter, spec.nullToken)
    }
    spec.rejectPercent.foreach { pct =>
      val total = res.good.count() + res.rejected
      if (total > 0 && res.rejected * 100.0 > pct * total)
        throw Sreh.RejectLimitExceeded(res.rejected,
          math.ceil(pct * total / 100.0).toLong)
    }
    res
  }

  /** `file://<host>/<path>` → local path (host segment dropped — every
    * node sees the same filesystem in local mode). */
  private def filePath(url: String): String = {
    val p = url.replaceFirst("(?i)^file://", "")
    if (p.startsWith("/")) p else p.substring(p.indexOf('/'))
  }

  /** INSERT INTO a writable external table: cast to the declared
    * schema, then stream partitions to the target. */
  def insertInto(spark: SparkSession, name: String, df: DataFrame): Unit = {
    val spec = Option(writables.get(name.replace("\"", ""))).getOrElse(
      throw new IllegalArgumentException(s"not a writable external table: $name"))
    require(df.columns.length == spec.columns.length,
      s"INSERT column count ${df.columns.length} != ${spec.columns.length}")
    val cast = df.select(df.columns.zip(spec.columns).map {
      case (c, (n, t)) => col(c).cast(t).as(n)
    }.toSeq: _*)
    spec.execCmd match {
      case _ if spec.format == "CUSTOM" =>
        // fixedwidth_out: blank-padded concatenation, one line per row
        require(spec.locations.size == 1,
          "writable fixedwidth external table needs exactly one LOCATION")
        val Seq(path) =
          if (CloudLocation.isCloud(spec.locations.head))
            graft.sources.CloudLocation.resolve(spark, spec.locations)
          else spec.locations.map(filePath)
        FixedWidth.formatLines(cast, spec.fwWidths, spec.fwNull)
          .write.mode("append").text(path)
      case Some(cmd) => pipeToProgram(cast, cmd, spec.delimiter)
      case None if spec.locations.head.matches("(?i)^(gpfdists?|https?)://.*") =>
        val urls = spec.locations.map(_
          .replaceFirst("(?i)^gpfdists://", "https://")
          .replaceFirst("(?i)^gpfdist://", "http://"))
        WebSink.writeCsv(cast, urls, spec.delimiter)
      case None if CloudLocation.isCloud(spec.locations.head) =>
        require(spec.locations.size == 1,
          "writable cloud external table needs exactly one LOCATION")
        val Seq(path) =
          graft.sources.CloudLocation.resolve(spark, spec.locations)
        cast.write.mode("append")
          .option("sep", spec.delimiter)
          .option("nullValue", spec.nullToken)
          .option("header", spec.header.toString)
          .csv(path)
      case None =>
        require(spec.locations.size == 1,
          "writable file:// external table needs exactly one LOCATION")
        cast.write.mode("append")
          .option("sep", spec.delimiter)
          .option("nullValue", spec.nullToken)
          .option("header", spec.header.toString)
          .csv(filePath(spec.locations.head))
    }
  }

  /** WRITABLE ... EXECUTE: the program runs once and receives every
    * row on stdin, one partition in memory at a time (the dispatching
    * node's copy of the reference's writable-EXECUTE contract). */
  private def pipeToProgram(df: DataFrame, cmd: String, delim: String): Unit = {
    val pb = new ProcessBuilder("/bin/sh", "-c", cmd)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        var i = 0
        while (i < r.length) {
          if (i > 0) w.write(delim)
          if (!r.isNullAt(i)) w.write(r.get(i).toString)
          i += 1
        }
        w.write('\n')
      }
    } finally w.close()
    val rc = proc.waitFor()
    require(rc == 0, s"writable external EXECUTE exited $rc: $cmd")
  }
}
