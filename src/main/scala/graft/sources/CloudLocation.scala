package graft.sources

import org.apache.spark.sql.SparkSession

/** Cloud-object-store LOCATION support for external tables — the
  * Spark-native mapping of the reference's `s3` external protocol
  * (`gpcontrib/gpcloud/`: URL handling `src/s3url.cpp:76-101`, config
  * loading `src/s3conf.cpp:34-131`, protocol registration
  * `src/gpcloud.cpp`).
  *
  * The reference's LOCATION string is
  * `s3://<endpoint>[:port]/<bucket>/<prefix> [config=<path>]
  * [section=<name>] [region=<r>]` — a URL followed by whitespace-
  * separated `key=value` options (`s3utils.cpp:420` GetOptS3), with the
  * credentials/tuning in an INI file. Spark already has a
  * distributed object-store reader in the Hadoop FileSystem layer, so
  * the correct mapping is a pure TRANSLATION, not a client:
  * the URL becomes a Hadoop path (`s3a://bucket/prefix`) and each
  * config entry becomes the corresponding `fs.s3a.*` setting. The scan
  * itself then goes through the same DSv1 CSV reader + SREH layer every
  * other external protocol uses — splittable, predicate-pruned,
  * executor-parallel, no driver hop, which is exactly what a 100 TB
  * `s3://` load needs.
  *
  * Native Hadoop-scheme URLs (`s3a://`, `gs://`, `abfss://`,
  * `wasbs://`) pass through with options still honored — a migrating
  * user can keep gpcloud spellings or move to lake-native ones.
  */
object CloudLocation {

  private val cloudSchemeRe = "(?is)^(s3a?|gs|abfss?|wasbs?)://.*".r

  def isCloud(location: String): Boolean =
    cloudSchemeRe.pattern.matcher(location.trim).matches()

  /** One parsed LOCATION: the Hadoop path to scan plus the hadoop conf
    * settings its options imply. */
  final case class Resolved(path: String, settings: Map[String, String])

  /** Split `<url> k=v k=v ...` (GetOptS3 semantics: first token is the
    * URL, later whitespace-separated tokens are options). */
  private def splitOptions(location: String): (String, Map[String, String]) = {
    val toks = location.trim.split("\\s+").toSeq
    val opts = toks.tail.flatMap { t =>
      t.split("=", 2) match {
        case Array(k, v) => Some(k.toLowerCase -> v)
        case _ => None
      }
    }.toMap
    (toks.head, opts)
  }

  /** Minimal INI reader for the gpcloud s3 config file
    * (`s3conf.cpp:84-131`): `[section]` headers, `key = value` lines,
    * `#`/`;` comments. */
  private[sources] def readIni(path: String, section: String): Map[String, String] = {
    val f = new java.io.File(path)
    require(f.isFile, s"s3 config file not found: $path")
    var cur = ""
    val out = scala.collection.mutable.Map[String, String]()
    for (raw <- scala.io.Source.fromFile(f, "UTF-8").getLines()) {
      val line = raw.trim
      if (line.startsWith("[") && line.endsWith("]"))
        cur = line.substring(1, line.length - 1).trim.toLowerCase
      else if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")
        && line.contains('=') && cur == section.toLowerCase) {
        val Array(k, v) = line.split("=", 2)
        out(k.trim.toLowerCase) = v.trim
      }
    }
    out.toMap
  }

  /** Translate one gpcloud-style location to a Hadoop path + conf
    * settings. `s3://endpoint/bucket/prefix` rewrites to
    * `s3a://bucket/prefix` with the endpoint in `fs.s3a.endpoint`;
    * native Hadoop schemes keep their URL. */
  def translate(location: String): Resolved = {
    val (url, opts) = splitOptions(location)
    val conf: Map[String, String] = opts.get("config") match {
      case Some(p) => readIni(p, opts.getOrElse("section", "default"))
      case None => Map.empty
    }
    val settings = scala.collection.mutable.Map[String, String]()
    def fromConf(key: String, prop: String, f: String => String = identity): Unit =
      conf.get(key).foreach(v => settings(prop) = f(v))
    // credentials + region (s3conf.cpp:99-105, 66)
    fromConf("accessid", "fs.s3a.access.key")
    fromConf("secret", "fs.s3a.secret.key")
    fromConf("token", "fs.s3a.session.token")
    opts.get("region").orElse(conf.get("region"))
      .foreach(r => settings("fs.s3a.endpoint.region") = r)
    // transport/tuning (s3conf.cpp:84, 111-124)
    fromConf("encryption", "fs.s3a.connection.ssl.enabled",
      v => String.valueOf(v.equalsIgnoreCase("true")))
    fromConf("threadnum", "fs.s3a.threads.max")
    fromConf("chunksize", "fs.s3a.multipart.size")
    conf.get("proxy").filter(_.nonEmpty).foreach { p =>
      // [scheme://][user:pass@]host[:port]
      val noScheme = p.replaceFirst("^\\w+://", "")
      val (credPart, hostPart) = noScheme.lastIndexOf('@') match {
        case -1 => ("", noScheme)
        case i => (noScheme.substring(0, i), noScheme.substring(i + 1))
      }
      if (credPart.nonEmpty) {
        val Array(u, pw @ _*) = credPart.split(":", 2)
        settings("fs.s3a.proxy.username") = u
        pw.headOption.foreach(settings("fs.s3a.proxy.password") = _)
      }
      hostPart.split(":", 2) match {
        case Array(h, port) =>
          settings("fs.s3a.proxy.host") = h
          settings("fs.s3a.proxy.port") = port
        case Array(h) => settings("fs.s3a.proxy.host") = h
      }
    }
    fromConf("server_side_encryption", "fs.s3a.encryption.algorithm",
      v => if (v.equalsIgnoreCase("sse-s3")) "AES256" else v)

    val path = url match {
      case u if u.matches("(?i)^s3://.*") =>
        // gpcloud URL: host IS the endpoint, first path segment the
        // bucket (s3url.cpp:76-101)
        val uri = java.net.URI.create(u)
        val host = Option(uri.getAuthority).getOrElse(
          throw new IllegalArgumentException(s"s3 LOCATION needs a host: $u"))
        val segs = Option(uri.getPath).getOrElse("").stripPrefix("/")
        require(segs.nonEmpty, s"s3 LOCATION needs a bucket: $u")
        val (bucket, prefix) = segs.indexOf('/') match {
          case -1 => (segs, "")
          case i => (segs.substring(0, i), segs.substring(i + 1))
        }
        settings("fs.s3a.endpoint") = host
        // also write every fs.s3a.* setting under Hadoop's per-bucket
        // namespace (fs.s3a.bucket.<name>.*): two external tables with
        // different credential files then coexist instead of the last
        // CREATE clobbering the global keys
        for ((k, v) <- settings.toSeq if k.startsWith("fs.s3a."))
          settings(s"fs.s3a.bucket.$bucket." + k.stripPrefix("fs.s3a.")) = v
        s"s3a://$bucket/$prefix"
      case u => u // native Hadoop scheme — pass through
    }
    Resolved(path, settings.toMap)
  }

  /** Translate + apply: settings land on the shared hadoopConfiguration
    * (where every FileSystem instantiation and file-source scan reads
    * them), then hand back the scan paths. */
  def resolve(spark: SparkSession, locations: Seq[String]): Seq[String] =
    locations.map { loc =>
      val r = translate(loc)
      r.settings.foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v)
      }
      r.path
    }
}
