package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A no-network stand-in FileSystem for exercising cloud-scheme scans
  * end-to-end (this container has no object-store connector jars and
  * zero egress). Registering it as `fs.s3a.impl` makes
  * `s3a://bucket/<abs-path>` resolve to the LOCAL `<abs-path>` through
  * the full Hadoop FileSystem + Spark file-source machinery — listing,
  * splits, and reads all take the same code path a real `S3AFileSystem`
  * would, so the CloudLocation translation and the external-table DDL
  * are tested for real; only the wire protocol is swapped out. Mirrors
  * the reference's own trick of pointing gpcloud tests at a local
  * fake server (`gpcontrib/gpcloud/test/`). Dev/test use only — a real
  * deployment keeps the stock `fs.s3a.impl`. */
class LocalSchemeFileSystem extends RawLocalFileSystem {
  // null while the superclass constructor runs (Scala fields initialize
  // after super), so every use falls back to the plain local URI
  private var schemeUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    schemeUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
  }

  override def getUri: URI =
    if (schemeUri == null) LocalSchemeFileSystem.LocalUri else schemeUri

  /** RawLocalFileSystem maps a Path to a File via its URI path only, so
    * the bucket authority is naturally ignored; qualify listings back
    * under this scheme so downstream scans stay on it. */
  override def makeQualified(path: Path): Path = {
    val q = super.makeQualified(path)
    val u = q.toUri
    if (schemeUri != null && schemeUri.getScheme != "file" &&
      (u.getScheme == null || u.getScheme == "file"))
      new Path(schemeUri.getScheme, schemeUri.getAuthority, u.getPath)
    else q
  }
}

object LocalSchemeFileSystem {
  private val LocalUri = URI.create("file:///")
}
