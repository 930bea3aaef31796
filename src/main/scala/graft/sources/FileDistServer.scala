package graft.sources

import java.io.{BufferedReader, FileReader, OutputStreamWriter}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal gpfdist-equivalent: an HTTP file-distribution server that
  * hands each requesting segment a disjoint slice of a text file
  * (reference `src/bin/gpfdist/gpfdist.c` — the standalone server every
  * `LOCATION('gpfdist://...')` external table points at; segments
  * identify themselves with `X-GP-SEGMENT-ID`/`X-GP-SEGMENT-COUNT`
  * request headers, `url_curl.c:1335-1336`).
  *
  * Distribution policy: the reference's gpfdist hands out file blocks
  * first-come-first-served within a session (`gpfdist.c` session_t),
  * which balances load but is nondeterministic per segment. Here a
  * request carrying `X-GRAFT-SEGMENT-ID: i` / `X-GRAFT-SEGMENT-COUNT:
  * n` gets exactly the lines whose 0-based index ≡ i (mod n) —
  * deterministic round-robin, the same disjoint-union total, so a
  * re-scanned or retried segment re-reads an identical slice (Spark
  * task retries require deterministic input where the reference's
  * dispatcher could re-request blocks). A request without the headers
  * gets the whole file.
  *
  * Lines are streamed to the response as they are read — the server
  * never buffers the file, so a 100 TB-scale load is bounded by socket
  * buffers, exactly like the reference's 32 KB block relay.
  */
final class FileDistServer(dir: Path) {

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val rel = ex.getRequestURI.getPath.stripPrefix("/")
      val f = dir.resolve(rel).normalize()
      if (!f.startsWith(dir.normalize())) {
        ex.sendResponseHeaders(404, -1); ex.close(); return
      }
      if (ex.getRequestMethod.equalsIgnoreCase("POST")) {
        // writable external table: segments POST their rows; appends are
        // serialized per server like gpfdist's file lock
        val body = ex.getRequestBody.readAllBytes()
        FileDistServer.appendLock.synchronized {
          Files.createDirectories(f.getParent)
          Files.write(f, body,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        }
        ex.sendResponseHeaders(200, -1); ex.close(); return
      }
      if (!Files.isRegularFile(f)) {
        ex.sendResponseHeaders(404, -1); ex.close(); return
      }
      val hdr = ex.getRequestHeaders
      val segId = Option(hdr.getFirst("X-GRAFT-SEGMENT-ID")).map(_.toInt)
      val segCount = Option(hdr.getFirst("X-GRAFT-SEGMENT-COUNT")).map(_.toInt)
      ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      ex.sendResponseHeaders(200, 0) // chunked: stream, never buffer
      val out = new OutputStreamWriter(ex.getResponseBody, StandardCharsets.UTF_8)
      val in = new BufferedReader(new FileReader(f.toFile, StandardCharsets.UTF_8))
      try {
        var idx = 0
        var line = in.readLine()
        while (line != null) {
          val mine = (segId, segCount) match {
            case (Some(i), Some(n)) if n > 0 => idx % n == i
            case _ => true
          }
          if (mine) { out.write(line); out.write('\n') }
          idx += 1
          line = in.readLine()
        }
      } finally {
        in.close(); out.close(); ex.close()
      }
    }
  })
  // daemon threads: a stopped-but-unreclaimed server must never pin the
  // JVM (graft.Verify exits after the load completes)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "filedist"); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.start()

  def port: Int = server.getAddress.getPort

  /** Absolute URL for a file relative to the served directory. */
  def url(file: String): String = s"http://127.0.0.1:$port/$file"

  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object FileDistServer {
  private[sources] val appendLock = new Object

  /** Serve `dir` for the duration of `body` — the in-process equivalent
    * of "start gpfdist, run the load, stop gpfdist". */
  def withServer[A](dir: String)(body: FileDistServer => A): A = {
    val s = new FileDistServer(Paths.get(dir).toAbsolutePath)
    try body(s) finally s.stop()
  }
}
