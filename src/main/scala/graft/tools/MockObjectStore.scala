package graft.tools

/** Loopback mock of an object store's METADATA control plane — the test
  * double for [[graft.pipeline.HttpSnapshotCas]], in the house pattern
  * of the loopback SPARQL endpoints: a real HTTP server on 127.0.0.1
  * whose conditional semantics mirror what S3/GCS/Azure actually
  * provide, backed by the local directory tree a RawLocalFileSystem
  * face (the "s3a connector" side) serves for data reads.
  *
  * Speaks exactly the two requests the provider issues:
  *
  *  - `PUT <path>` with `If-None-Match: *` — atomic create-if-absent.
  *    `201` created (bytes visible atomically: temp + link(2), never a
  *    partial object), `412` it already existed, under one store-wide
  *    lock — which is precisely the atomicity a store's conditional
  *    PUT gives across writers.
  *  - `POST <path>` with `x-graft-touch` — the non-destructive
  *    freshness re-arm. `200` + an `x-graft-touched` echo (the echo is
  *    how the provider knows the store understood, and the object's
  *    bytes are untouched by construction), `404` no such object.
  *
  * The URL path IS the absolute local path of the backing file — the
  * mock is a control plane over the same tree the data-plane
  * filesystem reads, so a committed manifest becomes instantly visible
  * to `readSnapshot` exactly as an S3 PUT becomes visible to s3a.
  *
  * `requireAuth` makes the store reject any request missing the given
  * header/value with `401` (exercises the provider's auth hook —
  * `graft.lake.cas.http.headers` — end to end); `earlyConflict` makes
  * a conditional PUT against an EXISTING object answer `409` before
  * consuming the request body, the store shape whose aborted upload
  * surfaces client-side as an IOException mid-write (the provider
  * must still classify it as a conflict, never an IO failure);
  * `spurious409` mimics S3's ConditionalRequestConflict: every
  * conditional PUT answers `409` with NO object committed (a
  * concurrent in-flight write, outcome unknown) — the provider must
  * classify it as IO ("retry"), never as a competitor's commit.
  * `HEAD` answers present/absent, the probe the provider uses to tell
  * the two 409 shapes apart. */
final class MockObjectStore(requireAuth: Option[(String, String)] = None,
                            earlyConflict: Boolean = false,
                            spurious409: Boolean = false,
                            headForbidden: Boolean = false) {
  private val lock = new Object
  private var server: com.sun.net.httpserver.HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Start on an ephemeral loopback port; returns the base URL. */
  def start(): String = {
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handler)
    // daemon threads AND an explicit shutdown: a mock store must never
    // pin the host JVM (HttpServer.stop does not stop a user executor)
    pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-mock-store"); t.setDaemon(true); t
      })
    server.setExecutor(pool)
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }

  private def handler: com.sun.net.httpserver.HttpHandler =
    (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        val f = new java.io.File(path)
        val code =
          if (requireAuth.exists { case (h, v) =>
            v != ex.getRequestHeaders.getFirst(h) }) 401
          else if (ex.getRequestMethod == "HEAD")
            // the object-presence probe (S3 HeadObject shape) behind
            // the provider's 409 disambiguation; `headForbidden` is the
            // write-only-credential shape (403 on reads)
            (if (headForbidden) 403
             else lock.synchronized(if (f.exists()) 200 else 404))
          else if (ex.getRequestMethod == "PUT" && spurious409 &&
            "*" == ex.getRequestHeaders.getFirst("If-None-Match"))
            409 // S3 ConditionalRequestConflict: NOTHING committed
          else if (ex.getRequestMethod == "PUT" && earlyConflict &&
            "*" == ex.getRequestHeaders.getFirst("If-None-Match") &&
            lock.synchronized(f.exists()))
            409 // answered BEFORE the body is consumed — Azure's shape
          else if (ex.getRequestMethod == "POST" &&
            ex.getRequestHeaders.containsKey("x-graft-touch"))
            lock.synchronized {
              if (!f.exists()) 404
              else {
                f.setLastModified(System.currentTimeMillis())
                // the echo IS the contract: the provider counts a
                // re-arm only when the store proves it understood
                ex.getResponseHeaders.set("x-graft-touched", "true")
                200
              }
            }
          else if (ex.getRequestMethod != "PUT") 405
          else if ("*" != ex.getRequestHeaders.getFirst("If-None-Match")) 400
          else {
            val bytes = ex.getRequestBody.readAllBytes()
            lock.synchronized {
              if (f.exists()) 412
              else {
                java.util.Objects.requireNonNull(f.getParentFile).mkdirs()
                val tmp = java.io.File.createTempFile(
                  s".${f.getName}.", ".put", f.getParentFile)
                val out = new java.io.FileOutputStream(tmp)
                try out.write(bytes) finally out.close()
                java.nio.file.Files.createLink(f.toPath, tmp.toPath)
                tmp.delete()
                201
              }
            }
          }
        ex.sendResponseHeaders(code, -1)
      } finally ex.close()
    }
}

/** The DATA-PLANE face of [[MockObjectStore]]: local bytes behind an
  * object-store-shaped scheme — rename is not exclusive (so bare
  * commits are refused and the metadata CAS must route through a
  * [[graft.pipeline.SnapshotCas]] provider) and `setTimes` is
  * unsupported (so the shard-TTL re-arm must route through the
  * provider's touch). Registered via `fs.gos.impl`. */
final class ObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("gos:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long,
                        atime: Long): Unit =
    throw new UnsupportedOperationException("object stores have no setTimes")
}
