package graft.pipeline

/** A CONCRETE [[SnapshotCas]] provider: conditional HTTP PUT against an
  * object store's REST face — the create-if-absent every real store
  * exposes but the Hadoop `FileSystem` API hides (S3 `If-None-Match: *`,
  * GCS `ifGenerationMatch=0`, Azure `If-None-Match: *`). Configure
  *
  * {{{
  * spark.conf.set("graft.lake.casProvider",
  *   "graft.pipeline.HttpSnapshotCas")
  * spark.hadoop.graft.lake.cas.http.base = https://store.example/bucket
  * }}}
  *
  * and every snapshot-metadata put-if-absent (manifests, shards, tags,
  * fork markers, staged manifests) rides one `PUT <base><path>` with
  * `If-None-Match: *`. The store's own atomicity IS the commit safety:
  * `200/201` means THIS call created the object, `412 Precondition
  * Failed` means it already existed (the caller's CAS conflict), and
  * anything else throws — an IO error must read as an IO error, never
  * as "committed concurrently" (the [[SnapshotCas]] contract).
  *
  * [[touch]] is the freshness re-arm the stores express natively as
  * copy-in-place (S3 CopyObject onto itself with `MetadataDirective:
  * REPLACE`, GCS rewrite, Azure set-blob-properties) — a provider over
  * a store SDK implements exactly that. Over bare HTTP this reference
  * implementation uses a deliberately NON-DESTRUCTIVE handshake:
  * `POST` with `x-graft-touch`, counted as a re-arm only when the
  * store echoes `x-graft-touched` (a store that does not understand
  * the idiom can reject a POST but can never be tricked into
  * overwriting the object, which an ignored custom header on a `PUT`
  * would do). `404` throws `FileNotFoundException` (the committer
  * rewrites the content-addressed bytes); everything else reports
  * false and the TTL discipline governs — touch must never fail a
  * commit.
  *
  * The class is deliberately dependency-free (`HttpURLConnection`):
  * a deployment with a store SDK writes its own provider and proves it
  * with [[SnapshotCasContract]]; this one is the reference
  * implementation and the loopback-verified default
  * (`graft.tools.MockObjectStore` is the test double). */
final class HttpSnapshotCas extends SnapshotCas {

  private def baseUrl(fs: org.apache.hadoop.fs.FileSystem): String = {
    val b = org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => scala.util.Try(
        s.conf.get("graft.lake.cas.http.base")).toOption)
      .getOrElse(fs.getConf.get("graft.lake.cas.http.base", ""))
    require(b.nonEmpty,
      "HttpSnapshotCas needs 'graft.lake.cas.http.base' (session conf " +
        "or spark.hadoop.…) — the store endpoint to PUT metadata against")
    b.stripSuffix("/")
  }

  /** Decorate every outgoing request — the AUTH extension point. The
    * default applies `graft.lake.cas.http.headers` (session conf or
    * `spark.hadoop.…`): `;;`-separated `Name: value` pairs, e.g.
    * `Authorization: Bearer …;; x-ms-version: 2021-08-06` — enough for
    * token/key schemes and signed proxies without a subclass. A
    * provider over a store SDK overrides this with real per-request
    * signing (SigV4 needs the body hash, so it belongs in an
    * SDK-backed provider, not a static header). */
  protected def decorate(c: java.net.HttpURLConnection,
                         fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val hs = org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => scala.util.Try(
        s.conf.get("graft.lake.cas.http.headers")).toOption)
      .getOrElse(fs.getConf.get("graft.lake.cas.http.headers", ""))
    hs.split(";;").map(_.trim).filter(_.nonEmpty).foreach { h =>
      val i = h.indexOf(':')
      require(i > 0,
        s"malformed graft.lake.cas.http.headers entry '$h' — " +
          "expected ';;'-separated 'Name: value' pairs")
      c.setRequestProperty(h.substring(0, i).trim,
        h.substring(i + 1).trim)
    }
  }

  private def open(fs: org.apache.hadoop.fs.FileSystem,
                   target: org.apache.hadoop.fs.Path)
  : java.net.HttpURLConnection = {
    // percent-encode the object path (the URI single-arg constructor
    // PARSES — a space or bracket in a lake root would throw an opaque
    // URISyntaxException at commit time otherwise)
    val rawPath = new java.net.URI(null, null,
      target.toUri.getPath, null).getRawPath
    val url = java.net.URI.create(baseUrl(fs) + rawPath).toURL
    val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(30000)
    c.setReadTimeout(60000)
    decorate(c, fs)
    c
  }

  override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                           target: org.apache.hadoop.fs.Path,
                           bytes: Array[Byte]): Boolean = {
    val c = open(fs, target)
    try {
      c.setRequestMethod("PUT")
      c.setRequestProperty("If-None-Match", "*")
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(bytes.length)
      // a store can reject the conditional PUT EARLY (before the body
      // is consumed) — the aborted upload then surfaces as an
      // IOException from the write, while the response already carries
      // the real verdict. Hold the stream failure, read the code
      // anyway, and classify by it; only when no code is readable is
      // the stream failure the story.
      val streamFailure: Option[java.io.IOException] =
        try {
          val out = c.getOutputStream
          try out.write(bytes) finally out.close()
          None
        } catch { case e: java.io.IOException => Some(e) }
      val code =
        try c.getResponseCode
        catch {
          case e: java.io.IOException => throw streamFailure.getOrElse(e)
        }
      code match {
        case 200 | 201 if streamFailure.isEmpty => true
        case 200 | 201 => throw new java.io.IOException(
          s"conditional PUT of $target reported HTTP $code but the " +
            "body upload was interrupted — the object's content is " +
            "unverified; an IO error, not a commit conflict",
          streamFailure.get)
        // 412 is the RFC answer for a failed If-None-Match
        case 412 => false
        // 409 is AMBIGUOUS across stores: Azure Blob answers it for a
        // genuine create-collision ("it already existed"), but S3's
        // ConditionalRequestConflict is also a 409 — raised when
        // another conditional write was merely IN FLIGHT, with neither
        // write necessarily landing ("retry the request"). The
        // verdicts differ (conflict vs IO), so disambiguate by probing
        // the object: present = a competitor committed (the caller's
        // CAS conflict), absent = outcome unknown — which must read as
        // IO (a retry can win; "committed concurrently" would send the
        // operator to inspect a phantom commit)
        case 409 => exists(fs, target) match {
          case Some(true) => false // a competitor's commit is visible
          case Some(false) =>
            val e = new java.io.IOException(
              s"conditional PUT of $target returned HTTP 409 but no " +
                "committed object is visible — a transient store-side " +
                "conflict (e.g. a concurrent in-flight conditional " +
                "write), not a competitor's commit; an IO-class " +
                "condition, retry the put")
            streamFailure.foreach(e.initCause)
            throw e
          // the probe itself failed (write-only credential answering
          // 403 to HEAD, a HEAD-less proxy, a probe-time network blip):
          // degrade to the pre-probe classification — 409 as a CAS
          // conflict — which is exact on Azure-class stores and
          // SELF-HEALING on S3-class ones (the conflict surfaces
          // through withSnapshotRetry, whose re-read-and-retry re-puts
          // and wins if nothing actually landed); never strictly worse
          // than a provider without the probe
          case None => false
        }
        case other =>
          val e = new java.io.IOException(
            s"conditional PUT of $target returned HTTP $other — an IO/" +
              "store error, not a commit conflict; do not retry as a " +
              "CAS race")
          streamFailure.foreach(e.initCause)
          throw e
      }
    } finally c.disconnect()
  }

  /** HEAD probe behind the 409 disambiguation — decorated like every
    * other request, so it works against authenticated stores. `None`
    * means the probe could not answer (a non-200/404 code, or the
    * request itself failed) — the caller then degrades to the
    * pre-probe conflict classification rather than failing a commit
    * path that worked before the probe existed. */
  private def exists(fs: org.apache.hadoop.fs.FileSystem,
                     target: org.apache.hadoop.fs.Path): Option[Boolean] =
    try {
      val c = open(fs, target)
      try {
        c.setRequestMethod("HEAD")
        c.getResponseCode match {
          case 200   => Some(true)
          case 404   => Some(false)
          case _     => None
        }
      } finally c.disconnect()
    } catch { case _: java.io.IOException => None }

  override def touch(fs: org.apache.hadoop.fs.FileSystem,
                     target: org.apache.hadoop.fs.Path): Boolean = {
    val c = open(fs, target)
    try {
      // POST, never PUT: a store that does not understand the touch
      // idiom must be INCAPABLE of corrupting the object — an ignored
      // custom header on a PUT would make it a plain zero-byte
      // overwrite of a content-addressed shard (silent data loss); an
      // unrecognized POST is a 4xx/5xx, which is just "unsupported".
      // The store proves it understood by ECHOING x-graft-touched —
      // a 200 from an endpoint that merely tolerates POST does not
      // count as a re-arm. (A provider over a real store SDK
      // implements this as the native self-copy-with-metadata-replace
      // instead.)
      c.setRequestMethod("POST")
      c.setRequestProperty("x-graft-touch", "true")
      val code = c.getResponseCode
      if (code == 404)
        throw new java.io.FileNotFoundException(target.toString)
      // touch is an OPTIONAL freshness optimization: anything the
      // store answers short of "done, understood" degrades to false
      // and the TTL discipline governs (SnapshotCas scaladoc) — it
      // must never fail a commit
      code == 200 && "true" == c.getHeaderField("x-graft-touched")
    } finally c.disconnect()
  }
}
