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
  * [[touch]] maps to the stores' copy-in-place idiom (S3 CopyObject
  * onto itself with `MetadataDirective: REPLACE`, GCS rewrite, Azure
  * set-blob-properties): `PUT` with `x-graft-copy-source` naming the
  * object itself. `200` re-armed, `404` the object vanished (thrown as
  * `FileNotFoundException` so the committer rewrites the
  * content-addressed bytes), `501` the store cannot express it (touch
  * reports false and the TTL discipline governs — see the SPI
  * scaladoc).
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

  private def open(fs: org.apache.hadoop.fs.FileSystem,
                   target: org.apache.hadoop.fs.Path)
  : java.net.HttpURLConnection = {
    val url = new java.net.URI(
      baseUrl(fs) + target.toUri.getPath).toURL
    val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(30000)
    c.setReadTimeout(60000)
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
      val out = c.getOutputStream
      try out.write(bytes) finally out.close()
      c.getResponseCode match {
        case 200 | 201 => true
        case 412       => false
        case code => throw new java.io.IOException(
          s"conditional PUT of $target returned HTTP $code — an IO/" +
            "store error, not a commit conflict; do not retry as a CAS race")
      }
    } finally c.disconnect()
  }

  override def touch(fs: org.apache.hadoop.fs.FileSystem,
                     target: org.apache.hadoop.fs.Path): Boolean = {
    val c = open(fs, target)
    try {
      c.setRequestMethod("PUT")
      // the stores' self-copy-with-metadata-replace idiom
      c.setRequestProperty("x-graft-copy-source", target.toUri.getPath)
      c.setRequestProperty("x-graft-metadata-directive", "REPLACE")
      c.getResponseCode match {
        case 200 => true
        case 404 => throw new java.io.FileNotFoundException(target.toString)
        case 501 => false // store cannot express a touch: TTL governs
        case code => throw new java.io.IOException(
          s"touch of $target returned HTTP $code")
      }
    } finally c.disconnect()
  }
}
