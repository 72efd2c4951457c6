package graft.dedup

/** Build-once published artifact under the JVM tmpdir — the shared
  * publish discipline of [[IncrementalDedup.ensureSavedSignatures]] and
  * [[DataSplit.ensureSavedAssignment]] (factored per review: two
  * hand-kept copies of the race handling had already let the params-key
  * lists drift apart).
  *
  * The artifact path is a pure function of (content digest, EVERY
  * parameter the artifact derives from): callers pass the full parameter
  * list and a change to any constant produces a new path — a rebuild —
  * instead of silently serving rows the current code can no longer
  * produce. Publish is write-to-tmp + atomic rename; losing the rename
  * race to a concurrent build is fine (the winner's artifact is
  * content-identical), any OTHER rename failure (cross-mount tmpdir,
  * permissions) throws HERE with its real cause rather than later as a
  * confusing missing-path read.
  */
private[graft] object SavedArtifact {

  /** The artifact's deterministic path — NO build: the pure
    * (prefix, digest, params) → path function, exposed so an oracle that
    * must READ the artifact (e.g. the image-hash table DuckDB cannot
    * derive itself) can name the same location the engine published to.
    */
  def path(prefix: String, contentDigest: String, params: Seq[Any]): String = {
    val paramsKey = java.security.MessageDigest.getInstance("MD5")
      .digest(params.mkString(":").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      s"${contentDigest}_$paramsKey"
  }

  /** Path of the published artifact, building it first if absent.
    * `build(tmp)` must write a _SUCCESS-marked directory at `tmp`
    * (a parquet write does).
    */
  def ensure(prefix: String, contentDigest: String, params: Seq[Any])(
      build: String => Unit): String = {
    val path = SavedArtifact.path(prefix, contentDigest, params)
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val tmp = s"${path}_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
      build(tmp)
      if (!new java.io.File(tmp).renameTo(new java.io.File(path))) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        if (!new java.io.File(s"$path/_SUCCESS").exists())
          throw new java.io.IOException(
            s"could not publish artifact: rename $tmp -> $path " +
              "failed and no concurrent build won the race")
      }
    }
    path
  }
}
