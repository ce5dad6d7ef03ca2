package graft

import java.io.File

/** Naming + commit protocol for session/JVM-crossing memoized LAYOUT
  * WRITES — the one-time bucketed/partitioned/re-encoded copies a lake
  * writes at ingest (layout_bucket_join, layout_partition_prune,
  * src_orc_roundtrip, src_schema_merge, src_jsonl_gz). The queries
  * only pay the write once per fixture; every later read hits the
  * finished layout.
  *
  * The key fixes two defects of the earlier `path.hashCode` scheme
  * (ADVICE r7):
  *
  *  - **Collision resistance**: `String.hashCode` is 32-bit — two
  *    DIFFERENT sf-dirs can collide into the same 8-hex name, and an
  *    interrupted write of one would then be read as the other's
  *    data. MD5 of the full path cannot collide in practice.
  *  - **Content fingerprint**: the key folds in the SOURCE parquet's
  *    RECURSIVE (Σ length, max mtime) — single file or nested lake
  *    directory alike — so a fixture regenerated in place gets a
  *    FRESH directory instead of serving the stale layout (which
  *    surfaced as an inexplicable oracle hash mismatch).
  *
  * Concurrency: two JVMs that both see a missing layout must not
  * overwrite-write into the same directory — Spark task files from
  * the two writers interleave and a later `_SUCCESS` can commit over
  * a MIXED directory. [[materialize]] therefore writes to a
  * process-unique staging dir and publishes with an atomic rename:
  * the loser of the rename race simply discards its staging copy and
  * reads the winner's (identical-content, by the fingerprint) layout.
  */
object LayoutCache {

  private def walk(f: File): Seq[File] =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
    else if (f.exists()) Seq(f)
    else Nil

  /** Stable 16-hex key for (source dir, source table) including the
    * source's recursive content fingerprint. The fingerprint folds in
    * the file COUNT and every file's (path, length) — not just the
    * total byte length — plus NANOSECOND mtimes (ADVICE r8: a fixture
    * regenerated in place with identical total length within the
    * 1-second lastModified granularity keyed to the same directory and
    * served the stale layout; per-file lengths make that collision
    * require an exact per-file byte match, and nano mtimes shrink the
    * time window to filesystem-timestamp resolution). */
  def key(dir: String, table: String): String = {
    val files = walk(new File(dir, s"$table.parquet"))
      .sortBy(_.getAbsolutePath)
    val perFile = files
      .map(f => s"${f.getAbsolutePath}=${f.length()}").mkString(",")
    val mtime = (0L +: files.map(f =>
      java.nio.file.Files.getLastModifiedTime(f.toPath)
        .to(java.util.concurrent.TimeUnit.NANOSECONDS))).max
    val fp = s"${new File(dir).getAbsolutePath}|$table|${files.size}|" +
      s"$perFile|$mtime"
    java.security.MessageDigest.getInstance("MD5")
      .digest(fp.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
  }

  /** Target directory under java.io.tmpdir for one layout family. */
  def target(family: String, dir: String, table: String): File =
    new File(new File(sys.props("java.io.tmpdir"), family),
      s"${family}_${table}_${key(dir, table)}")

  /** True when the layout at `root` finished writing (marker relative
    * to root, `_SUCCESS` by default). */
  def ready(root: File, marker: String = "_SUCCESS"): Boolean =
    new File(root, marker).exists()

  /** Ensure the layout exists: if `target` is not [[ready]], run
    * `write` against a process-unique STAGING directory and publish it
    * with one atomic rename. Concurrent writers each stage privately;
    * exactly one rename wins, the rest delete their staging copy —
    * no interleaved task files, and readers only ever see a complete
    * directory. Returns the published path. */
  def materialize(family: String, dir: String, table: String,
      marker: String = "_SUCCESS")(write: String => Unit): String = {
    val tgt = target(family, dir, table)
    if (!ready(tgt, marker)) {
      val staging = new File(tgt.getParentFile,
        s"${tgt.getName}.stage-${java.lang.ProcessHandle.current().pid()}")
      delete(staging)
      write(staging.getAbsolutePath)
      if (!staging.renameTo(tgt)) {
        // lost the race (or a stale incomplete tgt blocks the rename):
        // if a COMPLETE layout is there, use it; otherwise clear the
        // debris and retry our own publish once
        if (!ready(tgt, marker)) {
          delete(tgt)
          if (!staging.renameTo(tgt) && !ready(tgt, marker))
            throw new IllegalStateException(
              s"cannot publish layout ${tgt.getAbsolutePath}")
        }
        delete(staging)
      }
    }
    tgt.getAbsolutePath
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
