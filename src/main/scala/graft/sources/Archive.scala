package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile

/** Driver-side retrieval I/O (OP-01/OP-02, SURVEY §2.1):
  * `retrieve.py:50-58` streams an HTTP download to a tempfile in
  * chunks; `retrieve.py:33-37` opens one member of the GNIS zip.
  *
  * Transport is injected (`fetch: url → bytes`) so the engine stays
  * zero-egress — production wires `java.net.http.HttpClient`, tests
  * wire a map. These are I/O utilities, not operators: data enters the
  * engine through `spark.read` on the extracted files.
  */
object Archive {

  /** OP-01: streamed download to a file, chunked writes
    * (`retrieve.py:56` uses 4096-byte chunks; chunking matters for the
    * real socket transport, the injected form just writes through).
    */
  def download(fetch: String => Array[Byte], url: String, dest: Path,
      chunkSize: Int = 4096): Path = {
    val bytes = fetch(url)
    val out = new BufferedOutputStream(new FileOutputStream(dest.toFile), chunkSize)
    try {
      var off = 0
      while (off < bytes.length) {
        val n = math.min(chunkSize, bytes.length - off)
        out.write(bytes, off, n)
        off += n
      }
    } finally out.close()
    dest
  }

  /** OP-02: extract one member of a zip archive to a file
    * (`Text/FederalCodes_CA.txt` inside the GNIS download,
    * `config.py:109`). Returns the extraction path.
    */
  def extractZipMember(zipPath: String, memberName: String, destDir: Path): Path = {
    // Hostile-file policy (SourceChaosProbe): a truncated download or a
    // zip whose central directory disagrees with its local headers must
    // fail LOUDLY with the path — and must never leave a TORN
    // extraction behind for the next pipeline step to silently ingest
    // (the decompressor only detects the mismatch mid-stream, after
    // bytes are already written).
    val zf =
      try new ZipFile(zipPath)
      catch {
        case e: java.util.zip.ZipException => throw new IllegalArgumentException(
          s"$zipPath: not a readable zip archive (${e.getMessage})", e)
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"$zipPath: cannot open archive: ${e.getMessage}", e)
      }
    try {
      val entry = Option(zf.getEntry(memberName)).getOrElse(
        throw new IllegalArgumentException(
          s"$zipPath has no member $memberName (members: " +
            zf.stream().limit(20).map[String](_.getName).toArray.mkString(", ") + ")"))
      val dest = destDir.resolve(Paths.get(memberName).getFileName)
      // extract to a sibling temp file, promote atomically: a corrupt
      // deflate stream then aborts with the temp deleted, never a
      // partial file at the published path. publishTemp (not a raw
      // createTempFile) so the extracted artifact keeps default-umask
      // perms — createTempFile's 0600 was the r19 review's publish-
      // perms regression, fixed once for every promote site
      val tmp = AtomicFiles.publishTemp(dest)
      try {
        val in = zf.getInputStream(entry)
        // ZipException | EOFException are the CORRUPTION classes (a
        // deflate stream ending prematurely surfaces as EOFException
        // "Unexpected end of ZLIB input stream") and get the corrupt-
        // member diagnosis with zipPath!member context; other
        // IOExceptions (disk full, permissions on destDir) are
        // environment failures and propagate untranslated — labeling
        // them zip corruption would send the operator at the wrong
        // problem (r18 review, second pass)
        try Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch {
          case e @ (_: java.util.zip.ZipException | _: java.io.EOFException) =>
            throw new IllegalArgumentException(
              s"$zipPath!$memberName: corrupt member (${e.getMessage}) — " +
                "local header or deflate stream disagrees with the central directory", e)
        }
        finally in.close()
        // atomic-where-possible promote with the REPLACE_EXISTING
        // portability fallback (r18 advisor) — the shared sink idiom
        AtomicFiles.promote(tmp, dest)
      } finally Files.deleteIfExists(tmp)
      dest
    } finally zf.close()
  }
}
