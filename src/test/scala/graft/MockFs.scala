package graft

/** RawLocalFileSystem re-registered under a NON-`file` scheme — the local
  * stand-in for an object store (s3a/gs/abfs), which the engine reaches
  * the same way: per path, by scheme, via `path.getFileSystem(conf)`.
  * Tests that run the zarr source/sink and keyword sidecars through
  * `mockfs:` prove the plumbing carries no hidden `file:` assumption
  * (default-FS lookups, `java.io.File` round-trips, scheme-stripping).
  *
  * Registered in a test via
  * `hadoopConfiguration.set("fs.mockfs.impl", "graft.MockFs")`.
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

/** Local filesystem masquerading under the `s3a` scheme: exercises the
  * object-store guards (scheme blocklists) with real I/O behind them.
  * Statuses are rebuilt with eager permissions — RawLocalFileSystem's
  * lazy permission stat goes through `new java.io.File(path.toUri)`,
  * which rejects any non-`file` scheme.
  */
class S3aLikeLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  import org.apache.hadoop.fs.permission.FsPermission
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      FsPermission.createImmutable(if (s.isDirectory) 493.toShort else 420.toShort),
      "test", "test", s.getPath)
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

/** [[S3aLikeLocalFs]] whose `rename` IS the flat-object-store mechanic:
  * a file-by-file copy of the tree followed by a delete of the source —
  * non-atomic by construction, not just by scheme string. A test-set
  * crash plan aborts a selected rename either at entry (the
  * between-renames window) or mid-copy after N files (the torn window a
  * real crash leaves: source intact, destination PARTIAL), so the
  * non-atomic-rename guard's reason can be exercised against the
  * semantics it actually guards against.
  */
class CopyRenameS3aFs extends S3aLikeLocalFs {
  import org.apache.hadoop.fs.Path
  override def rename(src: Path, dst: Path): Boolean = {
    val crashing = CopyRenameS3aFs.crashWhen(src, dst)
    if (crashing && CopyRenameS3aFs.crashAfterFiles < 0)
      throw new java.io.IOException(s"simulated crash at rename start: $src -> $dst")
    var copied = 0
    def walk(s: Path, d: Path): Unit = {
      if (getFileStatus(s).isDirectory) {
        mkdirs(d)
        listStatus(s).foreach(c => walk(c.getPath, new Path(d, c.getPath.getName)))
      } else {
        if (crashing && copied >= CopyRenameS3aFs.crashAfterFiles)
          throw new java.io.IOException(s"simulated crash mid-rename-copy: $s")
        org.apache.hadoop.fs.FileUtil.copy(this, s, this, d, false, getConf)
        copied += 1
      }
    }
    walk(src, dst)
    delete(src, true)
    true
  }
}

/** [[S3aLikeLocalFs]] under its own scheme whose LISTINGS lag writes —
  * the object-store list-after-write consistency gap: any path whose
  * name ends with an entry of [[ListLagFs.hidden]] stays OUT of every
  * directory listing (and so out of every glob that routes through one)
  * while point reads — `getFileStatus` / `exists` / `open` — keep
  * succeeding. That is the GET-consistent / LIST-lagged model of
  * S3-class stores. Tests set `hidden` to carve the lag window and clear
  * it to simulate the listing catching up.
  */
class ListLagFs extends S3aLikeLocalFs {
  import org.apache.hadoop.fs.{FileStatus, Path}
  override def getScheme: String = "laglist"
  override def getUri: java.net.URI = java.net.URI.create("laglist:///")
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).filterNot(s => ListLagFs.isHidden(s.getPath))
}

object ListLagFs {
  /** Path suffixes invisible to LIST (never to GET). */
  @volatile var hidden: Seq[String] = Nil
  private[graft] def isHidden(p: org.apache.hadoop.fs.Path): Boolean =
    hidden.exists(h => p.toUri.getPath.endsWith(h))
}

/** [[S3aLikeLocalFs]] under the `mpu` scheme whose CREATE is the
  * multipart-upload mechanic of S3-class stores: every byte written to
  * an open stream lands in a staging object (`.mpu/<name>.part` — the
  * uploaded-but-uncommitted parts), INVISIBLE at the target path until
  * `close()` completes the upload, which installs the object atomically
  * (the CompleteMultipartUpload contract). A crash before complete —
  * simulated by [[MultipartFs.crashBeforeComplete]] — leaves NO object
  * at the target (not a truncated one: S3 never exposes partial
  * uploads) while the abandoned parts LINGER in staging until an abort
  * or lifecycle rule cleans them. This is the model the
  * committer-bypassing writers (fragment sidecars, TokenBin,
  * WebDataset) must be correct under.
  */
class MultipartFs extends S3aLikeLocalFs {
  import org.apache.hadoop.fs.{FSDataOutputStream, Path}
  import org.apache.hadoop.fs.permission.FsPermission
  import org.apache.hadoop.util.Progressable
  override def getScheme: String = "mpu"
  override def getUri: java.net.URI = java.net.URI.create("mpu:///")
  // RawLocalFileSystem implements the no-permission create variant
  // directly (the permission variant routes through it after a chmod),
  // so THIS is the overload every FileSystem.create call funnels into
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val staging = MultipartFs.stagingFor(f)
    val under = super.create(staging, true, bufferSize,
      replication, blockSize, progress)
    val self = this
    val stream = new java.io.OutputStream {
      override def write(b: Int): Unit = under.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        under.write(b, off, len)
      override def flush(): Unit = under.flush()
      override def close(): Unit = {
        under.close()
        if (MultipartFs.crashBeforeComplete(f))
          // the upload dies before CompleteMultipartUpload: parts
          // linger at the staging path, the target NEVER appears
          throw new java.io.IOException(
            s"simulated crash before multipart complete: $f")
        if (!overwrite && self.exists(f))
          throw new java.io.IOException(s"target exists: $f")
        self.delete(f, false)
        if (!self.rename(staging, f))
          throw new java.io.IOException(s"multipart install failed: $f")
      }
    }
    new FSDataOutputStream(stream, null)
  }
}

object MultipartFs {
  /** Targets whose complete step crashes (leaving lingering parts). */
  @volatile var crashBeforeComplete: org.apache.hadoop.fs.Path => Boolean =
    _ => false
  def stagingFor(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(f.getParent,
      s".mpu/${f.getName}.part")
}

object CopyRenameS3aFs {
  /** Which rename to crash (matched on exact src/dst). */
  @volatile var crashWhen: (org.apache.hadoop.fs.Path,
    org.apache.hadoop.fs.Path) => Boolean = (_, _) => false
  /** Crash after copying this many files; negative = crash at entry. */
  @volatile var crashAfterFiles: Int = -1
}
