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
