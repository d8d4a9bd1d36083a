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
