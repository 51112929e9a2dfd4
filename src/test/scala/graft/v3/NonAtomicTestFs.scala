package graft.v3

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A deliberately DEGRADED store for the commit-contract spec: rename
  * is copy+delete, last-writer-wins, and "succeeds" even when the
  * destination exists — legacy object-store semantics, the exact
  * degradation the lake's publish fence must survive. create(…,
  * overwrite=false) stays atomic (the conditional-put primitive the
  * store contract requires unconditionally; see Lake.scala's STORE
  * CONTRACT note). Registered under the `nonatomic:` scheme via
  * `fs.nonatomic.impl`. */
class NonAtomicTestFs extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  // RawLocalFileSystem's statuses load permissions LAZILY via
  // java.io.File(uri), which rejects any scheme but file: — return
  // plain eager statuses so listFiles/LocatedFileStatus work under
  // the nonatomic: scheme
  private def plain(st: org.apache.hadoop.fs.FileStatus) =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getPath)
  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    plain(super.getFileStatus(p))
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(plain)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // directory renames (Spark's output committer) keep the parent
    // semantics — the degradation under test is the FILE rename the
    // lock break and manifest publish rely on
    if (getFileStatus(src).isDirectory) return super.rename(src, dst)
    // copy (clobbering any existing destination), then delete — two
    // separate visible steps, no winner arbitration
    val in = open(src)
    val out = create(dst, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
    finally { in.close(); out.close() }
    delete(src, false)
    true
  }
}
