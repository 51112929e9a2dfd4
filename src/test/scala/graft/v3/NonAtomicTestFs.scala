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

/** The NEGATIVE twin of [[NonAtomicTestFs]]: here it is
  * CREATE-NO-OVERWRITE that degrades — `create(…, overwrite = false)`
  * silently clobbers an existing file, last-writer-wins (a raw object
  * store without conditional PUTs). The store contract documents this
  * primitive as MANDATORY for mutual exclusion; the spec pins what
  * the protocol still guarantees without it: commits may interleave,
  * but the token-checked publish fence plus unique-name version
  * publishes mean the outcome is one winner + a LOUD abort, never a
  * silently lost update. Rename stays atomic (the opposite corner
  * from NonAtomicTestFs). Registered under `lwwcreate:` via
  * `fs.lwwcreate.impl`. */
class LwwCreateTestFs extends RawLocalFileSystem {
  override def getScheme: String = "lwwcreate"
  override def getUri: URI = URI.create("lwwcreate:///")

  private def plain(st: org.apache.hadoop.fs.FileStatus) =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getPath)
  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    plain(super.getFileStatus(p))
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(plain)

  // RawLocalFileSystem exposes THREE public create entry points (the
  // bare-boolean one FileSystem.create(Path, boolean) routes to, the
  // permission-carrying one, and createNonRecursive) — drop the
  // exclusivity the caller asked for in all of them
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication,
      blockSize, progress)

  override def createNonRecursive(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.createNonRecursive(f, permission, true, bufferSize,
      replication, blockSize, progress)
}
