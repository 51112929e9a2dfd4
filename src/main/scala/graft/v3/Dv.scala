package graft.v3

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Deletion vectors — merge-on-read row-level deletes (Delta's DV
  * files / Iceberg's position deletes, at their smallest): a small
  * DELETE/upsert against a large file writes a per-file sidecar of
  * deleted ROW POSITIONS instead of copy-on-write rewriting the whole
  * file, and every scan of the file filters those positions out. At
  * 100 TB with trickle deletes (GDPR erasure, tombstone streams) this
  * removes the dominant write-amplification cost: deleting one row
  * from a 1 GB file costs a few hundred bytes, not a 1 GB rewrite.
  *
  * Physical format (`$root/_dv/$table/dv-<uuid>.dv`): magic `GDV1`,
  * a varint count, then the sorted positions delta-varint encoded —
  * trickle-delete vectors are sparse, so deltas compress well without
  * pulling in an external bitmap library. DV files are IMMUTABLE and
  * content-complete: each one carries the file's ENTIRE deleted set
  * (a later delete merges the old vector with the new positions into
  * a fresh file), so the manifest maps a data file to at most ONE
  * current vector and readers never merge at scan time.
  *
  * Lifecycle (all anchored to the manifest commit log — see
  * [[Lake]]'s `#dv` body lines):
  *  - written by [[Lake.deleteWhere]]/[[Lake.upsert]] when the churn
  *    fraction of a touched file is under `dv.maxFraction` (else CoW
  *    as before; the property defaults to 0 = off, the published
  *    formats' opt-in posture);
  *  - applied at scan via a codegen'd row filter over the parquet
  *    metadata columns (`_metadata.file_path`, `_metadata.row_index`)
  *    on exactly the DV-bearing files — DV-free files (and tables)
  *    plan byte-identically to before;
  *  - materialized by compaction/clustering (the rewrite reads
  *    through the vector and the output drops the reference);
  *  - pinned by snapshots (the snapshot body records each file's
  *    vector) and by retained commits (CDC replays historical
  *    vectors); [[Lake.vacuum]] frees only unreferenced vectors.
  */
object Dv {

  /** One data file's current deletion vector: the sidecar file NAME
    * (under `$root/_dv/$table/`) and its position count (cardinality
    * — lets planners subtract live-row counts without opening it). */
  final case class Ref(name: String, cardinality: Long)

  private val Magic = 0x47445631 // "GDV1"

  /** Encode sorted ascending positions (caller sorts; dupes dropped). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + positions.length * 2)
    val d = new java.io.DataOutputStream(out)
    d.writeInt(Magic)
    writeVar(d, positions.length.toLong)
    var prev = 0L
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p >= prev || i == 0,
        s"dv positions must be sorted ascending (got $p after $prev)")
      writeVar(d, if (i == 0) p else p - prev)
      prev = p
      i += 1
    }
    d.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a GDV1 deletion vector")
    val n = readVar(in)
    require(n >= 0 && n <= Int.MaxValue, s"corrupt dv count $n")
    val out = new Array[Long](n.toInt)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = (if (i == 0) 0L else prev) + readVar(in)
      out(i.toInt) = prev
      i += 1
    }
    out
  }

  private def writeVar(d: java.io.DataOutputStream, v0: Long): Unit = {
    require(v0 >= 0L, s"dv varint must be non-negative (got $v0)")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      d.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    d.writeByte(v.toInt)
  }

  private def readVar(in: java.io.DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  /** Per-JVM vector cache (driver AND executors): DV files are
    * immutable and UUID-named (a path never carries different bytes),
    * so entries never go stale; bounded by a clear-all stop-loss —
    * vectors are churn-sized, 4096 of them is already an anomaly. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def positions(conf: Configuration, path: String): Array[Long] = {
    val got = cache.get(path)
    if (got != null) return got
    if (cache.size > 4096) cache.clear()
    cache.computeIfAbsent(path, p => {
      val hp = new Path(p)
      val in = hp.getFileSystem(conf).open(hp)
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      deserialize(bytes)
    })
  }

  /** a \ b over two sorted position arrays — the CDC diff legs
    * ("rows newly deleted" = cur \ prev, "rows resurrected by a
    * restore" = prev \ cur). */
  def minus(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.result()
  }

  /** Sorted union of two sorted position arrays (old vector ∪ a new
    * delete's positions). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = Array.newBuilder[Long]
    out.sizeHint(a.length + b.length)
    var i = 0
    var j = 0
    while (i < a.length || j < b.length) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      out += take
    }
    out.result()
  }
}
