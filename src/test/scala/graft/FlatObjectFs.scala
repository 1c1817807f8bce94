package graft

import org.apache.hadoop.fs.Path

/** S3-shaped test filesystem: local disk behind the `s3a` scheme with
  * rename DEGRADED to copy+delete — the flat-object-store posture the
  * protocols must survive ([[graft.sources.AtomicRename.isAtomic]] reads
  * the scheme and flips every index-store protocol into its object-store
  * commit path: marker commits, PUT fences, pointer compacts).
  *
  * What this wrapper certifies: the protocols never RELY on an atomic
  * rename (the soak's crash points land between protocol phases, and the
  * exactly-once oracles still converge). What it deliberately does NOT
  * emulate: S3's lack of O_EXCL create (the lease/lock claims run on
  * local O_EXCL here — their object-store weakening is a documented
  * detection-window narrowing, not a crash-safety dependency) and
  * list-after-write consistency (current S3 is strongly consistent).
  *
  * Registered per-suite via `fs.s3a.impl` in the Hadoop conf; paths look
  * like `s3a://test/tmp/...` and land on the local disk at `/tmp/...`. */
class FlatObjectFs extends org.apache.hadoop.fs.RawLocalFileSystem {

  override def getScheme: String = "s3a"

  override def getUri: java.net.URI = java.net.URI.create("s3a://test")

  /** Flat-store rename: recursive copy then delete — visibly NON-atomic
    * (a crash mid-way leaves both halves), exactly what a protocol that
    * depended on rename atomicity would corrupt under. */
  override def rename(src: Path, dst: Path): Boolean =
    if (!exists(src)) false
    else org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      /* deleteSource = */ true, /* overwrite = */ true, getConf)

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus lazy-loads
  // permissions via `new java.io.File(path.toUri)`, which rejects any
  // scheme but "file" — materialize plain FileStatuses with a fixed
  // permission so the lazy load never fires under the s3a scheme
  private def fix(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(
      st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault,
      "test", "test", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    fix(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(fix)
}

/** HDFS-semantics test filesystem: local disk behind an `mockhdfs` scheme
  * whose rename REFUSES an existing destination (returns false without
  * touching either path) — exactly HDFS's contract, and the semantics the
  * round-13 lease-renewal fix was justified by ("the previous temp+rename
  * renewal was a silent NO-OP on HDFS-class filesystems"). WriterLeaseSpec
  * drives renewal through this FS to pin that the epoch still advances:
  * the pre-fix rename-over renewal fails this spec by construction (its
  * rename returns false every tick and the epoch never moves). */
class HdfsLikeFs extends org.apache.hadoop.fs.RawLocalFileSystem {

  override def getScheme: String = "mockhdfs"

  override def getUri: java.net.URI = java.net.URI.create("mockhdfs://test")

  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)

  private def fix(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(
      st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault,
      "test", "test", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    fix(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(fix)
}
