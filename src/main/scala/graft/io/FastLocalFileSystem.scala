package graft.io

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** A drop-in `file://` filesystem whose permission calls stay
  * in-process.
  *
  * Without `libhadoop` (the common case in containers and CI),
  * `RawLocalFileSystem.setPermission` falls back to forking a `chmod`
  * subprocess per call — and `FileOutputCommitter.setupJob` chmods the
  * `_temporary` job/task attempt dirs of EVERY staged parquet write, so
  * each commit in the warehouse pays a handful of process spawns of
  * pure driver latency (stack-sampled at ~15% of the DDL query family's
  * wall). `java.nio.file.Files.setPosixFilePermissions` is the same
  * syscall NativeIO would issue, without the fork.
  *
  * Semantics are unchanged: everything else (checksums included)
  * delegates to the stock `LocalFileSystem`/`RawLocalFileSystem`
  * machinery, and anything POSIX can't express in-process (sticky bit,
  * non-POSIX stores) falls back to the inherited shell path. Enable
  * with `spark.hadoop.fs.file.impl=graft.io.FastLocalFileSystem` — the
  * harness mains do; on HDFS/S3 deployments the knob is moot (different
  * scheme).
  */
class FastLocalFileSystem
  extends LocalFileSystem(new FastRawLocalFileSystem) {
  // FileSystem.createFileSystem instantiates via the no-arg ctor and
  // then calls initialize(uri, conf) — inherited behavior is correct.
}

class FastRawLocalFileSystem extends RawLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission
  import java.nio.file.attribute.PosixFilePermission._

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    if (permission.getStickyBit) { super.setPermission(p, permission); return }
    try {
      val perms = new java.util.HashSet[PosixFilePermission]()
      val m: Int = permission.toShort.toInt
      def add(bit: Int, perm: PosixFilePermission): Unit =
        if ((m & bit) != 0) { perms.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
      ()
    } catch {
      // NoSuchFile, non-POSIX stores, permission errors: the inherited
      // shell path is the behavior contract — let it succeed or raise
      // its own (identically-shaped) IOException
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}
