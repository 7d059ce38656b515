package graft.hadoop

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.util.{EnumSet => JEnumSet}

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` FileSystem that chmods through java.nio instead of forking.
  *
  * Why this exists (r21 optimization, guide §7.3 driver dwell): the stock
  * local filesystem calls `setPermission` on EVERY file create and mkdir,
  * and with no libhadoop.so on the box (`NativeIO.isAvailable == false` —
  * the common case outside managed Hadoop clusters) Hadoop falls back to
  * `Shell.execCommand("chmod", ...)`: a full fork/exec PER FILE. Thread
  * dumps of the r21 lifecycle keys showed `Shell.runCommand` under
  * `RawLocalFileSystem.setPermission`/`mkdirs` as the single hottest
  * driver-dwell signature — every 16-bucket fanout commit paid 16+ forks
  * before a byte of data moved. `Files.setPosixFilePermissions` is the
  * same syscall (fchmodat) without the process launch.
  *
  * Modes java.nio cannot express (sticky/setuid/setgid, > 0777) fall back
  * to the stock shell path, so semantics are unchanged — only the
  * mechanism for the 99.9% case (plain rwx bits) is fork-free.
  *
  * Registered by GraftSession as `fs.file.impl`. Extends [[LocalFileSystem]]
  * (not RawLocalFileSystem directly) because `FileSystem.getLocal` CASTS
  * the cached `file:` fs to LocalFileSystem. Checksum sidecars stay ON —
  * this class changes how permissions are set, nothing about what is
  * written; disabling CRCs is a separate decision this engine does not
  * take silently.
  */
final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val mode = permission.toShort.toInt
    if ((mode & ~0x1ff) != 0) {
      // sticky/setuid/setgid bits: java.nio PosixFilePermission cannot
      // carry them — keep the stock (NativeIO-or-shell) behavior
      super.setPermission(p, permission)
    } else {
      val perms = JEnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      if ((mode & 0x100) != 0) perms.add(OWNER_READ)
      if ((mode & 0x080) != 0) perms.add(OWNER_WRITE)
      if ((mode & 0x040) != 0) perms.add(OWNER_EXECUTE)
      if ((mode & 0x020) != 0) perms.add(GROUP_READ)
      if ((mode & 0x010) != 0) perms.add(GROUP_WRITE)
      if ((mode & 0x008) != 0) perms.add(GROUP_EXECUTE)
      if ((mode & 0x004) != 0) perms.add(OTHERS_READ)
      if ((mode & 0x002) != 0) perms.add(OTHERS_WRITE)
      if ((mode & 0x001) != 0) perms.add(OTHERS_EXECUTE)
      Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    }
  }
}

final class NioLocalFileSystem
  extends LocalFileSystem(new NioRawLocalFileSystem)
