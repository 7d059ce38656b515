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

/** The FileContext-side twin (`fs.AbstractFileSystem.file.impl`).
  * Structured-streaming's CheckpointFileManager prefers FileContext,
  * which resolves `file:` through AbstractFileSystem — a SEPARATE
  * registry that `fs.file.impl` never touches, so the offset/commit log
  * writes of every micro-batch were still forking a chmod per file
  * (r21 thread dumps: Shell.runCommand under markMicroBatchStart/End).
  * Mirrors Hadoop's own RawLocalFs: a DelegateToFileSystem over the
  * fork-free raw fs. The (URI, Configuration) ctor is the reflective
  * contract AbstractFileSystem.createFileSystem requires. */
final class NioLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NioRawLocalFileSystem, conf, "file", false) {
  override def getUriDefaultPort: Int = -1

  /** The delegate route (`FileSystem.rename(src, dst, OVERWRITE)`)
    * consults `getFileLinkStatus`, which on a local fs without
    * libhadoop forks a `stat`/`ls` PER RENAME — and streaming's
    * checkpoint manager renames once per micro-batch log file (the
    * r21 dumps showed Shell.runCommand + ExitCodeException under
    * renameTempFile). `Files.move(ATOMIC_MOVE, REPLACE_EXISTING)` is
    * the same atomic-overwrite contract in one syscall. Overwriting a
    * non-empty directory fails (as it must); renaming INTO an existing
    * directory keeps the stock move-under semantics. */
  override def renameInternal(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path, overwrite: Boolean): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption => O}
    val s = Paths.get(src.toUri.getPath)
    val d = Paths.get(dst.toUri.getPath)
    if (!overwrite && Files.exists(d))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"rename destination $dst already exists")
    if (Files.isDirectory(d))
      // stock semantics: renaming onto an existing dir moves UNDER it
      // (only legal when empty for overwrite=false — delegate decides)
      super.renameInternal(src, dst, overwrite)
    else if (overwrite)
      Files.move(s, d, O.REPLACE_EXISTING, O.ATOMIC_MOVE)
    else Files.move(s, d, O.ATOMIC_MOVE)
  }
}
