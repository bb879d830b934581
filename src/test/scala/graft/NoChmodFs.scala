package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystems whose setPermission never aborts the caller.
  *
  * Hadoop's RawLocalFileSystem.setPermission shells out (`chmod` via
  * Shell.runCommand) whenever the native hadoop library is absent, and the
  * FileContext-based streaming-checkpoint managers create files/dirs with
  * explicit permissions, so a sandbox that denies subprocess spawn aborts
  * streaming-checkpoint writes mid-epoch (seen as a
  * ChecksumCheckpointFileManager.createAtomic failure in the round-15
  * driver environment). Permissions on a local scratch checkpoint are
  * best-effort: attempt the real thing, swallow failures.
  */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    try super.setPermission(p, permission) catch { case _: Exception => () }
}

/** FileSystem-API registration (`fs.file.impl`). */
class NoChmodLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem) {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    try super.setPermission(p, permission) catch { case _: Exception => () }
}

private class NoChmodRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NoChmodRawLocalFileSystem, conf, "file", false) {
  override def getUriDefaultPort: Int = -1
}

/** AbstractFileSystem/FileContext registration
  * (`fs.AbstractFileSystem.file.impl`) — the path the default
  * FileContextBasedCheckpointFileManager takes. Must expose the
  * (URI, Configuration) constructor AbstractFileSystem.createFileSystem
  * looks up reflectively.
  */
class NoChmodLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NoChmodRawLocalFs(uri, conf))
