package graft.ops

/** Write-once atomic publish shared by the physical index stores
  * ([[AnnIndex]], [[LexIndex]]): build into a pid-suffixed staging
  * directory, stamp `_DONE`, `Files.move(ATOMIC_MOVE)` to the stable
  * target; the loser of a concurrent cross-JVM race deletes its
  * staging and reads the winner's store. Within one JVM, callers wrap
  * [[ensure]] in a computeIfAbsent (single-flight) — two threads
  * building into the SAME pid-keyed staging dir would corrupt each
  * other mid-write.
  */
private[ops] object StoreCommit {

  /** Returns `target`, building it first if no `_DONE` stamp exists.
    * `build` receives the staging path and must write every file of
    * the store under it. */
  def ensure(target: String)(build: String => Unit): String = {
    if (new java.io.File(target, "_DONE").exists()) return target
    val staging = target + s"-stage-${ProcessHandle.current().pid}"
    build(staging)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(staging, "_DONE"), "ok")
    try
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staging),
        java.nio.file.Paths.get(target),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.AccessDeniedException |
           _: java.nio.file.DirectoryNotEmptyException =>
        // a concurrent JVM published first — read theirs, drop ours
        graft.TempDirs.deleteNow(staging)
    }
    require(new java.io.File(target, "_DONE").exists(),
      s"store publish failed for $target")
    target
  }

  private[ops] def slug(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]+", "-").replaceAll("^-|-$", "")
}
