package graft

/** JVM-exit cleanup for the harness's write-once temp dirs (BPE vocab
  * parquet memos, streaming stage/checkpoint dirs, artifact stores):
  * long sessions and repeated sweeps would otherwise accumulate orphan
  * directories in java.io.tmpdir. One shutdown hook, registered lazily
  * on first use; deletion is best-effort (the JVM is exiting — a
  * failed delete is a leaked temp dir, not an error).
  */
object TempDirs {
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      dirs.forEach { d =>
        try deleteRecursively(new java.io.File(d)) catch {
          case _: Throwable => ()
        }
      }
    }, "graft-tempdir-cleanup"))

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def register(path: String): String = {
    hook
    dirs.add(path)
    path
  }

  /** Immediate best-effort recursive delete (a staging dir that lost a
    * write-once publish race — no point keeping it until exit). */
  def deleteNow(path: String): Unit =
    try deleteRecursively(new java.io.File(path)) catch {
      case _: Throwable => ()
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
