package graft.cli

/** Teardown utility — the parquet-world analogue of the reference's
  * `post_cleanup.py:7-12` (DROP DATABASE for its two working databases):
  * removes the on-disk caches the engine creates, i.e. the cross-session
  * series-index cache ([[graft.engine.IndexCache]], default
  * `$TMPDIR/graft_index_cache`, overridable via `GRAFT_INDEX_CACHE`) and
  * the materialized IVF index dirs (`$TMPDIR/graft_ivf_*`). Both caches
  * are mtime-invalidated, so cleanup is about disk space, never
  * correctness. Prints what it removed; `--dry-run` only lists.
  *
  * Lifecycle: the IVF dirs are SESSION scratch — the code that builds one
  * registers it via [[deleteOnExit]], so a normally-exiting JVM leaves no
  * `graft_ivf_*` behind and this main is only needed after a crash (or to
  * drop the intentionally cross-session series-index cache).
  */
object Cleanup {

  private val exitDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register a scratch dir for recursive deletion at JVM exit (idempotent;
    * one shutdown hook regardless of call count). For per-session
    * materializations like the IVF index dirs — NOT for the cross-session
    * series-index cache, whose persistence is the point. */
  def deleteOnExit(path: String): Unit = {
    exitDirs.add(path)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        // per-dir isolation: one failing delete (permissions, a race with
        // Spark's own shutdown hooks) must not abort the remaining dirs
        exitDirs.forEach { p =>
          try deleteRecursively(new java.io.File(p))
          catch { case _: Throwable => () }
        }))
  }
  def main(args: Array[String]): Unit = {
    val dryRun = args.contains("--dry-run")
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val indexCache = new java.io.File(
      sys.env.getOrElse("GRAFT_INDEX_CACHE", s"$tmp/graft_index_cache"))
    val ivfDirs = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_ivf_"))
    val targets = (indexCache +: ivfDirs.toSeq).filter(_.exists())
    if (targets.isEmpty) { println("nothing to clean"); return }
    targets.foreach { d =>
      if (dryRun) println(s"would remove $d")
      else { deleteRecursively(d); println(s"removed $d") }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
