package graft

/** Process-scoped scratch directories for query bodies and probes.
  *
  * Registry queries materialize indexes, tables and stream inputs under
  * temp dirs whose contents must OUTLIVE the query function (the
  * returned DataFrame reads them lazily — Verify/Bench consume it after
  * the body returns), so eager deletion is wrong; but a full bench run
  * creates dozens of them, and leaving them behind leaks gigabytes of
  * /tmp per run. The correct scope is the JVM: every dir created here is
  * swept, recursively and best-effort, by one shutdown hook — a bench or
  * verify process leaves /tmp as it found it.
  */
object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** A fresh temp directory, registered for sweep at JVM exit. */
  def dir(prefix: String): String =
    register(java.nio.file.Files.createTempDirectory(prefix))

  /** A fresh checkpoint directory for an EPHEMERAL in-query stream —
    * prefers tmpfs (/dev/shm) when the box has one: a query-scoped
    * stream's offset/commit logs and state-store deltas are fsynced per
    * micro-batch, and on shared disk that fsync jitter dominated stream
    * timings (the [[graft.streaming.EventStreams.runToMemory]] finding,
    * extended to the index/table stream queries). Durable pipelines
    * pass their own directories to the operator APIs — this helper is
    * only for query bodies whose stream dies with the query. Swept at
    * exit like every scratch dir.
    */
  def ckptDir(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    register(
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      else java.nio.file.Files.createTempDirectory(prefix))
  }

  private def register(p: java.nio.file.Path): String = {
    dirs.add(p)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => sweep(), "graft-scratch-sweep"))
    p.toString
  }

  /** Best-effort recursive delete of every scratch dir created so far —
    * the shutdown hook's body, callable eagerly by tests/tools that know
    * no scratch-backed DataFrame is still live.
    */
  def sweep(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      try delete(p.toFile) catch { case _: Throwable => () }
      p = dirs.poll()
    }
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }
}
