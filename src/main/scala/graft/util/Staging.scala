package graft.util

/** Per-JVM cache of staged input directories for the streaming replay gates.
  *
  * The file-stream gates (q19/q170/q180/q185/q188/q199/q204/q211) and the
  * stored-artifact gates (q176/q197) need their inputs ON DISK — a file
  * source reads a directory; a signature/code store is a parquet table.
  * Staging those inputs is harness setup, not operator work: in production
  * the files arrive from the ingest tier and the stores pre-exist. Re-writing
  * them on every execution made each bench pass pay the full derive+write
  * cost five times (2 warmup + 3 timed passes), and the r9 bench showed that
  * cost dominating the timed samples (q188: 59 s first pass vs 8 s steady).
  *
  * This cache stages each (label, srcDir) exactly once per JVM: the first
  * request runs the writer, later requests return the existing directory.
  * Correctness is unaffected — every staged artifact is a DETERMINISTIC
  * function of the source tables (writers here derive from the parquet
  * inputs only), so pass N reads byte-equivalent content to pass 1; Verify
  * executes each query once and behaves identically. The whole root is
  * deleted on JVM exit.
  *
  * Thread-safety: `computeIfAbsent` serializes writers per key. Like
  * [[Caches]], the runners are single-threaded per process; a concurrent
  * runner gets a consistent directory but may block on another key's writer.
  */
object Staging {

  private val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_staged_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => Fs.deleteRecursively(p)))
    p
  }

  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Directory holding `label`'s staged input derived from `srcDir`; `write`
    * runs exactly once per JVM per (label, srcDir) — on the first request —
    * and must populate the path it is given. */
  def dir(label: String, srcDir: String)(write: String => Unit): String = {
    val key = label + "|" + new java.io.File(srcDir).getCanonicalPath
    staged.computeIfAbsent(key, { _ =>
      val d = root.resolve(label + "_" + ids.getAndIncrement())
      write(d.toString)
      d.toString
    })
  }

  /** Drop every staged directory (test seam; runners rely on JVM exit). */
  def clear(): Unit = {
    staged.clear()
    val it = java.nio.file.Files.list(root).iterator()
    while (it.hasNext) Fs.deleteRecursively(it.next())
  }
}
