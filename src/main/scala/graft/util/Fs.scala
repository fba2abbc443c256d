package graft.util

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the mains and the q19 staging query. */
object Fs {

  /** Recursive copy of a directory tree (plain files + dirs — staged
    * parquet artifacts; no symlink handling). Used to INSTALL a staged,
    * per-JVM deterministic artifact into a store generation dir as a
    * byte-identical copy instead of a recompute or a spark read→write
    * pass. Existing files at the destination are overwritten. */
  def copyRecursively(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          if (t.getParent != null) Files.createDirectories(t.getParent)
          Files.copy(p, t,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally walk.close()
  }

  /** Recursive delete, deepest-first; the walk stream is closed (it holds a
    * directory fd until GC otherwise). No-op for a missing path. */
  def deleteRecursively(root: Path): Unit = {
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }
  }
}
