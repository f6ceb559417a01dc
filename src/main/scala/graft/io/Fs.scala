package graft.io

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by sinks, streaming cleanup, and the
  * fixture-copy caches (one implementation of the walk-and-delete idiom
  * instead of three).
  */
object Fs {

  /** Recursive delete, streams closed (Files.walk leaks an fd otherwise). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }

  /** Directory listing with the stream closed. */
  def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.toArray.toSeq.map(_.asInstanceOf[Path])
    finally s.close()
  }
}
