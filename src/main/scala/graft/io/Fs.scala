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

  /** Every `*.parquet` DATA file under `dir`, recursively — partition
    * subdirectories (`col=val/`) included, the layout's own `_`/`.`
    * prefixed sidecars (`_stats`, `_changes`, `_quarantine`, staging)
    * excluded, exactly matching what a Spark read of the directory sees.
    */
  def walkParquet(dir: Path): Seq[Path] = {
    def hidden(name: String) = name.startsWith("_") || name.startsWith(".")
    def walk(p: Path): Seq[Path] =
      listDir(p).flatMap { c =>
        val name = c.getFileName.toString
        if (hidden(name)) Nil
        else if (Files.isDirectory(c)) walk(c)
        else if (name.endsWith(".parquet")) Seq(c)
        else Nil
      }
    if (Files.isDirectory(dir)) walk(dir) else Nil
  }
}
