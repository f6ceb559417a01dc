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

  /** Reserved name of a legacy-layout leg directory inside a version
    * dir (`_layout<k>` — metadata-only partition evolution,
    * [[graft.ops.Sinks.repartitionTable]] with `metadataOnly`). The
    * underscore keeps legs INVISIBLE to a plain Spark directory read
    * (the top-level scan must only see the current layout), but the
    * versioned layout's own walkers must still see their data files —
    * a leg's files are table data, not sidecar metadata.
    */
  def isLayoutLeg(name: String): Boolean =
    name.startsWith("_layout") && name.length > "_layout".length &&
      name.drop("_layout".length).forall(_.isDigit)

  /** Every `*.parquet` DATA file under `dir`, recursively — partition
    * subdirectories (`col=val/`) included, legacy-layout legs
    * (`_layout<k>/`, see [[isLayoutLeg]]) included, the layout's own
    * `_`/`.` prefixed sidecars (`_stats`, `_changes`, `_quarantine`,
    * staging) excluded. NOTE: this is what the versioned layout's OWN
    * machinery (sidecar keys, carries, inventories) considers the
    * version's data; a plain Spark read of the directory sees only the
    * top-level (current-layout) subset because legs are `_`-hidden.
    */
  def walkParquet(dir: Path): Seq[Path] = {
    // Spark's own hidden-path rule (HadoopFSUtils): `.`-prefixed always
    // hidden; `_`-prefixed hidden UNLESS the name contains `=` — a
    // partition directory of a `_`-named column (hidden partitioning's
    // `_tp_ts__day=2024-01-01`) is DATA, not metadata
    def hidden(name: String) =
      name.startsWith(".") ||
        (name.startsWith("_") && !name.contains("=") && !isLayoutLeg(name))
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
