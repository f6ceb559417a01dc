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
  /** Write a tiny `(file STRING, seq BIGINT)` table as ONE parquet part
    * file, driver-side — no Spark job. The eq-delete `_eqseq` sidecar
    * is O(files-per-commit) rows of a few dozen bytes each; submitting
    * a distributed job to write it cost more scheduling than writing
    * (every maintained-table commit paid one extra job). Schema merges
    * cleanly with the Spark-written parts older commits carried
    * (optional vs required binary → nullable string), and the part name
    * follows the `part-*.parquet` convention every sidecar walker
    * filters on. Snappy, like Spark's default.
    */
  def writeFileSeqParquet(dir: Path, rows: Seq[(String, Long)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.schema.MessageTypeParser
    Files.createDirectories(dir)
    val schema = MessageTypeParser.parseMessageType(
      "message eqseq { required binary file (UTF8); required int64 seq; }")
    val out = dir.resolve(
      s"part-00000-${java.util.UUID.randomUUID()}-c000.snappy.parquet")
    val conf = new org.apache.hadoop.conf.Configuration(false)
    // raw local FS: the default (checksummed) LocalFileSystem would
    // drop a stray .part-*.crc next to the part file — harmless
    // (dot-hidden to every walker) but noise in a sidecar dir whose
    // other parts Spark wrote without one
    conf.set("fs.file.impl",
      classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(out.toUri), conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (f, s) =>
      val g = factory.newGroup()
      g.append("file", f)
      g.append("seq", s)
      writer.write(g)
    } finally writer.close()
  }

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
