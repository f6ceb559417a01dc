package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The in-process chmod path must be bit-identical to the stock shell
  * fallback — [[graft.io.FastLocalFileSystem]] only changes HOW the
  * permission syscall is issued, never what lands on disk.
  */
class FastLocalFsSpec extends AnyFunSuite {

  private def posixOf(p: java.nio.file.Path): String =
    java.nio.file.attribute.PosixFilePermissions.toString(
      Files.getPosixFilePermissions(p))

  test("setPermission lands the same bits as the stock local FS, files and dirs") {
    val conf = new Configuration(false)
    val fast = new graft.io.FastRawLocalFileSystem
    fast.initialize(java.net.URI.create("file:///"), conf)
    val stock = new org.apache.hadoop.fs.RawLocalFileSystem
    stock.initialize(java.net.URI.create("file:///"), conf)
    val dir = Files.createTempDirectory("graft_fastfs")
    try {
      val modes = Seq("700", "755", "644", "600", "777", "444", "750")
      for (m <- modes) {
        val fFast = dir.resolve(s"fast_$m"); Files.createFile(fFast)
        val fStock = dir.resolve(s"stock_$m"); Files.createFile(fStock)
        val perm = new FsPermission(Integer.parseInt(m, 8).toShort)
        fast.setPermission(new Path(fFast.toString), perm)
        stock.setPermission(new Path(fStock.toString), perm)
        assert(posixOf(fFast) == posixOf(fStock), s"mode $m diverged")
        val dFast = dir.resolve(s"dfast_$m"); Files.createDirectory(dFast)
        val dStock = dir.resolve(s"dstock_$m"); Files.createDirectory(dStock)
        fast.setPermission(new Path(dFast.toString), perm)
        stock.setPermission(new Path(dStock.toString), perm)
        assert(posixOf(dFast) == posixOf(dStock), s"dir mode $m diverged")
      }
      // missing target raises an IOException either way
      intercept[java.io.IOException] {
        fast.setPermission(new Path(dir.resolve("absent").toString),
          new FsPermission(Integer.parseInt("644", 8).toShort))
      }
    } finally {
      // restore writability so the temp tree deletes
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.foreach { p =>
        p.toFile.setWritable(true); ()
      }
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("fs.file.impl resolves the fast FS and the committer mkdirs path works") {
    // the registration path the harness mains use — without touching
    // the shared test Spark session (which deliberately stays stock)
    val conf = new Configuration()
    conf.set("fs.file.impl", "graft.io.FastLocalFileSystem")
    conf.setBoolean("fs.file.impl.disable.cache", true)
    val fs = new Path("/tmp").getFileSystem(conf)
    assert(fs.getClass.getName == "graft.io.FastLocalFileSystem",
      s"expected fast FS, got ${fs.getClass.getName}")
    val dir = Files.createTempDirectory("graft_fastfs_mk")
    try {
      // the exact committer call shape: mkdirs with an explicit
      // permission (FileOutputCommitter.setupJob's _temporary tree)
      val p = new Path(s"$dir/_temporary/0")
      assert(fs.mkdirs(p, new FsPermission(Integer.parseInt("700", 8).toShort)))
      assert(Files.isDirectory(java.nio.file.Paths.get(s"$dir/_temporary/0")))
      val st = fs.getFileStatus(p)
      assert(st.isDirectory)
      // write-read roundtrip through the checksum wrapper
      val f = new Path(s"$dir/data.bin")
      val out = fs.create(f)
      out.write(Array.tabulate[Byte](64)(_.toByte)); out.close()
      val in = fs.open(f)
      val buf = new Array[Byte](64)
      in.readFully(buf); in.close()
      assert(buf(63) == 63.toByte)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach { p =>
        p.toFile.setWritable(true); Files.delete(p)
      }
    }
  }
}
