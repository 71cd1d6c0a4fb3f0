package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.HeadN
import org.scalatest.funsuite.AnyFunSuite

class HeadNSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("headn").toFile
    d.deleteOnExit(); d
  }

  test("headLines takes exactly the first N lines in file order") {
    val dir = tmpDir()
    val f = new File(dir, "a.csv")
    Files.write(f.toPath,
      (1 to 20).map(i => s"row$i,val$i").mkString("\n").getBytes(StandardCharsets.UTF_8))
    val head = HeadN.headLines(spark, f.getAbsolutePath, 5).collect()
    assert(head.toSeq == (1 to 5).map(i => s"row$i,val$i"))
  }

  test("headZipEntries heads every entry, numbered, without over-reading") {
    val dir = tmpDir()
    val f = new File(dir, "arch.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    for (e <- Seq("one.csv", "sub/two.csv")) {
      zos.putNextEntry(new ZipEntry(e))
      zos.write((1 to 30).map(i => s"$e-line$i").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    val rows = HeadN.headZipEntries(spark, f.getAbsolutePath, 10).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 20)
    val byEntry = rows.groupBy(_._1)
    assert(byEntry.keySet == Set("one.csv", "sub/two.csv"))
    byEntry.foreach { case (e, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L))
      assert(sorted.map(_._3).toSeq == (1 to 10).map(i => s"$e-line$i"))
    }
  }

  test("headZipEntries with n=0 emits nothing") {
    val dir = tmpDir()
    val f = new File(dir, "z.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("x.txt")); zos.write("a\nb".getBytes); zos.closeEntry()
    zos.close()
    assert(HeadN.headZipEntries(spark, f.getAbsolutePath, 0).count() == 0)
  }
}
