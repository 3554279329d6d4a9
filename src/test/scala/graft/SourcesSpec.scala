package graft

import java.nio.file.{Files, Paths}

import graft.sources.SectionedReport

class SourcesSpec extends SparkSpec {

  private def write(rel: String, content: String): String = {
    val p = Paths.get(s"${Q.scratch}/test/$rel")
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }

  test("FinalReport parser: marker scan, melt, suffix strip, empty→NULL") {
    val path = write("fr.txt",
      "noise\n[Sample Methylation Profile]\nTargetID\tX.AVG_Beta\tY.AVG_Beta\ncg1\t0.25\t\ncg2\t0.5\t0.75\n")
    val rows = SectionedReport.parseFinalReport(spark, path)
      .orderBy("target_id", "sample_id").collect()
    assert(rows.length == 4)
    assert(rows(0).getString(0) == "cg1" && rows(0).getString(1) == "X"
      && rows(0).getDouble(2) == 0.25)
    assert(rows(1).getString(1) == "Y" && rows(1).isNullAt(2)) // empty field → NULL
  }

  test("sample-report parser: keyword header detection + run prefix from filename") {
    write("reports/run7_x.txt",
      "junk line\nIndex\tSample ID\tOther\n9\tZ01\tfoo\n")
    val rows = SectionedReport.parseSampleReports(spark, s"${Q.scratch}/test/reports/*.txt")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 7)
    assert(rows(0).getString(1) == "7_9")
    assert(rows(0).getString(2) == "Z01")
  }

  test("zip member scan: nested paths, directory entries skipped, exact bytes back") {
    import graft.sources.ZipArchive
    import java.nio.file.{Files, Paths}
    val dir = s"${Q.scratch}/test/zips"
    Files.createDirectories(Paths.get(dir))
    // directory entry + nested member path + binary member content
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("sub/")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("sub/a_Grn.idat"))
    z.write(Array[Byte](0, 1, 2, -1)); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("notes.txt"))
    z.write("hello".getBytes("UTF-8")); z.closeEntry()
    z.close()
    Files.write(Paths.get(s"$dir/delivery.zip"), bos.toByteArray)
    Files.write(Paths.get(s"$dir/other.txt"), "not a zip".getBytes("UTF-8"))

    val rows = ZipArchive.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._2)
    assert(rows.length == 2) // dir entry and non-zip file both skipped
    assert(rows(0) == (("delivery.zip", "notes.txt", 5L, "hello".getBytes("UTF-8").toSeq)))
    assert(rows(1)._2 == "sub/a_Grn.idat" && rows(1)._4 == Seq[Byte](0, 1, 2, -1))
  }
}
