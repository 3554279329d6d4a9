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
}
