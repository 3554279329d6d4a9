package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Poobah
import graft.sources.Idat

/** S5 codec (sources/Idat.scala) + K7 pOOBAH kernel (ops/Poobah.scala).
  * Codec layout per the public illuminaio spec; pOOBAH per Zhou et al.
  * NAR 2018 (reference gate /root/reference/idat.r:71).
  */
class IdatSpec extends SparkSpec {

  private val dir = s"${Q.scratch}/test/idat"

  test("bytes→parse round-trip preserves beads (address-sorted), barcode, chip type") {
    val beads = Seq(
      Idat.Bead(500, 12000, 300, 12),
      Idat.Bead(3, 1, 0, 0), // minima
      Idat.Bead(77, 65535, 65535, 255)) // uint16/uint8 maxima
    val data = Idat.bytes(beads, "205243950018", "BeadChip 8x5")
    val (back, barcode, chip) = Idat.parse(data)
    assert(barcode == "205243950018" && chip == "BeadChip 8x5")
    // scanner order: ascending address
    assert(back.map(_.address) == Seq(3, 77, 500))
    assert(back.toSet == beads.toSet)
  }

  test("writer fails fast on out-of-range intensities instead of truncating") {
    intercept[IllegalArgumentException] {
      Idat.bytes(Seq(Idat.Bead(1, 65536, 0, 0)), "b", "c")
    }
    intercept[IllegalArgumentException] {
      Idat.bytes(Seq(Idat.Bead(1, 0, 0, 256)), "b", "c")
    }
  }

  test("7-bit length prefix handles strings past one varint byte (>127 bytes)") {
    val longBarcode = "x" * 300
    val (_, barcode, _) = Idat.parse(Idat.bytes(Seq(Idat.Bead(1, 2, 3, 4)), longBarcode, "c"))
    assert(barcode == longBarcode)
  }

  test("parser tolerates unknown directory fields (RunInfo/MidBlock et al)") {
    // splice an extra (code 400 RedGreen, int32) directory entry into a
    // valid file — real files carry many fields this engine skips. The
    // directory grows by one 10-byte slot, so every existing payload
    // offset shifts by 10; the unknown payload is appended at the end.
    val base = Idat.bytes(Seq(Idat.Bead(9, 10, 11, 12)), "bc", "ct")
    val buf = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(4 + 8)
    val nFields = buf.getInt
    val dirStart = 4 + 8 + 4
    val dirLen = nFields * 10
    val out = new ByteArrayOutputStream()
    out.write(base, 0, 4 + 8)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(nFields + 1).array())
    (0 until nFields).foreach { i =>
      val e = ByteBuffer.wrap(base, dirStart + i * 10, 10).order(ByteOrder.LITTLE_ENDIAN)
      val code = e.getShort
      val off = e.getLong + 10
      val ne = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
      ne.putShort(code).putLong(off)
      out.write(ne.array())
    }
    val ue = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    ue.putShort(400.toShort).putLong(base.length + 10L)
    out.write(ue.array())
    out.write(base, dirStart + dirLen, base.length - dirStart - dirLen)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(1).array())
    val (beads, barcode, chip) = Idat.parse(out.toByteArray)
    assert(beads == Seq(Idat.Bead(9, 10, 11, 12)) && barcode == "bc" && chip == "ct")
  }

  test("distributed write→scan equals source rows (filename carries sample+channel)") {
    import spark.implicits._
    val src = Seq(
      ("S001", "Grn", 11, 100, 5, 3), ("S001", "Grn", 12, 200, 6, 4),
      ("S001", "Red", 11, 300, 7, 5),
      ("S002", "Grn", 11, 400, 8, 6), ("S002", "Red", 12, 500, 9, 7))
      .toDF("sample_id", "channel", "address", "mean", "sd", "nbeads")
      .withColumn("barcode", concat(lit("BC_"), col("sample_id")))
      .withColumn("chip_type", lit("ChipT"))
    val d = s"$dir/dist"
    Idat.writeFiles(src, d)
    assert(Files.exists(Paths.get(s"$d/_SUCCESS")))
    assert(Files.exists(Paths.get(s"$d/S001_Grn.idat")))
    val back = Idat.read(spark, d)
    assert(back.count() == 5)
    val expect = src.collect().map(_.toSeq).toSet
    assert(back.select("sample_id", "channel", "address", "mean", "sd",
      "nbeads", "barcode", "chip_type").collect().map(_.toSeq).toSet == expect)
  }

  test("pOOBAH ecdf p-values match a hand-computed planted background") {
    import spark.implicits._
    // One sample. Type I Grn probe k=4 (addresses 1e8+4 U, 2e8+4 M), its
    // OOB reads land in Red. Type I Red probe k=2 (k%4!=0 → design Red),
    // OOB in Grn. Type II probe k=7 (address 7): M in Grn, U in Red.
    def row(ch: String, addr: Int, mean: Int) = ("S001", ch, addr, mean, 1, 1)
    val rows = Seq(
      // probe cg0000004 (type I, design Grn): U=1000, M=3000 → signal 4000
      row("Grn", 100000004, 1000), row("Grn", 200000004, 3000),
      // its OOB in Red: 50, 75
      row("Red", 100000004, 50), row("Red", 200000004, 75),
      // probe cg0000002 (type I, design Red): U=10, M=30 → signal 40
      row("Red", 100000002, 10), row("Red", 200000002, 30),
      // its OOB in Grn: 500, 2000
      row("Grn", 100000002, 500), row("Grn", 200000002, 2000),
      // probe cg0000007 (type II): M(Grn)=600, U(Red)=60
      row("Grn", 7, 600), row("Red", 7, 60))
      .toDF("sample_id", "channel", "address", "mean", "sd", "nbeads")
    val dec = Poobah.decodeAddress(rows)
    val p = Poobah.detectionP(dec).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    // Grn background {500, 2000} (n=2); Red background {50, 75} (n=2)
    // cg0000004: signal 4000 vs Grn ecdf → cnt=2 → p = 1 - 2/2 = 0
    assert(p("cg0000004") == 0.0)
    // cg0000002: signal 40 vs Red ecdf → cnt=0 → p = 1
    assert(p("cg0000002") == 1.0)
    // cg0000007: Grn side 600 → cnt=1 → p=0.5; Red side 60 → cnt=1 → p=0.5; min = 0.5
    assert(p("cg0000007") == 0.5)

    // betas: type I → 3000/(3000+1000); type II → 600/(600+60)
    val b = Poobah.betas(dec).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(b("cg0000004") == 3000.0 / 4000.0)
    assert(b("cg0000002") == 30.0 / 40.0)
    assert(b("cg0000007") == 600.0 / 660.0)
  }

  test("ecdf tie semantics: oob values equal to the signal count as ≤ (is_oob-desc ordering)") {
    import spark.implicits._
    def row(ch: String, addr: Int, mean: Int) = ("S001", ch, addr, mean, 1, 1)
    val rows = Seq(
      // k=4 (design Grn): in-band signal 1000+3000; OOB → Red null {50, 75}
      row("Grn", 100000004, 1000), row("Grn", 200000004, 3000),
      row("Red", 100000004, 50), row("Red", 200000004, 75),
      // k=2 (design Red): in-band signal 10+30; OOB → Grn null {100, 100}
      row("Red", 100000002, 10), row("Red", 200000002, 30),
      row("Grn", 100000002, 100), row("Grn", 200000002, 100),
      // k=6 (design Red): in-band signal 5+6; OOB → Grn null += {200, 40}
      row("Red", 100000006, 5), row("Red", 200000006, 6),
      row("Grn", 100000006, 200), row("Grn", 200000006, 40),
      // type II k=7: Grn signal 100 ties the two 100s in the Grn null
      row("Grn", 7, 100), row("Red", 7, 60))
      .toDF("sample_id", "channel", "address", "mean", "sd", "nbeads")
    val p = Poobah.detectionP(Poobah.decodeAddress(rows)).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    // Grn null {40, 100, 100, 200} n=4; Red null {50, 75} n=2.
    // cg0000007 Grn side: signal 100 → cnt(≤100)=3 (BOTH ties count) →
    // p=0.25; Red side: 60 → cnt=1 → p=0.5; min = 0.25. If ties were
    // counted strictly-less the Grn side would be 0.75 and min 0.5.
    assert(p("cg0000007") == 0.25)
    assert(p("cg0000004") == 0.0) // 4000 ≥ all of Red null
    assert(p("cg0000002") == 1.0) // 40 < all of Red null
    assert(p("cg0000006") == 1.0) // 11 < all of Red null
  }
}
