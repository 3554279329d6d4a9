package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500 / WARC/1.0) web-archive container — the format web-scale
  * training corpora actually arrive in (Common Crawl ships response records
  * as per-record gzip members concatenated into `.warc.gz` files). The
  * reference ingests its raw deliveries from containers it unpacks first
  * (health_check.py:40-63); at corpus scale the same ingest boundary is a
  * WARC scan, so the engine treats it like xlsx/IDAT/zip: a dependency-free
  * codec behind the binaryFile source.
  *
  * Scale posture (the zip/idat shape): files are the unit of parallelism —
  * a gzip-member stream is not block-splittable, so one file parses in one
  * task and throughput comes from file count, which Common Crawl fixes at
  * ~1 GiB/file precisely for this reason. Per-task memory is one record's
  * block (bounded by the writer's truncation policy, not corpus size).
  * java.util.zip only — zero extra dependencies.
  *
  * Record layout written and parsed (response records wrap an HTTP/1.1
  * message, the Common Crawl convention):
  * {{{
  *   WARC/1.0\r\n  <warc-headers>\r\n \r\n  <block>\r\n\r\n
  *   block = HTTP/1.1 200 OK\r\n <http-headers>\r\n \r\n <body>
  * }}}
  */
object Warc {

  private val Crlf = "\r\n"

  /** Serialize ONE record (driver-side fixture building / the per-record
    * unit the distributed sink gzips). `httpContentType = None` writes a
    * non-HTTP block verbatim (resource/warcinfo-style records).
    */
  private[graft] def recordBytes(warcType: String, recordId: String,
      targetUri: Option[String], warcDate: String,
      httpContentType: Option[String], body: Array[Byte]): Array[Byte] = {
    val block = httpContentType match {
      case Some(ct) =>
        val h = s"HTTP/1.1 200 OK${Crlf}Content-Type: $ct$Crlf" +
          s"Content-Length: ${body.length}$Crlf$Crlf"
        h.getBytes(UTF_8) ++ body
      case None => body
    }
    val ctHeader = httpContentType match {
      case Some(_) => "application/http; msgtype=response"
      case None => "application/octet-stream"
    }
    val h = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append(s"WARC-Type: $warcType").append(Crlf)
      .append(s"WARC-Record-ID: <$recordId>").append(Crlf)
      .append(s"WARC-Date: $warcDate").append(Crlf)
    targetUri.foreach(u => h.append(s"WARC-Target-URI: $u").append(Crlf))
    h.append(s"Content-Type: $ctHeader").append(Crlf)
      .append(s"Content-Length: ${block.length}").append(Crlf).append(Crlf)
    h.toString.getBytes(UTF_8) ++ block ++ s"$Crlf$Crlf".getBytes(UTF_8)
  }

  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Distributed sink: one `.warc.gz` per input partition, every record its
    * own gzip member (the Common Crawl layout — members are independently
    * decompressible, so a future range reader can seek). Input columns:
    * `target_uri, warc_date, record_id, http_content_type, body` (binary).
    * Written executor-side through the Hadoop FS API with the SESSION's
    * conf shipped to the tasks (a bare `new Configuration()` would drop
    * spark.hadoop.* settings); `_SUCCESS` marks completion — callers guard
    * on the marker, not directory existence.
    */
  def writeFiles(df: DataFrame, dir: String): Unit = {
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val fs0 = new org.apache.hadoop.fs.Path(dir).getFileSystem(hadoopConf)
    fs0.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs0.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val confProps: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      hadoopConf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    df.select("target_uri", "warc_date", "record_id", "http_content_type",
        "body")
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confProps.foreach { case (k, v) => conf.set(k, v) }
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
          val out = p.getFileSystem(conf).create(p, true)
          it.foreach { r =>
            out.write(gzipMember(recordBytes("response", r.getString(2),
              Some(r.getString(0)), r.getString(1), Some(r.getString(3)),
              r.getAs[Array[Byte]](4))))
          }
          out.close()
        }
      }
    fs0.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
  }

  /** Parse one (possibly multi-record, possibly gzip-member-concatenated)
    * WARC file. Exposed for the spec; the distributed scan calls it per
    * task. Fails fast on malformed framing (bad version line, missing
    * blank-line separators, short block) — a silently skipped record is a
    * corpus-count bug downstream.
    */
  private[graft] def parseFile(name: String, raw: Array[Byte])
      : Seq[(String, String, String, Option[String], String, Long,
             Option[Int], Option[String], Array[Byte])] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
        // concatenated gzip members: java's GZIPInputStream reads across
        // member boundaries (it probes for the next header at each trailer)
        val in = new GZIPInputStream(new ByteArrayInputStream(raw))
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } else raw
    val out = mutable.ArrayBuffer.empty[(String, String, String,
      Option[String], String, Long, Option[Int], Option[String], Array[Byte])]
    var pos = 0
    def indexOfBlank(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n')) i += 1
      if (i + 3 < bytes.length) i else -1
    }
    while (pos < bytes.length) {
      // tolerate inter-record padding CRLFs, never content corruption
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val hEnd = indexOfBlank(pos)
        require(hEnd >= 0, s"$name: unterminated WARC header at offset $pos")
        val header = new String(bytes, pos, hEnd - pos, UTF_8)
        val lines = header.split("\r\n")
        require(lines.head.startsWith("WARC/"),
          s"$name: bad version line '${lines.head.take(40)}' at offset $pos")
        val hs = lines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
        }.toMap
        val len = hs.getOrElse("content-length",
          sys.error(s"$name: record without Content-Length at offset $pos")).toLong
        val blockStart = hEnd + 4
        require(blockStart + len <= bytes.length,
          s"$name: truncated block at offset $blockStart (need $len bytes)")
        val block = java.util.Arrays.copyOfRange(bytes, blockStart,
          blockStart + len.toInt)
        val (status, httpCt, body) =
          if (hs.get("content-type").exists(_.startsWith("application/http"))) {
            val bEnd = {
              var i = 0
              while (i + 3 < block.length &&
                !(block(i) == '\r' && block(i + 1) == '\n' &&
                  block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
              if (i + 3 < block.length) i else -1
            }
            require(bEnd >= 0, s"$name: http block without header terminator")
            val httpLines = new String(block, 0, bEnd, UTF_8).split("\r\n")
            val st = httpLines.head.split(" ")(1).toInt
            val ct = httpLines.tail.collectFirst {
              case l if l.toLowerCase.startsWith("content-type:") =>
                l.substring(l.indexOf(':') + 1).trim
            }
            (Some(st), ct,
              java.util.Arrays.copyOfRange(block, bEnd + 4, block.length))
          } else (None, None, block)
        out += ((name,
          hs.getOrElse("warc-record-id", "").stripPrefix("<").stripSuffix(">"),
          hs.getOrElse("warc-type", ""), hs.get("warc-target-uri"),
          hs.getOrElse("warc-date", ""), len, status, httpCt, body))
        pos = blockStart + len.toInt
      }
    }
    out.toSeq
  }

  /** Distributed scan: every `*.warc` / `*.warc.gz` under `dir` parses in
    * its own task. Columns: `file, record_id, warc_type, target_uri,
    * warc_date, content_length, http_status, http_content_type, body` —
    * HTTP response records arrive with the status line and headers split
    * off (`body` is the payload a text pipeline consumes); non-HTTP blocks
    * pass through verbatim with null status.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        parseFile(path.substring(path.lastIndexOf('/') + 1), content)
      }
      .toDF("file", "record_id", "warc_type", "target_uri", "warc_date",
        "content_length", "http_status", "http_content_type", "body")
  }
}
