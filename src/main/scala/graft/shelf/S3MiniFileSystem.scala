package graft.shelf

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal S3-REST Hadoop FileSystem (`s3mini://bucket/key...`) for
  * S3-compatible endpoints that do not enforce request signing — a
  * local MinIO/moto dev server, or a bucket with an anonymous policy.
  *
  * Speaks the public S3 REST API directly (PUT / GET / HEAD / DELETE /
  * ListObjectsV2, path-style addressing) over `java.net` HTTP with a
  * static SigV4-SHAPED `Authorization` header carrying the configured
  * access key: servers that attribute but do not verify signatures
  * (moto, MinIO with anonymous rules) accept it, so the
  * content-addressed [[Store]]'s object-store dispatch — the reference
  * CI behavior (/root/reference/tests/test_shelf.py:25-30 runs against
  * MinIO) — can be EXECUTED end-to-end in environments without the
  * hadoop-aws + AWS SDK jars (absent from /opt/spark/jars here, and
  * unfetchable without egress).
  *
  * Explicitly NOT for production: no request signing, no multipart
  * (objects are buffered in memory — fine for the store's blob sizes in
  * tests, wrong for 100 TB), no retry policy. A production cluster uses
  * hadoop-aws s3a; this class exists so "talks to a real object store
  * over the wire" is a tested behavior rather than an env-skip.
  *
  * Conf keys: `fs.s3mini.endpoint` (e.g. `http://localhost:5001`),
  * `fs.s3mini.access.key` (attribution only), and
  * `fs.s3mini.impl = graft.shelf.S3MiniFileSystem` to register.
  */
final class S3MiniFileSystem extends FileSystem {
  private var uri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var accessKey: String = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    bucket = name.getAuthority
    endpoint = conf.get("fs.s3mini.endpoint", "http://localhost:5001")
      .stripSuffix("/")
    accessKey = conf.get("fs.s3mini.access.key", "graft")
    workDir = new Path(s"$uri/")
  }

  override def getScheme: String = "s3mini"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  /** Create the bucket (PUT on the bucket URL) — test bootstrap. */
  def createBucket(): Unit = {
    val (code, _, _) = request("PUT", s"$endpoint/$bucket", null)
    if (code != 200 && code != 409) // 409 = already owned
      throw new IOException(s"create bucket $bucket failed: HTTP $code")
  }

  // ---- S3 REST plumbing -------------------------------------------------

  /** The server attributes the request to this access key; the
    * signature itself is never verified by the target endpoints.
    */
  private def authHeader: String =
    s"AWS4-HMAC-SHA256 Credential=$accessKey/19700101/us-east-1/s3/" +
      "aws4_request, SignedHeaders=host, Signature=unsigned"

  private def request(method: String, url: String,
                      body: Array[Byte]): (Int, Array[Byte], HttpURLConnection) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setRequestProperty("Authorization", authHeader)
    conn.setRequestProperty("x-amz-content-sha256", "UNSIGNED-PAYLOAD")
    if (body != null) {
      // octet-stream, NOT the url-encoded default: WSGI-backed servers
      // (moto) parse form content types and the body never reaches the
      // object layer
      conn.setRequestProperty("Content-Type", "application/octet-stream")
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      out.write(body); out.close()
    }
    val code = conn.getResponseCode
    val payload =
      if (method == "HEAD") Array.empty[Byte]
      else {
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        if (in == null) Array.empty[Byte]
        else try in.readAllBytes() finally in.close()
      }
    (code, payload, conn)
  }

  private def keyOf(f: Path): String =
    f.toUri.getPath.stripPrefix("/")

  private def enc(s: String): String =
    s.split("/", -1).map(URLEncoder.encode(_, "UTF-8").replace("+", "%20"))
      .mkString("/")

  private def objectUrl(key: String): String = s"$endpoint/$bucket/${enc(key)}"

  /** ListObjectsV2 under a prefix; returns (keys with sizes, common
    * prefixes). Pages on NextContinuationToken until IsTruncated is
    * false — without the loop any listing past the server's page limit
    * (1000 keys) would be SILENTLY truncated: listStatus reporting a
    * partial directory, recursive delete removing only the first page
    * yet returning true.
    */
  private def list(prefix: String,
                   delimited: Boolean): (Seq[(String, Long)], Seq[String]) = {
    val keys = Seq.newBuilder[(String, Long)]
    val prefixes = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = s"$endpoint/$bucket?list-type=2&prefix=" +
        URLEncoder.encode(prefix, "UTF-8") +
        (if (delimited) "&delimiter=%2F" else "") +
        token.map(t => "&continuation-token=" +
          URLEncoder.encode(t, "UTF-8")).getOrElse("")
      val (code, body, _) = request("GET", q, null)
      if (code != 200) throw new IOException(s"list $prefix: HTTP $code")
      val xml = new String(body, "UTF-8")
      // Key and Size are paired PER <Contents> BLOCK, never positionally
      // across the page: a zipAll over whole-page element lists silently
      // shifts every pairing after one malformed entry (a Contents
      // missing its Size, or a size-bearing tag outside Contents) and
      // pads with length 0 — corrupting FileStatus lengths downstream.
      // A block whose Key or Size is absent fails loudly instead.
      """(?s)<Contents>(.*?)</Contents>""".r.findAllMatchIn(xml)
        .map(_.group(1)).foreach { c =>
          val key = """<Key>([^<]*)</Key>""".r.findFirstMatchIn(c)
            .map(_.group(1)).getOrElse(throw new IOException(
              s"list $prefix: <Contents> entry without a <Key>"))
          val size = """<Size>(\d+)</Size>""".r.findFirstMatchIn(c)
            .map(_.group(1).toLong).getOrElse(throw new IOException(
              s"list $prefix: <Contents> entry '$key' without a <Size>"))
          if (key.nonEmpty) keys += ((key, size))
        }
      // common prefixes live in their own blocks; scoping the scan to
      // them keeps the query-echo <Prefix> out without the filterNot
      prefixes ++= """(?s)<CommonPrefixes>.*?<Prefix>([^<]*)</Prefix>""".r
        .findAllMatchIn(xml).map(_.group(1)).toSeq
      val truncated = xml.contains("<IsTruncated>true</IsTruncated>")
      token = """<NextContinuationToken>([^<]*)</NextContinuationToken>""".r
        .findFirstMatchIn(xml).map(_.group(1))
      more = truncated && token.isDefined
      if (truncated && token.isEmpty)
        throw new IOException(
          s"list $prefix: truncated response without a continuation token")
    }
    (keys.result(), prefixes.result().distinct)
  }

  // ---- FileSystem surface ----------------------------------------------

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) // bucket root is a directory
      return new FileStatus(0, true, 1, 0, 0, f)
    val (code, _, conn) = request("HEAD", objectUrl(key), null)
    if (code == 200) {
      val len = Option(conn.getHeaderField("Content-Length"))
        .map(_.toLong).getOrElse(0L)
      new FileStatus(len, false, 1, 64 * 1024 * 1024, conn.getLastModified, f)
    } else {
      // an S3 "directory" is any non-empty key prefix
      val (keys, prefixes) = list(s"$key/", delimited = true)
      if (keys.nonEmpty || prefixes.nonEmpty)
        new FileStatus(0, true, 1, 0, 0, f)
      else throw new FileNotFoundException(s"$f (HTTP $code)")
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (code, body, _) = request("GET", objectUrl(keyOf(f)), null)
    if (code == 404) throw new FileNotFoundException(f.toString)
    if (code != 200) throw new IOException(s"open $f: HTTP $code")
    new FSDataInputStream(new S3MiniFileSystem.BytesStream(body))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    val key = keyOf(f)
    val self = this
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = {
        super.close()
        val (code, _, _) = self.request("PUT", self.objectUrl(key), toByteArray)
        if (code != 200) throw new IOException(s"put $f: HTTP $code")
      }
    }
    new FSDataOutputStream(buf, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3mini does not append")

  override def rename(src: Path, dst: Path): Boolean = {
    // GET + PUT + DELETE: no atomicity claim — same caveat the band-index
    // publish scaladoc documents for object stores generally
    val (code, body, _) = request("GET", objectUrl(keyOf(src)), null)
    if (code != 200) return false
    val (pc, _, _) = request("PUT", objectUrl(keyOf(dst)), body)
    if (pc != 200) return false
    delete(src, recursive = false)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    // S3 answers 204 to DELETE of a MISSING key, but the Hadoop
    // FileSystem contract requires returning false when the path does
    // not exist — so existence is checked first (HEAD for the object,
    // list for a prefix). A concurrent delete between the HEAD and the
    // DELETE still reads as true; without conditional requests that
    // race is inherent to the protocol.
    val key = keyOf(f)
    val (hc, _, _) = request("HEAD", objectUrl(key), null)
    if (hc == 200) {
      val (code, _, _) = request("DELETE", objectUrl(key), null)
      if (code != 204 && code != 200)
        throw new IOException(s"delete $f: HTTP $code")
      true
    } else {
      val (keys, _) = list(s"$key/", delimited = false)
      if (keys.isEmpty) false
      else if (!recursive)
        throw new IOException(s"$f is a non-empty prefix; recursive=false")
      else {
        // per-key status IS checked: a swallowed failure here would
        // report the prefix gone while keys survive — callers that
        // wipe-then-rebuild (marker-gated scratch, TxTable renumber)
        // would then mix stale files into the rebuilt layout
        val failed = keys.flatMap { case (k, _) =>
          val (code, _, _) = request("DELETE", objectUrl(k), null)
          if (code == 204 || code == 200) None else Some(s"$k: HTTP $code")
        }
        if (failed.nonEmpty)
          throw new IOException(
            s"recursive delete $f left ${failed.size} keys: " +
              failed.take(3).mkString("; "))
        true
      }
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    val prefix = if (key.isEmpty) "" else s"$key/"
    val (keys, prefixes) = list(prefix, delimited = true)
    val files = keys.map { case (k, size) =>
      new FileStatus(size, false, 1, 64 * 1024 * 1024, 0,
        new Path(s"$uri/$k"))
    }
    val dirs = prefixes.map(p =>
      new FileStatus(0, true, 1, 0, 0, new Path(s"$uri/${p.stripSuffix("/")}")))
    (files ++ dirs).toArray
  }
}

object S3MiniFileSystem {
  /** In-memory Seekable/PositionedReadable wrapper FSDataInputStream
    * requires; objects were fully fetched by `open` (no multipart).
    */
  private final class BytesStream(bytes: Array[Byte])
    extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {
    override def seek(p: Long): Unit = { pos = p.toInt }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      if (position >= bytes.length) -1
      else {
        val n = math.min(length, bytes.length - position.toInt)
        System.arraycopy(bytes, position.toInt, buffer, offset, n)
        n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new java.io.EOFException(
          s"readFully past end: pos=$position len=$length")
        done += n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
