package graft.etl

import java.io.{BufferedReader, InputStreamReader, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** FTP implementation of [[Transfer.Transport]] — the wire protocol half of
  * the reference's download path (Base.pm:40-57 `connect_ftp`: login +
  * binary mode; DownloadDatabase.pm:94-110 `_ftp_download`: cwd + ls +
  * get-each). Plain RFC 959 over JDK sockets, passive mode only (the mode
  * every mirror script uses through firewalls), with RFC 3659 `SIZE` for
  * exact listings and `REST` for byte-offset resume — which is exactly the
  * contract [[Transfer.sync]]'s retry loop needs: a transfer that dies
  * mid-stream leaves its prefix on disk and the next attempt RESTs from
  * the surviving length.
  *
  * The control channel is line-oriented ISO-8859-1 with multi-line reply
  * folding; the data channel is one passive connection per operation. A
  * non-2xx/3xx reply or a data stream that ends without its `226` close
  * reply throws `IOException` — [[Transfer.sync]] owns retries, the
  * transport never retries silently.
  */
final class FtpTransport(host: String, port: Int,
    user: String = "anonymous", pass: String = "anonymous@",
    dir: Option[String] = None) extends Transfer.Transport with AutoCloseable {

  private val control = new Socket()
  control.connect(new InetSocketAddress(host, port), 10000)
  control.setSoTimeout(30000)
  private val in = new BufferedReader(
    new InputStreamReader(control.getInputStream, StandardCharsets.ISO_8859_1))
  private val out = control.getOutputStream

  expect(2, reply()) // 220 greeting
  expect(3, command(s"USER $user")) // 331
  expect(2, command(s"PASS $pass")) // 230
  expect(2, command("TYPE I")) // binary, so SIZE is exact byte length
  dir.foreach(d => expect(2, command(s"CWD $d")))

  /** One full reply, multi-line blocks folded ("123-..." until "123 "). */
  private def reply(): String = {
    val first = readLine()
    if (first.length >= 4 && first.charAt(3) == '-') {
      val code = first.substring(0, 3)
      var line = readLine()
      while (!(line.startsWith(code) && line.length >= 4 && line.charAt(3) == ' '))
        line = readLine()
      line
    } else first
  }

  private def readLine(): String = {
    val l = in.readLine()
    if (l == null) throw new IOException("FTP control connection closed")
    l
  }

  private def command(cmd: String): String = {
    out.write((cmd + "\r\n").getBytes(StandardCharsets.ISO_8859_1))
    out.flush()
    reply()
  }

  private def expect(codeClass: Int, rep: String): String = {
    if (rep.isEmpty || rep.charAt(0) - '0' != codeClass)
      throw new IOException(s"FTP: expected ${codeClass}xx, got: $rep")
    rep
  }

  private val PasvRe = ".*?(\\d+),(\\d+),(\\d+),(\\d+),(\\d+),(\\d+).*".r

  /** Open the passive data connection the server advertises. */
  private def pasv(): Socket = command("PASV") match {
    case r @ PasvRe(h1, h2, h3, h4, p1, p2) =>
      expect(2, r)
      val s = new Socket()
      // connect to the advertised host:port (loopback in tests, the
      // mirror host in production)
      s.connect(new InetSocketAddress(s"$h1.$h2.$h3.$h4", p1.toInt * 256 + p2.toInt), 10000)
      s.setSoTimeout(30000)
      s
    case r => throw new IOException(s"FTP: unparseable PASV reply: $r")
  }

  /** NLST for names + SIZE per name: exact sizes, no LIST-format parsing
    * (LIST layouts are server-specific; SIZE under TYPE I is bytes).
    */
  override def ls(): Seq[(String, Long)] = {
    val data = pasv()
    expect(1, command("NLST")) // 150
    val names = try {
      val r = new BufferedReader(
        new InputStreamReader(data.getInputStream, StandardCharsets.ISO_8859_1))
      Iterator.continually(r.readLine()).takeWhile(_ != null).map(_.trim)
        .filter(_.nonEmpty).toList
    } finally data.close()
    expect(2, reply()) // 226
    names.sorted.map { n =>
      val rep = expect(2, command(s"SIZE $n")) // "213 <bytes>"
      (n, rep.split("\\s+")(1).toLong)
    }
  }

  /** RETR with REST resume, appending to `dest`. Bytes that arrive before
    * a mid-stream failure stay on disk — the caller's retry resumes after
    * them. Throws unless the server confirms completion with 226.
    */
  override def fetch(name: String, offset: Long, dest: Path): Long = {
    val data = pasv()
    var moved = 0L
    try {
      if (offset > 0) expect(3, command(s"REST $offset")) // 350
      expect(1, command(s"RETR $name")) // 150
      val src = data.getInputStream
      val sink = Files.newOutputStream(dest,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = src.read(buf)
        while (n >= 0) {
          sink.write(buf, 0, n)
          moved += n
          n = src.read(buf)
        }
      } finally sink.close()
    } finally data.close()
    expect(2, reply()) // 226 — a 426 abort or early close throws here
    moved
  }

  override def close(): Unit = {
    try { command("QUIT"); () } catch { case _: IOException => () }
    control.close()
  }
}
