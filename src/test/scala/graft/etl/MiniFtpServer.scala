package graft.etl

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** In-process RFC 959 server double for [[FtpTransport]] — loopback only,
  * passive mode only, serving one directory. Pure JDK, test-scoped; the
  * protocol subset is exactly what the transport speaks (USER/PASS/TYPE/
  * CWD/PASV/NLST/SIZE/REST/RETR/QUIT).
  *
  * Failure injection: `failRetr(name, times, afterBytes)` makes the next
  * `times` RETRs of `name` stream `afterBytes` bytes, then abort the data
  * connection and reply 426 — the mid-transfer death that must leave a
  * resumable prefix. Every RETR's (name, rest offset) is recorded in
  * `retrLog`, so specs can assert the client actually resumed from the
  * surviving prefix instead of refetching.
  */
final class MiniFtpServer(root: Path) extends AutoCloseable {
  private val listener = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  val port: Int = listener.getLocalPort
  val retrLog = new ConcurrentLinkedQueue[(String, Long)]()
  @volatile private var failures = Map.empty[String, (Int, Long)]

  def failRetr(name: String, times: Int, afterBytes: Long): Unit = synchronized {
    failures += name -> (times, afterBytes)
  }

  /** Real-world pathology 1: NLST returns only the first `after` names
    * but still replies 226 as if the listing were complete — the
    * truncated listing that turns a mirror's `--delete` into data loss.
    */
  @volatile private var nlstTruncateAfter: Option[Int] = None
  def truncateNlst(after: Int): Unit = { nlstTruncateAfter = Some(after) }

  /** Real-world pathology 2: SIZE reports `claimed` for `name` while
    * RETR streams the true bytes — the size lie the post-sync verify
    * exists to catch.
    */
  @volatile private var sizeLies = Map.empty[String, Long]
  def lieSize(name: String, claimed: Long): Unit = { sizeLies += name -> claimed }

  private val acceptor = new Thread(() => {
    try {
      while (!listener.isClosed) {
        val conn = listener.accept()
        val t = new Thread(() => handle(conn), "mini-ftp-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: SocketException => () } // closed
  }, "mini-ftp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(conn: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(conn.getInputStream, StandardCharsets.ISO_8859_1))
    val out = conn.getOutputStream
    def send(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.ISO_8859_1))
      out.flush()
    }
    var dataListener: ServerSocket = null
    var restOffset = 0L
    def openData(): Socket = {
      val s = dataListener.accept()
      dataListener.close()
      dataListener = null
      s
    }
    send("220 mini-ftp ready")
    try {
      var line = in.readLine()
      while (line != null) {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c.toUpperCase, a)
          case Array(c) => (c.toUpperCase, "")
        }
        cmd match {
          case "USER" => send("331 password required")
          case "PASS" => send("230 logged in")
          case "TYPE" => send("200 type set")
          case "CWD"  => send("250 ok")
          case "PASV" =>
            if (dataListener != null) dataListener.close()
            dataListener = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            val p = dataListener.getLocalPort
            send(s"227 entering passive mode (127,0,0,1,${p / 256},${p % 256})")
          case "NLST" =>
            send("150 here comes the listing")
            val data = openData()
            try {
              val all = Files.list(root).iterator().asScala
                .filter(Files.isRegularFile(_)).map(_.getFileName.toString).toSeq.sorted
              val names = nlstTruncateAfter.fold(all)(all.take)
              data.getOutputStream.write(
                names.map(_ + "\r\n").mkString.getBytes(StandardCharsets.ISO_8859_1))
            } finally data.close()
            send("226 listing done")
          case "SIZE" =>
            val f = root.resolve(arg)
            if (Files.isRegularFile(f))
              send(s"213 ${sizeLies.getOrElse(arg, Files.size(f))}")
            else send("550 no such file")
          case "REST" =>
            restOffset = arg.toLong
            send("350 resuming")
          case "RETR" =>
            val f = root.resolve(arg)
            if (!Files.isRegularFile(f)) { send("550 no such file"); restOffset = 0L }
            else {
              retrLog.add((arg, restOffset))
              val bytes = Files.readAllBytes(f).drop(restOffset.toInt)
              restOffset = 0L
              val cut = synchronized {
                failures.get(arg) match {
                  case Some((times, after)) if times > 0 =>
                    failures += arg -> (times - 1, after)
                    Some(math.min(after, bytes.length.toLong).toInt)
                  case _ => None
                }
              }
              send("150 opening data connection")
              val data = openData()
              try data.getOutputStream.write(bytes.take(cut.getOrElse(bytes.length)))
              finally data.close()
              if (cut.isDefined) send("426 transfer aborted")
              else send("226 transfer complete")
            }
          case "QUIT" => send("221 bye"); conn.close(); return
          case _ => send(s"502 $cmd not implemented")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally {
      if (dataListener != null) dataListener.close()
      if (!conn.isClosed) conn.close()
    }
  }

  override def close(): Unit = listener.close()
}
