package graft

import java.io.IOException
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsAction

/** Fault-injecting Hadoop filesystem for the reference's I/O error matrix
  * (`crawler_test.go:395-455` via `pkg/mocks/fs_mock.go`): a local FS where
  * path names trigger failures —
  *  - directory `unlistable`  → listStatus throws IOException  (readdir-error)
  *  - directory `panicdir`    → listStatus throws RuntimeException (readdir-panic)
  *  - file starting `noopen`  → access probe throws IOException (open-error)
  *  - file starting `nopanic` → access probe throws RuntimeException (open-panic)
  *
  * Registered under the `faulty:` scheme via
  * `fs.faulty.impl = classOf[FaultyFs].getName` in the Hadoop conf.
  */
class FaultyFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")

  override def listStatus(f: Path): Array[FileStatus] = f.getName match {
    case "unlistable" => throw new IOException("injected readdir error")
    case "panicdir"   => throw new RuntimeException("injected readdir panic")
    case _            => super.listStatus(f)
  }

  override def access(path: Path, mode: FsAction): Unit =
    if (path.getName.startsWith("noopen"))
      throw new IOException("injected open error")
    else if (path.getName.startsWith("nopanic"))
      throw new RuntimeException("injected open panic")
    else {
      // RawLocalFileSystem's default access() loads permissions via NIO,
      // which rejects the non-"file" scheme; probe the local file directly.
      val f = pathToFile(path)
      if (!f.exists()) throw new java.io.FileNotFoundException(path.toString)
      val ok = mode match {
        case FsAction.READ  => f.canRead
        case FsAction.WRITE => f.canWrite
        case _              => f.canRead
      }
      if (!ok) throw new IOException(s"permission denied: $path")
    }
}
