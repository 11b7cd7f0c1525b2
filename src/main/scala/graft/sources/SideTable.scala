package graft.sources

import java.io.File
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of PERSISTED parquet side-tables ("artifacts")
  * — the mechanism behind the incremental operators (q67's banded
  * signature index, q69's unigram-LM model): derived corpus state is
  * written ONCE per corpus snapshot and subsequent queries read the
  * artifact instead of re-deriving it from 100 TB of text.
  *
  * Build-once semantics are per (session, name, key): a fresh JVM
  * rebuilds (stale-data safe — artifacts derive from the current table
  * state, and the build is the legitimate first-run cost of an
  * incremental pipeline), reruns within a session reuse the file. The
  * session key is reference-identity, the
  * [[graft.sources.ParquetSource]] view-memo convention. Paths are
  * content-determined (md5 of the key) under `graft.artifacts.dir`
  * (default java.io.tmpdir); a real deployment points that conf at the
  * warehouse path next to the corpus snapshot.
  */
object SideTable {

  private val memo =
    new ConcurrentHashMap[(SparkSession, String, String), String]()

  /** Returns the path of artifact `name` for `key`, building and
    * writing it via `build` exactly once per session. */
  def ensure(s: SparkSession, name: String, key: String)
      (build: => DataFrame): String =
    memo.computeIfAbsent((s, name, key), { _ =>
      val root = s.conf.get("graft.artifacts.dir",
        sys.props("java.io.tmpdir"))
      val digest = MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = new File(root, s"graft_${name}_$digest").getAbsolutePath
      build.write.mode("overwrite").parquet(path)
      path
    })

  private[graft] def clear(): Unit = memo.clear()

  private[graft] def size: Int = memo.size()
}
