package graft.shelf

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Content-addressed object store keyed `cs[:2]/cs[2:4]/cs`, fronted by a
  * local cache.
  *
  * Reference: /root/reference/src/shelf/snapshots.py:224 (key layout),
  * :281-309 (cache probe → remote → cache add). The reference speaks raw
  * S3; here the remote is any Hadoop FileSystem URI (file://, s3a://,
  * hdfs://) so the same code runs against local disk in tests and object
  * storage on a cluster — the Spark-native equivalent of the S3 client.
  */
final class Store(remoteBase: String, cacheDir: Path,
                  conf: Configuration = new Configuration()) {

  private def key(checksum: String): String =
    s"${checksum.substring(0, 2)}/${checksum.substring(2, 4)}/$checksum"

  private def cachePath(checksum: String): Path = cacheDir.resolve(key(checksum))

  private def remotePath(checksum: String): HPath =
    new HPath(s"$remoteBase/${key(checksum)}")

  /** Upload a file under its checksum; also seeds the local cache. */
  def put(file: Path, checksum: String): Unit = {
    val cached = cachePath(checksum)
    if (!Files.exists(cached)) {
      Files.createDirectories(cached.getParent)
      Files.copy(file, cached, StandardCopyOption.REPLACE_EXISTING)
    }
    val rp = remotePath(checksum)
    val fs = rp.getFileSystem(conf)
    if (!fs.exists(rp))
      fs.copyFromLocalFile(false, true, new HPath(file.toUri), rp)
  }

  /** Fetch by checksum into `dest`: cache hit, else remote download that
    * seeds the cache (snapshots.py:281-309).
    */
  def fetch(checksum: String, dest: Path): Unit = {
    val cached = cachePath(checksum)
    if (!Files.exists(cached)) {
      val rp = remotePath(checksum)
      val fs = rp.getFileSystem(conf)
      require(fs.exists(rp), s"object $checksum not in store")
      Files.createDirectories(cached.getParent)
      fs.copyToLocalFile(rp, new HPath(cached.toUri))
    }
    Option(dest.getParent).foreach(Files.createDirectories(_))
    Files.copy(cached, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  def existsLocally(checksum: String): Boolean = Files.exists(cachePath(checksum))
}

object Store {
  /** Store rooted inside the shelf's data dir by default; override the
    * remote with SHELF_STORE_URI (e.g. s3a://bucket/prefix) and the cache
    * with SHELF_CACHE_DIR.
    */
  def forRoot(root: Path): Store = {
    val remote = sys.env.getOrElse("SHELF_STORE_URI",
      root.resolve("data/store").toUri.toString.stripSuffix("/"))
    val cache = sys.env.get("SHELF_CACHE_DIR").map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("user.home"), ".cache", "shelf"))
    new Store(remote, cache)
  }
}
