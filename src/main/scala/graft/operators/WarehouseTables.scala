package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared preamble for session-materialized warehouse tables
  * (BucketedTables, PartitionedEvents): drop any previous catalog
  * entry AND delete its warehouse directory before rewriting — a
  * previous JVM's in-memory catalog forgot the table but its directory
  * survives, and CREATE then fails with LOCATION_ALREADY_EXISTS. One
  * copy of the workaround, not one per layout. */
private[operators] object WarehouseTables {

  /** Collision-resistant table-name component for a fixture dir: first
    * 16 hex chars of md5(path). `String.hashCode` (32 bits, trivially
    * collidable) would let two fixture dirs silently overwrite each
    * other's warehouse tables while each SessionCache keeps serving the
    * now-wrong name — a wrong-data failure, not an error. 64 bits of
    * md5 makes an accidental collision ~2^-32 at even millions of
    * fixture paths. */
  def dirDigest(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(path.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  def rewrite(s: SparkSession, table: String)(write: => Unit): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    write
  }
}
