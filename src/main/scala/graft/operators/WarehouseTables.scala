package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared preamble for session-materialized warehouse tables
  * (BucketedTables, PartitionedEvents): drop any previous catalog
  * entry AND delete its warehouse directory before rewriting — a
  * previous JVM's in-memory catalog forgot the table but its directory
  * survives, and CREATE then fails with LOCATION_ALREADY_EXISTS. One
  * copy of the workaround, not one per layout. */
private[operators] object WarehouseTables {

  def rewrite(s: SparkSession, table: String)(write: => Unit): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    write
  }
}
