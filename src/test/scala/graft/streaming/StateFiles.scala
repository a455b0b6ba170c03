package graft.streaming

/** Recursive parquet-file count for state dirs: the bucketed layout
  * ([[StateLayout]]) nests files under `sb=<n>/` partition dirs, so the
  * old flat `listFiles` counts would read 0 regardless of compaction. */
object StateFiles {
  def parquetCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(dir))
  }
}
