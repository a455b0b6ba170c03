package graft.util

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for the entries/pipelines that need a fresh
  * on-disk state or checkpoint directory per invocation (incremental
  * dedup states, streaming checkpoints, file sinks). ADVICE r11:
  * `Files.createTempDirectory` at those sites leaked a full near-dup
  * state copy into /tmp per Verify/Bench invocation — this helper
  * parents every such dir under ONE root that a shutdown hook deletes
  * recursively, so repeated runs in one JVM still get isolation (fresh
  * subdir each call — the entries' determinism does not depend on dir
  * reuse) and the host is clean after the JVM exits. Deletion is
  * best-effort by design: state dirs double as crash-forensics while
  * the JVM lives, and an OS tmp-reaper covers a SIGKILL'd JVM. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the session scratch root. Drop-in for
    * `Files.createTempDirectory(prefix)` at state/checkpoint sites. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** A STABLE directory under the scratch root: the same `name` maps to
    * the same path for the life of the JVM (created on first use).
    * For per-corpus artifacts that later entries in the same run reuse
    * — e.g. a persisted ANN index that the reload entry opens — where
    * [[dir]]'s fresh-per-call isolation would defeat the reuse. */
  def stableDir(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import java.nio.file.{FileVisitResult, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    try Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes) = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException) = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
    catch { case _: java.io.IOException => () } // best-effort on exit
  }
}
