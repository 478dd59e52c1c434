package graft.core

import java.nio.file.{Files, Path}

/** Shared filesystem helpers — ONE recursive delete for the whole
  * engine (staging dirs, spool drains, DROP TABLE/NAMESPACE, compaction
  * swaps) instead of per-file hand-rolled walks that drift apart. */
object Fs {
  /** Delete `p` and everything under it. Missing paths are a no-op;
    * files deleted concurrently are tolerated (deleteIfExists). */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val st = Files.walk(p)
    val all =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toVector
      } finally st.close()
    all.reverse.foreach(Files.deleteIfExists(_))
  }
}
