package graft.engine

/** Once-per-JVM materialized fixture directories, keyed by (kind, source
  * dir): write-time layouts and persisted stage outputs that are the
  * SUBJECT of read-side gate queries. The build runs on first access;
  * every later access (bench repetitions, repeated verify calls) reuses
  * the directory so read-side cost is what gets measured.
  */
object FixtureDirs {
  private val dirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  def apply(kind: String, sourceDir: String)(build: String => Unit): String =
    dirs.getOrElseUpdate((kind, sourceDir), {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-$kind").toString
      build(tmp)
      tmp
    })
}
