package graft

/** Local-filesystem helpers shared by the dev mains and the
  * games-parquet cache (NOT the ingest paths — those go through
  * Hadoop `FileSystem` so remote URIs work).
  */
object LocalFs {

  /** Recursive delete. Files.walk's documented contract is
    * try-with-resources: the stream holds directory handles until
    * closed, not until GC.
    */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.toSeq)
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
}
