package graft

/** Scratch staging directories for operators and round-trip queries that
  * materialize a build-once artifact (jaccardPairs' pair set, the s1/s8
  * sink hops). Every dir registers for deletion at JVM exit so repeated
  * Verify/Bench runs leave nothing behind in the system temp dir.
  */
object Scratch {
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }
}
