package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** The reference's 13-row golden fixture (`/root/reference/tests.nim:4-25`). */
object Fixture {
  case class Particle(lati: Long, longi: Long, pressure: Double, temperature: Double)
  case class WrongParticle(lati: Long, longi: Long, pressure: Double) // layout-mismatch probe
  val particles: Seq[Particle] = (1 to 13).map(i => Particle(i.toLong, 1L, 100.0, 20.0))
}
