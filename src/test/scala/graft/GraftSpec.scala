package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared fixture: one SparkSession for the whole JVM test run. */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterEach {

  /** Per-test owner of operator pins (the Verify/Bench contract):
    * storage stays flat across the whole suite run. */
  override protected def afterEach(): Unit = {
    Pins.release()
    super.afterEach()
  }
  lazy val spark: SparkSession = {
    // hive-enabled so HiveSurfaceSpec (ddl02) exercises the real
    // metastore-backed catalog; every other spec is catalog-agnostic
    val dir = java.nio.file.Files.createTempDirectory("graft-hive").toString
    System.setProperty("derby.system.home", dir)
    val s = GraftSession.hiveBuilder(4, dir).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** Smallest driver-generated dataset — correctness, not throughput. */
  val SF = "/root/testdata/sf0.001"

  def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
    out.toString
  }
}
