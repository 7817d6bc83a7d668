package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs (SURVEY §5.2). sf0.001 keeps every
  * suite fast; the DuckDB oracle at sf0.01 is the driver's job, these tests
  * pin SEMANTICS (hand-checkable micro-results, invariants, streaming
  * mirrors) that an oracle diff can't localize.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf: String = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session — never stop it per-suite
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // VERDICT r10 #6: the specs instantiate the same bounded post-agg
    // windows Verify/Bench do — without this the test log floods with
    // hundreds of WindowExec single-partition warns, burying real signal.
    Log.quietBoundedWindowWarn()
    s
  }
}
