package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — sbt
  * forks a single test JVM, so getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Engine.session("local[4]", shufflePartitions = 4)

  /** `import testImplicits._` for toDF/as[T] on local collections. */
  protected lazy val testImplicits: org.apache.spark.sql.SQLImplicits = spark.implicits

  override def afterAll(): Unit = {
    // Session is shared across suites; don't stop it here.
    super.afterAll()
  }
}
