package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazily built). */
trait SparkSpecBase { self: AnyFunSuite =>
  lazy val spark: SparkSession =
    Sessions.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"
}
