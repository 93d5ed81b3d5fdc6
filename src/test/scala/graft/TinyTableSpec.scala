package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TinyTable

/** The config-store swap protocol's crash window and forward schema
  * evolution: a crash between the two renames must not lose the table,
  * and adding a case-class field must not brick stores written before
  * the field existed.
  */
// top-level: Spark encoders cannot instantiate suite-inner case classes
case class TinyRowV1(id: Long, name: String)
case class TinyRowV2(id: Long, name: String, flag: Boolean,
    note: String, n: Long, m: Map[String, String], xs: Seq[Long])

class TinyTableSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-tinytable").resolve("t").toString

  test("crash between swap renames recovers from the _old aside on read and write") {
    val path = tmp()
    TinyTable.write(spark, path, Seq(TinyRowV1(1, "a"), TinyRowV1(2, "b")), "t")(
      Encoders.product[TinyRowV1])
    // simulate the crash: live table moved aside, new one never landed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "_old")))

    // read restores the aside instead of answering an empty table
    assert(TinyTable.read[TinyRowV1](spark, path)(Encoders.product[TinyRowV1])
      .toSet == Set(TinyRowV1(1, "a"), TinyRowV1(2, "b")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_old")))

    // same crash, but the next operation is a write: the recovered rows
    // survive as the rollback base and the write lands normally
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "_old")))
    TinyTable.write(spark, path, Seq(TinyRowV1(3, "c")), "t")(
      Encoders.product[TinyRowV1])
    assert(TinyTable.read[TinyRowV1](spark, path)(Encoders.product[TinyRowV1]) ==
      Seq(TinyRowV1(3, "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_old")))
  }

  test("read fills fields the stored parquet predates with defaults") {
    val path = tmp()
    TinyTable.write(spark, path, Seq(TinyRowV1(1, "a")), "t")(
      Encoders.product[TinyRowV1])
    // the encoder grew flag/note/n/m/xs since the table was written
    val rows = TinyTable.read[TinyRowV2](spark, path,
      defaults = Map("n" -> org.apache.spark.sql.functions.lit(42L)))(
      Encoders.product[TinyRowV2])
    assert(rows == Seq(TinyRowV2(1, "a", flag = false, note = "", n = 42L,
      m = Map.empty, xs = Seq.empty)))
  }
}
