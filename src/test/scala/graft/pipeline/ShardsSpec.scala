package graft.pipeline

import java.nio.file.Files

import graft.{Tables, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("write round-trip: stored manifest == manifest recomputed from the written shards") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf)
    Shards.write(docs, dir, hexChars = 1)

    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == docs.count(), "no docs lost or duplicated")
    // the written partition value matches the deterministic shard key
    assert(data.filter(col("shard_id") =!=
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
      .count() == 0)

    val stored = spark.read.parquet(s"$dir/manifest")
      .orderBy("shard_id").collect().map(_.toString)
    val recomputed = Shards
      .manifest(data.select("doc_id", "text", "lang", "source", "n_chars"), 1)
      .orderBy("shard_id").collect().map(_.toString)
    assert(stored.sameElements(recomputed),
      "manifest must describe exactly what was written")
  }

  test("each shard is one doc_id-sorted file; assignment is engine-reproducible") {
    val dir = Files.createTempDirectory("graft_shards2").toString
    Shards.write(Tables.documents(spark, sf), dir, hexChars = 1)
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.length == 16, "one directory per hex shard")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${sd.getName}: hash-partitioned write → exactly one file per shard")
      val ids = spark.read.parquet(sd.toString)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${sd.getName} not doc_id-sorted")
    }
  }
}
