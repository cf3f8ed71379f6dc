package graft.sources

import java.nio.file.Files
import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class DdlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("event-table DDL bootstrap is idempotent and queryable (S-SCAN2)") {
    val root = Files.createTempDirectory("ddl").toString
    Ddl.createEventTables(spark, root)
    Ddl.createEventTables(spark, root) // IF NOT EXISTS ⇒ no error
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(graft.streaming.EventSchemas.tables.keySet.subsetOf(tables))

    // insert through SQL, read back through the catalog
    spark.sql("""
      INSERT INTO login_events PARTITION (event_date='2024-09-14')
      SELECT 'e-1','login','u-1','s-1','a-1', TIMESTAMP '2024-09-14 10:00:00',
             'web','android','14','android','14','chrome','128','mobile',
             '1080x2400','UA'""")
    val got = spark.sql(
      "SELECT user_id FROM login_events WHERE event_date = DATE '2024-09-14'")
    assert(got.collect().map(_.getString(0)).toSeq == Seq("u-1"))

    // catalog schema matches the declared storage schema
    val cat = spark.table("angulak_watch_events").schema
    assert(cat == Ddl.tableSchema("angulak_watch_events"))
  }
}
