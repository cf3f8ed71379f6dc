package graft.plans

import java.nio.file.Files

import graft.TestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CH PROJECTION analog: transparent, provably answer-preserving rewrite
  * of aggregates onto a materialized rollup. */
class ProjectionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft_proj_spec").toString
  private lazy val basePath = s"$tmp/base"
  private lazy val projPath = s"$tmp/proj"

  // integral doubles: every sum is exact, so rewritten == direct bitwise
  private def writeBase(): Unit =
    (1 to 1000).map(i => (s"g${i % 7}", s"h${i % 3}", (i % 50).toDouble, i.toLong))
      .toDF("g", "h", "v", "w")
      .write.mode("overwrite").parquet(basePath)

  private def base: DataFrame = spark.read.parquet(basePath)

  private var pd: ProjectionDef = _

  override def beforeAll(): Unit = {
    writeBase()
    pd = Projection.materialize(base, "spec_rollup", Seq("g", "h"),
      Seq(AggSpec("sum", "v"), AggSpec("count", "*"), AggSpec("count", "v"),
        AggSpec("min", "w"), AggSpec("max", "w")), projPath)
    ProjectionRewrite.register(spark, pd)
  }

  override def afterAll(): Unit = ProjectionRewrite.clear()

  // optimizedPlan.toString elides file paths — identify the scanned table
  // by the relations' root paths instead
  private def scans(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten.toSet
  private def usesProjection(df: DataFrame): Boolean =
    scans(df).exists(_.endsWith("/proj")) && !scans(df).exists(_.endsWith("/base"))

  test("covered aggregate rewrites to the projection scan and matches the direct answer") {
    val q = base.groupBy("g", "h")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"),
        min("w").as("mn"), max("w").as("mx"), avg("v").as("av"))
      .orderBy("g", "h")
    assert(usesProjection(q),
      s"expected projection scan, scans=${scans(q)}:\n${q.queryExecution.optimizedPlan}")
    ProjectionRewrite.clear()
    val direct = base.groupBy("g", "h")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"),
        min("w").as("mn"), max("w").as("mx"), avg("v").as("av"))
      .orderBy("g", "h").collect()
    ProjectionRewrite.register(spark, pd)
    assert(q.collect().toSeq == direct.toSeq)
  }

  test("coarser grouping re-aggregates the finer projection") {
    val q = base.groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(usesProjection(q))
    val got = q.orderBy("g").collect()
    ProjectionRewrite.clear()
    val want = base.groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .orderBy("g").collect()
    ProjectionRewrite.register(spark, pd)
    assert(got.toSeq == want.toSeq)
  }

  test("group-key filters ride the rewrite; others defeat it") {
    val keyed = base.filter(col("g") =!= "g0").groupBy("g").agg(sum("v").as("sv"))
    assert(usesProjection(keyed))
    ProjectionRewrite.clear()
    val want = base.filter(col("g") =!= "g0").groupBy("g").agg(sum("v").as("sv"))
      .orderBy("g").collect()
    ProjectionRewrite.register(spark, pd)
    assert(keyed.orderBy("g").collect().toSeq == want.toSeq)

    val nonKey = base.filter(col("v") > 10).groupBy("g").agg(sum("v").as("sv"))
    assert(!usesProjection(nonKey),
      "a filter on a non-key column must defeat the rewrite")
  }

  test("uncoverable shapes are left alone") {
    // distinct aggregate
    assert(!usesProjection(base.groupBy("g").agg(countDistinct("v"))))
    // aggregate with no registered partial
    assert(!usesProjection(base.groupBy("g").agg(avg("w"))))
    // grouping by a non-projection column
    assert(!usesProjection(base.groupBy("v").agg(count(lit(1)))))
    // global aggregate (empty-base semantics differ)
    assert(!usesProjection(base.agg(sum("v"))))
    // computed grouping key
    assert(!usesProjection(base.groupBy(upper(col("g"))).agg(sum("v"))))
  }

  test("composite expressions over covered aggregates rewrite too") {
    val q = base.groupBy("g").agg((sum("v") + count(lit(1))).as("s_plus_n"))
    assert(usesProjection(q))
    ProjectionRewrite.clear()
    val want = base.groupBy("g").agg((sum("v") + count(lit(1))).as("s_plus_n"))
      .orderBy("g").collect()
    ProjectionRewrite.register(spark, pd)
    assert(q.orderBy("g").collect().toSeq == want.toSeq)
  }

  test("downstream operators keep resolving: order/filter above the rewritten aggregate") {
    val q = base.groupBy("g", "h").agg(sum("v").as("sv"))
      .filter(col("sv") > 100).orderBy(desc("sv")).limit(3)
    assert(usesProjection(q))
    ProjectionRewrite.clear()
    val want = base.groupBy("g", "h").agg(sum("v").as("sv"))
      .filter(col("sv") > 100).orderBy(desc("sv")).limit(3).collect()
    ProjectionRewrite.register(spark, pd)
    assert(q.collect().toSeq == want.toSeq)
  }
}
