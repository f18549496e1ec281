package graft

import graft.functions.SpatialRules
import graft.geo.Geo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bbox pushdown rule: range conjuncts reach the parquet scan") {
    SpatialRules.install(spark)
    // triangle polygon: bbox [0,10]x[0,10], exact test cuts the corner
    val tri = Geo.fromWkt("POLYGON ((0 0, 10 0, 0 10, 0 0))")
    val wkb = Geo.toWkb(tri)

    val dir = java.nio.file.Files.createTempDirectory("graft_rule").toString
    (-50 to 50).flatMap(x => (-50 to 50).map(y => (x.toDouble, y.toDouble)))
      .toDF("lon", "lat").write.mode("overwrite").parquet(s"$dir/pts")

    val pts = spark.read.parquet(s"$dir/pts")
    val q = pts.where(SpatialRules.st_contains_lonlat(lit(wkb), col("lon"), col("lat")))

    // exact result: points inside the closed triangle x,y>=0, x+y<=10
    val got = q.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val want = (for (x <- 0 to 10; y <- 0 to 10 if x + y <= 10) yield (x.toDouble, y.toDouble)).toSet
    assert(got == want)

    // the rewritten ranges must appear as PushedFilters on the scan
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(lon,0.0)"), physical)

    // and the optimized plan keeps the exact post-filter (idempotent:
    // a second optimization pass must not re-add conjuncts)
    val optimized = q.queryExecution.optimizedPlan
    val expansions = optimized.expressions.map(_.collect {
      case s: SpatialRules.StContainsLonLat => s
    }.size).sum
    assert(expansions == 1, optimized.toString)
  }
}
