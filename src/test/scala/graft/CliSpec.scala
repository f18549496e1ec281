package graft

import graft.cli.{Arguments, GraftCli}
import org.scalatest.funsuite.AnyFunSuite

/** CLI front end: layered Arguments parsing + an end-to-end pipeline
  * run driven purely by options. */
class CliSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("arguments: precedence, types, prefixes, self-documentation") {
    // config file < CLI
    val f = java.io.File.createTempFile("graft_args", ".properties")
    java.nio.file.Files.write(f.toPath,
      "maxzoom=3\narchive_name=fromfile\nmeta.attribution=Example\n".getBytes("UTF-8"))
    val a = Arguments.parse(Array(
      s"--config=${f.getPath}", "--maxzoom=9", "--gzip", "--some-flag"))
    assert(a.getInt("maxzoom", "max zoom", 8) == 9, "CLI wins over config file")
    assert(a.getString("archive_name", "name", "graft") == "fromfile")
    assert(a.getBoolean("gzip", "gzip", default = false), "bare --flag is true")
    assert(a.getBoolean("some_flag", "flag", default = false), "dashes normalize")
    assert(a.getInt("partitions", "partitions", 32) == 32, "default when absent")
    assert(a.withPrefix("meta") == Map("attribution" -> "Example"))
    val help = a.describe()
    assert(help.contains("--maxzoom") && help.contains("max zoom"))
    // typed getters
    val b = Arguments.of("ratio" -> "0.25", "names" -> "a, b,c")
    assert(b.getDouble("ratio", "r", 1.0) == 0.25)
    assert(b.getStrings("names", "n", Nil) == Seq("a", "b", "c"))
    // system property outranks the config FILE (documented precedence:
    // CLI > props > env > config file) — maxzoom=3 is in the file
    sys.props("graft.archive_name") = "fromprop"
    try
      assert(a.getString("archive_name", "name", "graft") == "fromprop",
        "props must override config-file values")
    finally sys.props.remove("graft.archive_name")
    // boolean spellings + a clear error naming the option
    val c = Arguments.of("gzip" -> "1", "pip" -> "off", "bad" -> "maybe")
    assert(c.getBoolean("gzip", "g", default = false))
    assert(!c.getBoolean("pip", "p", default = true))
    val err = intercept[IllegalArgumentException](c.getBoolean("bad", "b", default = true))
    assert(err.getMessage.contains("--bad") && err.getMessage.contains("maybe"))
  }

  test("end-to-end: options-driven pipeline writes a readable archive") {
    val out = java.nio.file.Files.createTempDirectory("graft_cli").toString + "/cli.pmtiles"
    val n = GraftCli.run(Arguments.of(
      "sf_dir" -> "/root/testdata/sf0.001",
      "output" -> out,
      "maxzoom" -> "4",
      "partitions" -> "8",
      "meta.attribution" -> "spec"), spark)
    assert(n > 0)
    assert(new java.io.File(out).isFile)
    val back = spark.read.format("pmtiles").load(out)
    assert(back.count() == n)
    val r = new graft.engine.PmtilesArchive.Reader(out)
    assert(r.metadata.contains("\"attribution\":\"spec\""))
    r.close()
  }

  test("PIP auto-routes past the broadcast cap with identical tiles") {
    // same pipeline twice: broadcast path (cap untouched) vs the
    // partitioned grid path (cap forced below the polygon count) —
    // the archives must be byte-identical
    def runOnce(suffix: String): Seq[((Int, Int, Int), Seq[Byte])] = {
      val out = java.nio.file.Files.createTempDirectory("graft_cli_pip").toString +
        s"/$suffix.pmtiles"
      GraftCli.run(Arguments.of(
        "sf_dir" -> "/root/testdata/sf0.001",
        "output" -> out, "maxzoom" -> "4", "partitions" -> "8"), spark)
      spark.read.format("pmtiles").load(out).collect().toSeq
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          r.getAs[Array[Byte]](3).toSeq))
        .sortBy(_._1)
    }
    val a = runOnce("bcast")
    val prev = graft.engine.SpatialJoin.MaxBroadcastPolys
    val b = try {
      graft.engine.SpatialJoin.MaxBroadcastPolys = 1
      runOnce("grid")
    } finally graft.engine.SpatialJoin.MaxBroadcastPolys = prev
    assert(a.nonEmpty && a == b,
      "grid-path PIP must reproduce the broadcast-path archive exactly")
  }

  test("end-to-end: --input=.osm.pbf drives the OSM reader pipeline") {
    val monaco = "/root/reference/planetiler-core/src/test/resources/monaco-latest.osm.pbf"
    assume(new java.io.File(monaco).canRead)
    val out = java.nio.file.Files.createTempDirectory("graft_cli_osm").toString + "/monaco.mbtiles"
    val n = GraftCli.run(Arguments.of(
      "input" -> monaco,
      "output" -> out,
      "maxzoom" -> "7",
      "partitions" -> "8"), spark)
    assert(n > 0)
    val back = spark.read.format("mbtiles").load(out)
    assert(back.count() == n)
    assert(back.where("z = 0").count() == 1)
  }

  test("end-to-end: --input=.shp drives the vector-file ingest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_shp")
    val base = dir.resolve("pts").toString
    val rows = (0 until 50).map { k =>
      (k * 6.0 - 150.0, k * 2.0 - 50.0, Seq(s"place_$k"))
    }
    graft.sources.Shapefile.writePoints(base, rows, Seq(("NAME", 16)),
      spark.sparkContext.hadoopConfiguration)
    val out = dir.resolve("shp.pmtiles").toString
    val n = GraftCli.run(Arguments.of(
      "input" -> (base + ".shp"),
      "output" -> out,
      "maxzoom" -> "5",
      "pip" -> "false",
      "partitions" -> "4"), spark)
    assert(n > 0)
    assert(spark.read.format("pmtiles").load(out).count() == n)
  }
}
