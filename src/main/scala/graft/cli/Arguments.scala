package graft.cli

import scala.collection.mutable

/**
 * Layered runtime configuration — the reference's `Planetiler
 * .create(Arguments)` front-end surface (`config/Arguments.java`,
 * `Planetiler.java:155`), re-designed from scratch: precedence is
 * CLI `--key=value` > JVM system property `graft.<key>` > environment
 * `GRAFT_<KEY>` > `--config=<file>` java-properties file > default.
 *
 * Every typed getter records (key, description, default) as it is
 * consumed, so `describe()` prints the full self-documenting option
 * surface of whatever pipeline actually ran — options don't need a
 * central registry.
 */
final class Arguments private (cli: Map[String, String], fromFile: Map[String, String]) {

  private val seen = mutable.LinkedHashMap.empty[String, (String, String)]

  private def canonical(key: String): String =
    key.toLowerCase.replace('-', '_')

  /** Raw lookup through the precedence chain (no doc recording). The
    * config FILE is the weakest layer — below props and env — so a
    * file-supplied key can still be overridden per-run without editing
    * the file (the documented contract above). */
  def optional(key: String): Option[String] = {
    val k = canonical(key)
    cli.get(k)
      .orElse(sys.props.get(s"graft.$k"))
      .orElse(sys.env.get(s"GRAFT_${k.toUpperCase}"))
      .orElse(fromFile.get(k))
  }

  private def record(key: String, desc: String, default: String): Unit =
    seen.getOrElseUpdate(canonical(key), (desc, default))

  def getString(key: String, desc: String, default: String): String = {
    record(key, desc, default)
    optional(key).getOrElse(default)
  }

  def getInt(key: String, desc: String, default: Int): Int = {
    record(key, desc, default.toString)
    optional(key).map(_.trim.toInt).getOrElse(default)
  }

  def getDouble(key: String, desc: String, default: Double): Double = {
    record(key, desc, default.toString)
    optional(key).map(_.trim.toDouble).getOrElse(default)
  }

  def getBoolean(key: String, desc: String, default: Boolean): Boolean = {
    record(key, desc, default.toString)
    optional(key).map { raw =>
      raw.trim.toLowerCase match {
        case "" | "true" | "1" | "yes" | "on" => true
        case "false" | "0" | "no" | "off" => false
        case other => throw new IllegalArgumentException(
          s"--${canonical(key)}: expected a boolean (true/false/1/0/yes/no/on/off), got '$other'")
      }
    }.getOrElse(default)
  }

  /** Comma-separated list. */
  def getStrings(key: String, desc: String, default: Seq[String]): Seq[String] = {
    record(key, desc, default.mkString(","))
    optional(key).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(default)
  }

  /** All `prefix.<name>=value` pairs from the CLI/config layers (e.g.
    * `--meta.attribution=...` -> archive metadata); CLI wins per key. */
  def withPrefix(prefix: String): Map[String, String] = {
    val p = canonical(prefix) + "."
    (fromFile ++ cli).collect { case (k, v) if k.startsWith(p) => k.substring(p.length) -> v }
  }

  /** Help text for every option consumed so far. */
  def describe(): String =
    seen.map { case (k, (desc, default)) =>
      f"  --$k%-24s $desc (default: $default)"
    }.mkString("\n")

  def helpRequested: Boolean = cli.contains("help")
}

object Arguments {

  /** Parse `--key=value` / `key=value` tokens (a bare `--flag` means
    * `flag=true`) plus an optional `--config=<properties file>`. */
  def parse(args: Array[String]): Arguments = {
    val cli = args.iterator.map { raw =>
      val t = raw.stripPrefix("--")
      t.indexOf('=') match {
        case -1 => t.toLowerCase.replace('-', '_') -> "true"
        case i => t.substring(0, i).toLowerCase.replace('-', '_') -> t.substring(i + 1)
      }
    }.toMap
    val fromFile = cli.get("config").map { path =>
      val p = new java.util.Properties()
      val in = new java.io.FileInputStream(path)
      try p.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      p.asScala.map { case (k, v) => k.toLowerCase.replace('-', '_') -> v }.toMap
    }.getOrElse(Map.empty)
    // layers stay separate so props/env can sit between them
    new Arguments(cli, fromFile)
  }

  def of(pairs: (String, String)*): Arguments = parse(pairs.map { case (k, v) => s"--$k=$v" }.toArray)
}
