package graft.ops

import org.apache.spark.sql.DataFrame

import scala.sys.process._

/** Self-describing external transformers — the rebuild of greenmask's
  * custom Cmd registry (`internal/custom/custom_cmd.go:40-300`,
  * `dynamic_definition.go:36`, bootstrap `bootatrsp_transformers.go:32-70`):
  * at startup each configured executable is invoked with
  * `--print-definition` and must answer a JSON definition; the definition
  * registers a pipe-based table transformer under its own name.
  */
case class CmdDefinition(name: String, description: String, codec: String)

object CustomCmd {

  /** Query the executable for its definition (PROCESS boundary, driver
    * side — mirrors the reference's bootstrap step). */
  def printDefinition(cmd: Seq[String]): CmdDefinition = {
    val out = (cmd :+ "--print-definition").!!.trim
    parseDefinition(out)
  }

  def parseDefinition(json: String): CmdDefinition = {
    def field(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(json).map(_.group(1))
    val name = field("name").getOrElse(
      throw new IllegalArgumentException(s"custom cmd definition missing name: $json"))
    CmdDefinition(name, field("description").getOrElse(""),
      field("codec").getOrElse("csv"))
  }

  /** Registry of bootstrapped custom transformers: name -> pipe stage. */
  final class Registry {
    private val entries = scala.collection.mutable.Map[String, (Seq[String], CmdDefinition)]()

    def bootstrap(cmd: Seq[String]): CmdDefinition = {
      val d = printDefinition(cmd)
      entries(d.name) = (cmd, d)
      d
    }

    def names: Set[String] = entries.keySet.toSet

    def apply(name: String, df: DataFrame): DataFrame = {
      val (cmd, d) = entries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown custom transformer $name"))
      Pipe.through(df, cmd, d.codec)
    }
  }
}
