package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StructType, StringType, StructField}

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import scala.collection.mutable.ArrayBuffer

/** External-process row transformer — the Spark rebuild of the reference's
  * `Cmd` transformer (`transformers/cmd.go:50-140`, framing protocol
  * `utils/cmd_transformer_base.go:39-360`, csv/json codecs
  * `pkg/toolkit/csv_api.go:30`, `json_api.go:35`).
  *
  * One process per PARTITION (not per row): `mapPartitions` spawns the
  * executable, a feeder thread streams encoded rows to stdin, the
  * partition iterator yields decoded rows from stdout. At 1000 executors
  * that is one process per task — the same worker-pool shape the reference
  * builds by hand with goroutines (`transformation_window.go`), inherited
  * from Spark's scheduler for free.
  */
/** Cmd execution options (ref `transformers/cmd.go:50-140`): per-process
  * timeout (default 2s in the reference, 0 = unlimited here), expected
  * exit code, and null-input skip behavior (`skip_on_null_input` with
  * any/all semantics — skipped rows bypass the process and pass through
  * unchanged). */
case class PipeOptions(timeoutSec: Int = 0, expectedExitCode: Int = 0,
                       skipOnNull: Option[String] = None) {
  require(skipOnNull.forall(Set("any", "all")), "skipOnNull: 'any' or 'all'")
}

object Pipe {

  /** Pipe selected string-encoded columns through `cmd`. The command must
    * echo one output line per input line (same contract as the reference's
    * line-oriented csv/json drivers). Output schema = input columns, all
    * StringType (callers re-cast as needed, mirroring the reference's
    * text-format round-trip).
    *
    * @param codec "csv" (tab-separated, \\N for NULL — pgcopy-style) or
    *              "json" (one object per line keyed by column name)
    */
  def through(df: DataFrame, cmd: Seq[String], codec: String = "csv",
              opts: PipeOptions = PipeOptions()): DataFrame = {
    val cols = df.columns.toSeq
    val outSchema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val isJson = codec match {
      case "json" => true
      case "csv" => false
      case other => throw new IllegalArgumentException(s"Pipe: unknown codec $other")
    }

    df.toDF(cols: _*).mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        // Materialize the partition's string form once: needed to merge
        // skipped (null-input) rows back in positional order. Partition
        // size is bounded by the scan split size, so memory stays bounded.
        val strRows: Seq[Seq[String]] = rows.map { r =>
          (0 until r.length).map(i =>
            if (r.isNullAt(i)) null else String.valueOf(r.get(i))): Seq[String]
        }.toSeq
        def skipped(fields: Seq[String]): Boolean = opts.skipOnNull match {
          case Some("any") => fields.exists(_ == null)
          case Some("all") => fields.nonEmpty && fields.forall(_ == null)
          case _ => false
        }

        val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
        val stdin = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, "UTF-8"))
        val stdout = new BufferedReader(new InputStreamReader(proc.getInputStream, "UTF-8"))

        // Watchdog: kill the process past the timeout (`cmd.go:98-100`).
        val watchdog = if (opts.timeoutSec > 0) {
          val t = new Thread(() => {
            if (!proc.waitFor(opts.timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS))
              proc.destroyForcibly()
          }, "graft-pipe-watchdog")
          t.setDaemon(true); t.start(); Some(t)
        } else None

        // Feeder thread: encode + stream non-skipped rows, then close
        // stdin so the process terminates (decoupled scan/transform, the
        // analog of dumpers/table.go:101-119's goroutine pipeline).
        val feeder = new Thread(() => {
          try {
            strRows.foreach { fields =>
              if (!skipped(fields)) {
                val line =
                  if (isJson)
                    fields.zip(cols).map { case (v, c) =>
                      val vv = if (v == null) "null" else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
                      "\"" + c + "\":" + vv
                    }.mkString("{", ",", "}")
                  else fields.map(v => if (v == null) "\\N" else v).mkString("\t")
                stdin.write(line); stdin.newLine()
              }
            }
          } finally stdin.close()
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()

        val transformed = new ArrayBuffer[Seq[Any]]()
        var line = stdout.readLine()
        while (line != null) {
          val values: Seq[Any] =
            if (isJson) parseFlatJson(line, cols)
            else line.split("\t", -1).toSeq.map(v => if (v == "\\N") null else v)
          transformed += values.padTo(cols.size, null).take(cols.size)
          line = stdout.readLine()
        }
        val exit = proc.waitFor()
        if (exit != opts.expectedExitCode)
          throw new RuntimeException(
            s"Pipe: ${cmd.head} exited with $exit (expected ${opts.expectedExitCode}; timeout=${opts.timeoutSec}s)")

        // merge: skipped rows pass through unchanged, in position
        val it = transformed.iterator
        strRows.iterator.map { fields =>
          if (skipped(fields)) Row.fromSeq(fields)
          else {
            if (!it.hasNext) throw new RuntimeException(
              s"Pipe: ${cmd.head} produced fewer lines than fed")
            Row.fromSeq(it.next())
          }
        }
      }
    }(enc)
  }

  /** Minimal flat-JSON-object line parser (string/null values) for the
    * json codec round-trip — no external deps by design. */
  private[ops] def parseFlatJson(line: String, cols: Seq[String]): Seq[Any] = {
    val m = scala.collection.mutable.Map[String, String]()
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*(null|"(?:[^"\\]|\\.)*")""".r
    re.findAllMatchIn(line).foreach { mm =>
      val k = unescape(mm.group(1))
      val v = mm.group(2)
      m(k) = if (v == "null") null else unescape(v.substring(1, v.length - 1))
    }
    cols.map(c => m.getOrElse(c, null))
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
