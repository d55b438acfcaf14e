package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** ddl10: PERSISTENT function registry — the week-two Hive surface gap
  * left after ddl09's `CREATE TEMPORARY FUNCTION`: in Hive, a
  * NON-temporary `CREATE FUNCTION` lands in the metastore's FUNCS
  * table and survives every restart; Spark's in-memory catalog keeps
  * it only for the catalog's lifetime, so a warehouse team's UDF
  * inventory silently evaporates with the session. This registry is
  * the metastore FUNCS table as a lake artifact (the IncrementalView
  * def-file transport): `createJvm`/`createSql` register the function
  * in the live catalog AND append its definition to a versioned
  * `_graft_functions` file under the warehouse; `replay` re-registers
  * every recorded function into a fresh session — run it at session
  * startup and permanent-function semantics survive restarts with no
  * Hive metastore.
  *
  * Two definition kinds:
  *   - `jvm`: Hive-`UDF`-shape classes (`CREATE FUNCTION f AS
  *     '<class>'`) — ddl09's compatibility lane, now restart-durable;
  *   - `sql`: SQL-body scalar functions (`CREATE FUNCTION f(x T)
  *     RETURNS T RETURN <expr>`) — the engine's answer to Hive's
  *     `CREATE TEMPORARY MACRO` (same inline-expression semantics,
  *     but named-signature, catalog-resident, and Catalyst-planned —
  *     the expression inlines into the caller's plan, so unlike the
  *     jvm lane it stays inside whole-stage codegen).
  *
  * Definitions are one per line, TAB-separated (SQL text contains
  * commas; tabs are rejected at create time), behind a format-version
  * header (the r14 IncrementalView lesson: unversioned def files turn
  * field reorders into silent data corruption). Replay uses CREATE OR
  * REPLACE, so replaying over a live catalog is idempotent and a
  * re-create with a new body simply wins. */
object FunctionRegistry {

  private val Header = "graft-fnreg-v1"

  def regPath(spark: SparkSession): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), "_graft_functions")

  private def fs(spark: SparkSession) =
    regPath(spark).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readLines(spark: SparkSession): Seq[String] = {
    val p = regPath(spark)
    val f = fs(spark)
    // crash-window recovery: writeLines is temp-then-rename, but a
    // crash BETWEEN the delete and the rename leaves only the temp
    // file — complete the interrupted rename before reading, so no
    // definition is ever lost to that window
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    if (!f.exists(p) && f.exists(tmp)) { f.rename(tmp, p); () }
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = body.split("\n", -1).toSeq.filter(_.nonEmpty)
    require(lines.headOption.forall(_ == Header),
      s"function registry at $p is not a $Header file")
    lines.drop(1)
  }

  /** Temp-then-rename so a crash mid-write never truncates the file. */
  private def writeLines(spark: SparkSession, lines: Seq[String]): Unit = {
    val dst = regPath(spark)
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    val f = fs(spark)
    val out = f.create(tmp, true)
    try out.write((Header +: lines).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"rename $tmp -> $dst failed")
  }

  /** The registry is line-oriented and TAB-delimited, so a definition
    * containing a newline would split into garbage lines and a tab
    * would shift fields — both are rejected up front rather than
    * written broken (replay would otherwise silently lose every
    * function recorded after the bad one). Multi-line SQL bodies are
    * legal in the catalog; flatten them before recording. */
  private def checkField(what: String, v: String): Unit =
    require(!v.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"function $what may not contain tab/newline characters " +
        "(the registry file is line-oriented; flatten the SQL body)")

  /** Record-or-replace one definition line keyed on (kind, name).
    * LakeLock-guarded: concurrent sessions' read-modify-writes
    * serialize instead of losing each other's definitions. */
  private def record(spark: SparkSession, kind: String, name: String,
                     line: String): Unit =
    graft.operators.LakeLock.withWriter(spark, "_graft_functions") {
      val key = s"$kind\t${name.toLowerCase}\t"
      val kept = readLines(spark).filterNot(_.toLowerCase.startsWith(key))
      writeLines(spark, kept :+ line)
    }

  /** Permanent JVM (Hive-shape) function: registers `CREATE OR REPLACE
    * FUNCTION name AS 'className'` and records it for replay. */
  def createJvm(spark: SparkSession, name: String, className: String): Unit = {
    checkField("name", name); checkField("class", className)
    spark.sql(s"CREATE OR REPLACE FUNCTION $name AS '$className'")
    record(spark, "jvm", name, s"jvm\t${name.toLowerCase}\t$className")
  }

  /** Permanent SQL-body function (the Hive-macro lane): `body` is the
    * signature + RETURN expression, e.g.
    * `(x STRING) RETURNS DOUBLE RETURN length(x) * 0.1`. */
  def createSql(spark: SparkSession, name: String, body: String): Unit = {
    checkField("name", name); checkField("body", body)
    spark.sql(s"CREATE OR REPLACE FUNCTION $name $body")
    record(spark, "sql", name, s"sql\t${name.toLowerCase}\t$body")
  }

  /** Drop from the live catalog AND the registry. */
  def drop(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP FUNCTION IF EXISTS $name")
    graft.operators.LakeLock.withWriter(spark, "_graft_functions") {
      val key = s"\t${name.toLowerCase}\t"
      writeLines(spark, readLines(spark).filterNot(_.toLowerCase.contains(key)))
    }
  }

  /** Re-register every recorded function into `spark`'s catalog — the
    * session-startup hook that makes CREATE FUNCTION survive restarts.
    * Idempotent (CREATE OR REPLACE); returns the registered names.
    * Per-entry fault isolation: one stale definition (e.g. a jvm
    * function whose class left the classpath) warns and is skipped
    * rather than aborting the replay of everything after it. */
  def replay(spark: SparkSession): Seq[String] = {
    // read under the same writer lock as record()/drop(): readLines'
    // crash-recovery rename (tmp -> dst) would otherwise race a
    // concurrent writer sitting between its delete(dst) and
    // rename(tmp, dst), stealing the half-committed tmp out from under
    // it and failing the writer's rename (r16 review). Only the read
    // is locked; catalog registration below touches no lake state.
    val lines = graft.operators.LakeLock.withWriter(spark, "_graft_functions") {
      readLines(spark)
    }
    lines.flatMap { l =>
      try l.split("\t", 3) match {
        case Array("jvm", name, className) =>
          spark.sql(s"CREATE OR REPLACE FUNCTION $name AS '$className'")
          Some(name)
        case Array("sql", name, body) =>
          spark.sql(s"CREATE OR REPLACE FUNCTION $name $body")
          Some(name)
        case other => throw new IllegalArgumentException(
          s"unrecognized function registry line: ${other.mkString("\t")}")
      } catch {
        case e: Exception =>
          System.err.println(
            s"[graft] function-registry replay skipped one entry: $e")
          None
      }
    }
  }
}
