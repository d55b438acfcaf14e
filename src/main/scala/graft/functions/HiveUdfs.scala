package graft.functions

import org.apache.hadoop.hive.ql.exec.UDF

/** ddl09: JVM UDFs in the HIVE REGISTRATION SHAPE — the classes a
  * migrating warehouse user points `CREATE TEMPORARY FUNCTION name AS
  * '<class>'` at (Hive's `UDF` contract: a public `evaluate` method,
  * resolved by reflection). The native-Expression path
  * (GraftExtensions) is the performance lane; this is the
  * compatibility lane for the SQL-text spelling Hive users type in
  * week one. Keep these reflection UDFs OFF hot paths: they run row
  * at a time outside codegen.
  *
  * hive-exec ships with Spark's Hive support — no new dependency. */
class HiveTokenCount extends UDF {
  /** Whitespace token count, null-safe — mirrors the engine's q49
    * token-counting semantics so a parity spec can pin them equal. */
  def evaluate(text: String): Int =
    if (text == null) 0
    else {
      val t = text.trim
      if (t.isEmpty) 0 else t.split("\\s+").length
    }
}

/** Lowercase-and-trim normalizer in the same Hive UDF shape —
  * the q54/q40 normalization key, callable from SQL text. */
class HiveNormalize extends UDF {
  def evaluate(text: String): String =
    if (text == null) null else text.trim.toLowerCase
}
