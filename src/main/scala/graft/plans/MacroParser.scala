package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** ddl12: `CREATE TEMPORARY MACRO` — the last week-one Hive statement
  * with no Spark equivalent (r15 "What's missing" #5). Hive macros are
  * named inline expressions:
  *
  *   CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x));
  *   SELECT sigmoid(score) FROM t;
  *   DROP TEMPORARY MACRO sigmoid;
  *
  * Spark's SQL scalar functions (`CREATE TEMPORARY FUNCTION f(...)
  * RETURNS T RETURN expr`) have the exact semantics — named signature,
  * expression INLINED into the caller's plan (stays inside whole-stage
  * codegen, the ddl10 `createSql` lane) — except the macro syntax
  * carries no return type: Hive infers it from the body. This parser
  * closes that gap: it intercepts the two macro statements, infers the
  * return type by analyzing the body against NULL-typed arguments
  * (`SELECT (body) FROM (SELECT CAST(NULL AS T) AS arg, ...)` — the
  * analyzer's own coercion rules, so the inferred type matches what
  * the inlined expression will produce), and delegates the rewritten
  * `CREATE OR REPLACE TEMPORARY FUNCTION` to Spark's parser. Every
  * non-macro statement passes through untouched (one anchored regex
  * probe that fails within a few characters).
  *
  * OR REPLACE on purpose: re-declaring a macro wins, matching ddl10's
  * replay idempotence (Hive's error-on-exists adds nothing a session
  * script wants). DROP maps to DROP TEMPORARY FUNCTION, IF EXISTS
  * passing through. */
class MacroParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(MacroParser.rewrite(session, sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object MacroParser {

  private val Create = raw"(?is)^\s*CREATE\s+TEMPORARY\s+MACRO\s+(\w+)\s*\((.*)$$".r
  private val Drop =
    raw"(?is)^\s*DROP\s+TEMPORARY\s+MACRO\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$$".r
  // whitespace-INSENSITIVE fast-path probe (SQL allows any run of
  // whitespace between keywords — a startsWith on the trimmed text
  // missed `CREATE  TEMPORARY MACRO`, r16 review); anchored and
  // case-folded, it fails in a few chars on every non-macro statement
  private val Probe =
    raw"(?is)^\s*(?:CREATE|DROP)\s+TEMPORARY\s+MACRO\b.*".r

  /** Rewrite a macro statement to its TEMPORARY FUNCTION form; any
    * other statement returns unchanged. */
  def rewrite(session: SparkSession, sqlText: String): String = {
    if (!Probe.pattern.matcher(sqlText).matches()) return sqlText
    sqlText match {
      case Drop(ifExists, name) =>
        val ie = if (ifExists != null) "IF EXISTS " else ""
        s"DROP TEMPORARY FUNCTION $ie$name"
      case Create(name, rest) =>
        val (argList, body0) = splitArgsAndBody(rest)
        val body = body0.trim.stripSuffix(";").trim
        require(body.nonEmpty,
          s"CREATE TEMPORARY MACRO $name: missing body expression")
        val args = splitTopLevel(argList).map(_.trim).filter(_.nonEmpty)
        val retType = inferReturnType(session, args, body)
        val sig = args.mkString(", ")
        s"CREATE OR REPLACE TEMPORARY FUNCTION $name($sig) RETURNS $retType RETURN $body"
      case _ => sqlText
    }
  }

  /** `rest` starts just past the signature's opening paren: walk the
    * balanced parens (arg types like DECIMAL(10,2) nest) to split the
    * signature from the body expression. */
  private def splitArgsAndBody(rest: String): (String, String) = {
    var depth = 1
    var i = 0
    while (i < rest.length && depth > 0) {
      rest.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, "CREATE TEMPORARY MACRO: unbalanced signature parens")
    (rest.substring(0, i - 1), rest.substring(i))
  }

  /** Split `a INT, b DECIMAL(10,2)` on TOP-LEVEL commas only. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Hive infers the macro's type from its body; we do the same by
    * ANALYZING the body with each argument bound to a NULL of its
    * declared type — the analyzer applies the same coercions the
    * inlined function body will get, so the declared RETURNS type is
    * exactly the inlined expression's type. Analysis only — nothing
    * executes. */
  private def inferReturnType(session: SparkSession, args: Seq[String],
                              body: String): String = {
    val probe =
      if (args.isEmpty) s"SELECT ($body)"
      else {
        val binds = args.map { a =>
          val (n, t) = a.span(!_.isWhitespace)
          require(t.trim.nonEmpty,
            s"macro argument '$a' needs a type (name TYPE)")
          s"CAST(NULL AS ${t.trim}) AS $n"
        }.mkString(", ")
        s"SELECT ($body) FROM (SELECT $binds)"
      }
    session.sql(probe).schema.head.dataType.sql
  }
}
