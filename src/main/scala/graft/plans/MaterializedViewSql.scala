package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.sources.IncrementalView
import graft.sources.IncrementalView.{Agg, Dim}

/** sql08: SQL-text reach for the materialized-view family (mv01–mv04)
  * — the discipline sql07 restored for the video operators applied to
  * view maintenance: a warehouse user expects `CREATE MATERIALIZED
  * VIEW` / `REFRESH MATERIALIZED VIEW` as STATEMENTS, not a Scala API.
  * Spark's grammar has neither (its `CREATE VIEW` is a logical view;
  * nothing materializes), so this parser extension — the ddl12
  * [[MacroParser]] route — intercepts the two statements and maps them
  * onto the verified [[IncrementalView]] entry points:
  *
  *   CREATE MATERIALIZED VIEW '/lake/mv'
  *     AS SELECT g, count(*) AS n, sum(va) AS sa
  *     FROM SNAPSHOT '/lake/factA'
  *     [JOIN SNAPSHOT '/lake/factB' USING (k)]      -- mv04
  *     [DIM '/lake/dim.parquet' ON nk]              -- mv03
  *     GROUP BY g
  *
  *   REFRESH MATERIALIZED VIEW '/lake/mv' [FULL]
  *
  * Views and bases are PATH-addressed (s16 snapshot tables live on
  * lake paths, not in the catalog), hence the quoted-path spelling —
  * the same addressing every SnapshotTable SQL surface (sql04) uses.
  * REFRESH auto-detects the view class from its def file (join views
  * fold three delta terms, single-base views one) and `FULL` maps to
  * the rebuild escape hatch the incremental refresh names when a base
  * mutated. Both statements execute when the PLAN runs (proper
  * `LeafRunnableCommand`s, so EXPLAIN explains them instead of running
  * them) and return the published view version as a one-row frame.
  *
  * Every non-MV statement passes through to the delegate untouched —
  * one anchored, case-folded probe that fails within a few characters
  * (the MacroParser fast-path discipline). */
class MaterializedViewSqlParser(session: SparkSession,
                                delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    MaterializedViewSql.parse(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

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

object MaterializedViewSql {

  // anchored, fails in a few characters on every non-MV statement;
  // the optional EXPLAIN prefix admits exactly one mode keyword, so
  // `EXPLAIN SELECT ... 'CREATE MATERIALIZED VIEW'` (the keywords in a
  // string literal) never probes true
  private val Probe =
    raw"(?is)^\s*(?:EXPLAIN(?:\s+\w+)?\s+)?(?:CREATE|REFRESH)\s+MATERIALIZED\s+VIEW\b.*".r

  /** EXPLAIN over an MV statement: Spark's own EXPLAIN re-parses the
    * inner statement with ITS grammar (where `REFRESH <path>` means
    * cache refresh and chokes on the quoted path), so the wrapper is
    * intercepted too and planned as a real ExplainCommand over the
    * intercepted inner plan. */
  private val Explain =
    raw"(?is)^\s*EXPLAIN(\s+(?:EXTENDED|CODEGEN|COST|FORMATTED))?\s+((?:CREATE|REFRESH)\s+MATERIALIZED\s+VIEW\b.*)$$".r

  private val Create = (
    raw"(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+'([^']+)'" +
    raw"\s+AS\s+SELECT\s+(.*?)" +
    raw"\s+FROM\s+SNAPSHOT\s+'([^']+)'" +
    raw"(?:\s+JOIN\s+SNAPSHOT\s+'([^']+)'\s+USING\s*\(([^)]*)\))?" +
    raw"(?:\s+DIM\s+'([^']+)'\s+ON\s+(\w+))?" +
    raw"\s+GROUP\s+BY\s+(.+?)\s*;?\s*$$").r

  private val Refresh =
    raw"(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+'([^']+)'(\s+FULL)?\s*;?\s*$$".r

  private val AggItem =
    raw"(?is)^(count|sum|min|max)\s*\((\s*\*\s*|\s*1\s*|[^)]*)\)\s+AS\s+(\w+)$$".r

  /** Some(plan) for the two MV statements; None for everything else. */
  def parse(sqlText: String): Option[LogicalPlan] = {
    if (!Probe.pattern.matcher(sqlText).matches()) return None
    sqlText match {
      case Explain(mode, inner) =>
        parse(inner).map(p =>
          org.apache.spark.sql.execution.command.ExplainCommand(p,
            org.apache.spark.sql.execution.ExplainMode.fromString(
              Option(mode).map(_.trim.toLowerCase).getOrElse("simple"))))
      case Refresh(mvPath, full) =>
        Some(RefreshMaterializedViewCommand(mvPath, full != null))
      case Create(mvPath, selectList, baseA, baseB, usingCols, dimPath,
                  dimKey, groupBy) =>
        require(baseB == null || dimPath == null,
          "CREATE MATERIALIZED VIEW: JOIN SNAPSHOT and DIM are mutually " +
          "exclusive (mv04 joins two facts; mv03 enriches one fact with " +
          "a static dim)")
        val keys = splitIdents(groupBy)
        val (plain, aggs) = parseSelectList(selectList)
        require(plain == keys,
          s"CREATE MATERIALIZED VIEW: the select list's plain columns " +
          s"(${plain.mkString(", ")}) must equal GROUP BY " +
          s"(${keys.mkString(", ")}), in order")
        require(aggs.nonEmpty,
          "CREATE MATERIALIZED VIEW: need at least one aggregate " +
          "(count/sum/min/max ... AS name) in the select list")
        val join = Option(baseB).map(b => (b, splitIdents(usingCols)))
        val dim = Option(dimPath).map(p => Dim(p, dimKey))
        Some(CreateMaterializedViewCommand(mvPath, baseA, keys, aggs,
          join, dim))
      case other => throw new IllegalArgumentException(
        "malformed MATERIALIZED VIEW statement; expected\n" +
        "  CREATE MATERIALIZED VIEW '<path>' AS SELECT <keys..., " +
        "fn(col) AS name...> FROM SNAPSHOT '<path>' [JOIN SNAPSHOT " +
        "'<path>' USING (k,...)] [DIM '<path>' ON key] GROUP BY <keys>\n" +
        "  REFRESH MATERIALIZED VIEW '<path>' [FULL]\n" +
        s"got: $other")
    }
  }

  private def splitIdents(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Split the select list on top-level commas (agg args may not nest
    * parens — count/sum/min/max over one column — but the split stays
    * paren-aware for clear errors) into plain key columns and
    * [[Agg]]s. Order is preserved; keys must lead or interleave —
    * only the SET versus GROUP BY matters, but we compare in order
    * for a readable contract. */
  private def parseSelectList(s: String): (Seq[String], Seq[Agg]) = {
    val items = {
      val out = Seq.newBuilder[String]
      var depth = 0; var start = 0; var i = 0
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
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    val plain = Seq.newBuilder[String]
    val aggs = Seq.newBuilder[Agg]
    items.foreach {
      case AggItem(fn, arg, as) =>
        val a = arg.trim
        val column = if (fn.toLowerCase == "count" && (a == "*" || a == "1")) ""
          else a
        aggs += Agg(fn.toLowerCase, column, as)
      case id if id.matches(raw"(?s)^\w+$$") => plain += id
      case bad => throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW select item '$bad' is neither a " +
        "group key column nor count/sum/min/max(col) AS name — the " +
        "algebraic-aggregate contract (store sum+count for avg)")
    }
    (plain.result(), aggs.result())
  }
}

/** Runs at plan EXECUTION (not parse) — EXPLAIN on the statement
  * explains, a collect creates. Returns the published view version. */
case class CreateMaterializedViewCommand(
    mvPath: String, baseA: String, keys: Seq[String], aggs: Seq[Agg],
    join: Option[(String, Seq[String])], dim: Option[Dim])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = join match {
      case Some((baseB, joinKeys)) =>
        IncrementalView.createJoin(session, mvPath, baseA, baseB,
          joinKeys, keys, aggs)
      case None =>
        IncrementalView.create(session, mvPath, baseA, keys, aggs, dim)
    }
    Seq(Row(v))
  }
}

/** REFRESH — incremental by default (delta fold), FULL for the rebuild
  * escape hatch. The view class (join vs single-base) is read from the
  * view's own def file. */
case class RefreshMaterializedViewCommand(mvPath: String, full: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val isJoin = IncrementalView.isJoinView(session, mvPath)
    val v =
      if (isJoin && full) IncrementalView.fullRefreshJoin(session, mvPath)
      else if (isJoin) IncrementalView.refreshJoin(session, mvPath)
      else if (full) IncrementalView.fullRefresh(session, mvPath)
      else IncrementalView.refresh(session, mvPath)
    Seq(Row(v))
  }
}
