package org.apache.spark.sql.graft

import graft.catalog.{GraftCatalog, GraftViews}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL view DDL over Graft catalogs — `CREATE [OR REPLACE] VIEW
  * cat.ns.v AS ...`, `DROP VIEW [IF EXISTS] cat.ns.v`, `SHOW VIEWS IN
  * cat.ns` — via session extensions ([[graft.GraftExtensions]]), closing
  * the asymmetry where view DDL only had the `CALL create_view`
  * procedure face. Upstream Spark 4.1 parses these statements but its
  * analyzer routes them exclusively to the session catalog
  * (`ResolveSessionCatalog` rejects any other catalog), so — exactly
  * like Iceberg's view support — a catalog that stores its own views
  * must intercept the parsed plans in an injected rule. The rule runs in
  * the HINTS batch (before Resolution), where the identifier is still
  * unresolved and `ResolveSessionCatalog` has not yet had the chance to
  * reject the statement; it rewrites matching nodes into runnable
  * commands over [[GraftViews]]' storage, which the procedures share —
  * the two faces stay interchangeable. Statements naming any other
  * catalog (or no catalog) pass through untouched. */
class GraftViewDdlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The warehouse of `parts.head` when it names a registered
    * GraftCatalog (view DDL must be catalog-qualified to reach us —
    * unqualified names keep Spark's session-catalog semantics). */
  private def graftWarehouse(parts: Seq[String]): Option[String] =
    if (parts.size < 2) None
    else {
      val cm = spark.sessionState.catalogManager
      if (!cm.isCatalogRegistered(parts.head)) None
      else cm.catalog(parts.head) match {
        case g: GraftCatalog => Some(g.warehouseDir)
        case _ => None
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateView => c.child match {
      case UnresolvedIdentifier(parts, _) =>
        graftWarehouse(parts) match {
          case Some(wh) =>
            val sql = c.originalText.getOrElse(throw new IllegalArgumentException(
              s"CREATE VIEW ${parts.mkString(".")}: no SQL text to store"))
            GraftCreateViewCommand(wh, parts.last, sql,
              c.allowExisting, c.replace)
          case None => c
        }
      case _ => c
    }
    case d: DropView => d.child match {
      case UnresolvedIdentifier(parts, _) =>
        graftWarehouse(parts) match {
          case Some(wh) => GraftDropViewCommand(wh, parts.last, d.ifExists)
          case None => d
        }
      case _ => d
    }
    case s: ShowViews => s.namespace match {
      case UnresolvedNamespace(parts, _) =>
        graftWarehouse(parts :+ "_") match { // namespace = catalog [+ ns]
          case Some(wh) =>
            GraftShowViewsCommand(wh, parts.drop(1).mkString("."),
              s.pattern, s.output)
          case None => s
        }
      case _ => s
    }
    case other => other
  }
}

/** CREATE [OR REPLACE] VIEW — persists the SQL text in the warehouse's
  * `_views/` store and registers the session temp view, exactly like
  * `CALL create_view`. The stored text is validated by ANALYZING it
  * first (parse + resolution against live tables), so a typo fails the
  * DDL, not the first reader. */
case class GraftCreateViewCommand(warehouse: String, name: String,
    sql: String, allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (GraftViews.exists(spark, warehouse, name) && allowExisting)
      return Seq.empty
    // analysis-only validation: .analyzed never executes the query
    spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql)).analyzed
    GraftViews.create(spark, warehouse, name, sql, replace = replace)
    GraftViews.register(spark, warehouse, name)
    Seq.empty
  }
}

case class GraftDropViewCommand(warehouse: String, name: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val existed = GraftViews.drop(spark, warehouse, name)
    if (!existed && !ifExists)
      throw new IllegalArgumentException(s"view $name does not exist")
    Seq.empty
  }
}

case class GraftShowViewsCommand(warehouse: String, namespace: String,
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // SHOW VIEWS LIKE patterns: '*' = any chars, '|' = alternation —
    // both map directly onto the regex forms
    val re = pattern.map(p => p.replace("*", ".*").r)
    GraftViews.list(spark, warehouse)
      .filter(n => re.forall(_.pattern.matcher(n).matches()))
      .map(n => Row(namespace, n, false))
  }
}
