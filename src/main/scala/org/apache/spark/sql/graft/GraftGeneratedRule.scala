package org.apache.spark.sql.graft

import graft.catalog.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GeneratedColumn
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** The public face of catalyst's generated-column metadata key for code
  * outside the spark.sql package tree (GraftCatalog encodes the DDL's
  * `GENERATED ALWAYS AS (expr)` under Spark's own key so DESCRIBE and
  * catalyst utilities agree on where it lives). */
object GraftGenerated {
  val MetadataKey: String = GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY
  val MarkerKey = "graft.generated.computed"

  def generation(f: StructField): Option[String] =
    GeneratedColumn.getGenerationExpression(f)
}

/** Computation of `GENERATED ALWAYS AS (expr)` columns on write — the
  * half Spark's SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS leaves to
  * the connector (Delta computes them the same way). Runs in the
  * resolution fixpoint on ALIGNED v2 writes (after output resolution the
  * query's columns match the table's positionally and by name), and
  * REPLACES each generated position with the parsed generation
  * expression over the sibling columns — whatever placeholder output
  * resolution put there. Explicit user values never survive to here:
  * [[GraftIdentityRule]] refuses them pre-resolution, so the only
  * placeholder is the NULL fill of an omitted column. The replacement
  * keeps names and types (the expression is cast to the declared type),
  * so the write stays aligned and the rewrite converges in one pass
  * (the marker metadata makes it idempotent). */
class GraftGeneratedRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def genCols(schema: StructType): Seq[(Int, StructField, String)] =
    schema.fields.zipWithIndex.toSeq.flatMap { case (f, i) =>
      GraftGenerated.generation(f).map(sql => (i, f, sql))
    }

  private def marker: Metadata =
    new MetadataBuilder().putBoolean(GraftGenerated.MarkerKey, value = true)
      .build()

  private def tagged(q: LogicalPlan): Boolean = q match {
    case Project(exprs, _) => exprs.exists {
      case a: Alias => a.metadata.contains(GraftGenerated.MarkerKey)
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case w: V2WriteCommand if w.query.resolved && w.outputResolved &&
        !tagged(w.query) =>
      // UPDATE/MERGE/DELETE arrive as row-level writes whose relation
      // wraps the table in a RowLevelOperationTable — unwrap it, so the
      // copy-on-write rewrite recomputes generated columns too (a SET on
      // a sibling column must never leave the derived value stale)
      val underlying = w.table match {
        case r: DataSourceV2Relation => r.table match {
          case rl: org.apache.spark.sql.connector.write.RowLevelOperationTable
              => rl.table
          case t => t
        }
        case _ => null
      }
      underlying match {
        case g: GraftTable =>
          val schema = g.schema()
          val gs = genCols(schema)
          if (gs.isEmpty) w
          else {
            // match by NAME, not position: row-level writes prepend
            // operation-marker columns, and alignment already renamed
            // the data columns to the table's names
            val byName = gs.map { case (_, f, sql) =>
              f.name.toLowerCase(java.util.Locale.ROOT) -> ((f, sql))
            }.toMap
            val projected: Seq[NamedExpression] =
              w.query.output.map { attr =>
                byName.get(attr.name.toLowerCase(java.util.Locale.ROOT)) match {
                  case Some((f, sql)) =>
                    Alias(Cast(
                      spark.sessionState.sqlParser.parseExpression(sql),
                      f.dataType), f.name)(explicitMetadata = Some(marker))
                  case None => attr
                }
              }
            w.withNewQuery(Project(projected, w.query))
          }
        case _ => w
      }
  }
}
