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
          // one replacement builder per computed column, keyed by name
          // (row-level writes prepend operation-marker columns, and
          // alignment already renamed the data columns to the table's):
          //  - GENERATED ALWAYS AS (expr): recompute unconditionally
          //  - GENERATED ALWAYS AS IDENTITY: COALESCE(col, allocate) —
          //    an omitted column reaches an aligned write (MERGE's
          //    INSERT branch, INSERT BY NAME) as NULL, and for ALWAYS
          //    identity a NULL can never be a legal user value, so the
          //    coalesce IS the fill; committed ids pass through. BY
          //    DEFAULT columns stay as-is (their NULL is legal).
          val builders: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute => NamedExpression] =
            schema.fields.flatMap { f =>
              val key = f.name.toLowerCase(java.util.Locale.ROOT)
              GraftGenerated.generation(f) match {
                case Some(sql) => Some(key -> { (_: org.apache.spark.sql.catalyst.expressions.Attribute) =>
                  Alias(Cast(
                    spark.sessionState.sqlParser.parseExpression(sql),
                    f.dataType), f.name)(explicitMetadata = Some(marker)) })
                case None if f.metadata.contains("identity.start") &&
                    !f.metadata.getBoolean("identity.allowExplicitInsert") =>
                  Some(key -> { (attr: org.apache.spark.sql.catalyst.expressions.Attribute) =>
                    import org.apache.spark.sql.catalyst.expressions.{Add, Coalesce, Literal, Multiply, MonotonicallyIncreasingID}
                    val start = f.metadata.getLong("identity.start")
                    val step = f.metadata.getLong("identity.step")
                    val basis = new graft.core.TableStore(spark,
                      g.warehouseDir).identityBasis(
                      g.storeTable, f.name, start, step)
                    val gen = Cast(Add(Literal(basis + step),
                      Multiply(Literal(step), MonotonicallyIncreasingID())),
                      f.dataType)
                    Alias(Coalesce(Seq(attr, gen)), f.name)(
                      explicitMetadata = Some(marker)) })
                case None => None
              }
            }.toMap
          if (builders.isEmpty) w
          else {
            val projected: Seq[NamedExpression] = w.query.output.map { attr =>
              builders.get(attr.name.toLowerCase(java.util.Locale.ROOT)) match {
                case Some(mk) => mk(attr)
                case None => attr
              }
            }
            w.withNewQuery(Project(projected, w.query))
          }
        case _ => w
      }
  }
}
