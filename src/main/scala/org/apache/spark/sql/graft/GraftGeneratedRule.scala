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

  /** The output resolver's fill for an omitted nullable column — a NULL
    * literal, possibly cast and aliased. This is the ONLY input shape an
    * omitted column can present at an aligned append, so anything else
    * at a GENERATED ALWAYS position is an explicit user value. */
  private def isNullFill(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case a: Alias => isNullFill(a.child)
      case c: Cast => isNullFill(c.child)
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value == null
      case _ => false
    }

  /** Already produced by GraftIdentityRule's pre-resolution rewrite or
    * by this rule — a legal generated value, never a user explicit.
    * Output resolution wraps its OWN alignment projection over the
    * rewritten query, so the marked alias usually arrives here as an
    * AttributeReference — whose metadata inherits the alias's
    * explicitMetadata — possibly under a widening cast. */
  private def hasMarker(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      key: String): Boolean = e match {
    case a: Alias => a.metadata.contains(key) || hasMarker(a.child, key)
    case c: Cast => hasMarker(c.child, key)
    case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
      a.metadata.contains(key)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case w: V2WriteCommand if w.query.resolved && w.outputResolved &&
        !tagged(w.query) =>
      // UPDATE/MERGE/DELETE arrive as row-level writes whose relation
      // wraps the table in a RowLevelOperationTable — unwrap it, so the
      // copy-on-write rewrite recomputes generated columns too (a SET on
      // a sibling column must never leave the derived value stale)
      val (underlying, isRowLevel) = w.table match {
        case r: DataSourceV2Relation => r.table match {
          case rl: org.apache.spark.sql.connector.write.RowLevelOperationTable
              => (rl.table, true)
          case t => (t, false)
        }
        case _ => (null, false)
      }
      underlying match {
        case g: GraftTable if !isRowLevel =>
          rewriteAligned(w, g)
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

  /** Plain aligned appends/overwrites (INSERT, INSERT BY NAME,
    * df.writeTo): each GENERATED ALWAYS position must arrive either
    * marker-tagged (this rule family's own rewrite) or as the output
    * resolver's NULL fill of an omitted column. The NULL fill becomes
    * the generation expression / an identity allocation; anything else
    * is an explicit user value and is REFUSED — the former Coalesce
    * path silently accepted explicit ids through INSERT BY NAME and
    * silently overwrote explicit values into expression-generated
    * columns. BY DEFAULT identity generates on the NULL fill and passes
    * explicit values through. */
  private def rewriteAligned(w: V2WriteCommand, g: GraftTable): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Attribute, Expression, Literal, Multiply, MonotonicallyIncreasingID}
    val schema = g.schema()
    sealed trait Spec { def f: StructField }
    case class GenExpr(f: StructField, sql: String) extends Spec
    case class Ident(f: StructField, always: Boolean) extends Spec
    val specials: Map[String, Spec] = schema.fields.flatMap { f =>
      val key = f.name.toLowerCase(java.util.Locale.ROOT)
      GraftGenerated.generation(f) match {
        case Some(sql) => Some(key -> (GenExpr(f, sql): Spec))
        case None if f.metadata.contains("identity.start") =>
          Some(key -> (Ident(f,
            !f.metadata.getBoolean("identity.allowExplicitInsert")): Spec))
        case None => None
      }
    }.toMap
    if (specials.isEmpty) return w
    // SQL inline `VALUES` rows fold into a LocalRelation during
    // analysis, erasing GraftIdentityRule's markers on its DEFAULT
    // rewrites — but those statements were already enforced
    // pre-resolution (explicit values into ALWAYS positions are refused
    // there), so a LocalRelation-sourced write downgrades the refusal
    // to pass-through and keeps only the NULL-fill computation.
    def fromInline(p: LogicalPlan): Boolean = p match {
      case Project(_, c) => fromInline(c)
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
    val preValidated = fromInline(w.query)
    val incoming: Map[String, Expression] = (w.query match {
      case Project(list, _) =>
        list.map(e => e.name.toLowerCase(java.util.Locale.ROOT) -> (e: Expression))
      case q => q.output
        .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> (a: Expression))
    }).toMap
    def identityAlloc(f: StructField): NamedExpression = {
      val start = f.metadata.getLong("identity.start")
      val step = f.metadata.getLong("identity.step")
      val basis = new graft.core.TableStore(spark, g.warehouseDir)
        .identityBasis(g.storeTable, f.name, start, step)
      Alias(Cast(Add(Literal(basis + step),
        Multiply(Literal(step), MonotonicallyIncreasingID())), f.dataType),
        f.name)(explicitMetadata = Some(marker))
    }
    var changed = false
    val projected: Seq[NamedExpression] = w.query.output.map { attr: Attribute =>
      val key = attr.name.toLowerCase(java.util.Locale.ROOT)
      (specials.get(key), incoming.get(key)) match {
        case (None, _) | (Some(_), None) => attr
        // expression-generated: compute on the NULL fill AND on
        // GraftIdentityRule's DEFAULT-keyword placeholder (a typed NULL
        // marked with the identity rule's key); a value this rule
        // already computed passes through; anything else is explicit
        case (Some(GenExpr(f, sql)), Some(e)) =>
          if (hasMarker(e, GraftGenerated.MarkerKey)) attr
          // preValidated: inline VALUES fold DEFAULT placeholders into
          // LocalRelation data NULLs no expression check can see —
          // recompute unconditionally (explicit values were already
          // refused pre-resolution)
          else if (isNullFill(e) || hasMarker(e, "graft.identity.generated")
              || preValidated) {
            changed = true
            Alias(Cast(spark.sessionState.sqlParser.parseExpression(sql),
              f.dataType), f.name)(explicitMetadata = Some(marker))
          } else if (preValidated) attr
          else throw new IllegalArgumentException(
            "cannot write an explicit value into GENERATED ALWAYS AS (...) " +
              s"column ${f.name} of ${g.storeTable}; omit it — it is computed")
        // identity: values either rule already allocated pass through;
        // the NULL fill of an omitted column allocates; anything else
        // is explicit — refused for ALWAYS, legal for BY DEFAULT
        case (Some(Ident(f, always)), Some(e)) =>
          if (hasMarker(e, GraftGenerated.MarkerKey) ||
              hasMarker(e, "graft.identity.generated")) attr
          else if (isNullFill(e)) { changed = true; identityAlloc(f) }
          else if (preValidated) attr
          else if (always) throw new IllegalArgumentException(
            "cannot write an explicit value into GENERATED ALWAYS AS " +
              s"IDENTITY column ${f.name} of ${g.storeTable}; omit it")
          else attr
      }
    }
    if (!changed) w else w.withNewQuery(Project(projected, w.query))
  }
}
