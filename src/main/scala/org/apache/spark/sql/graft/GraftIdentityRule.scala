package org.apache.spark.sql.graft

import graft.catalog.GraftCatalog
import graft.core.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedInlineTable, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Cast, Expression, Literal, MonotonicallyIncreasingID, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, Metadata, MetadataBuilder, StructField, StructType}

/** Identity columns (`GENERATED ALWAYS / BY DEFAULT AS IDENTITY`) for
  * Graft tables — the value-generation half Spark leaves to the
  * connector (the parser + `SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS`
  * only carry the DDL; Delta implements generation the same way).
  *
  * Runs in the HINTS batch on the still-unresolved `InsertIntoStatement`,
  * BEFORE the built-in output resolution would fill the omitted column
  * with NULL and erase the only evidence the user omitted it:
  *
  *  - by-name INSERT omitting the column → the column list and query are
  *    extended with generated values
  *  - positional `VALUES` with the DEFAULT keyword at the identity
  *    ordinal → DEFAULT becomes a generated value
  *  - any user-supplied value into a GENERATED ALWAYS column → refused
  *    (BY DEFAULT / `allowExplicitInsert` passes through untouched)
  *
  * Allocation is Delta-style sparse blocks: `basis + step × (1 +
  * monotonically_increasing_id())` — unique within the write with no
  * cross-task coordination (the 33-bit per-partition blocks mean gaps,
  * which identity semantics allow), and monotone ACROSS writes because
  * the basis is the committed extreme of the column read from file
  * stats ([[TableStore.identityBasis]], metadata-only). Inline VALUES
  * rows get dense consecutive values instead (their expressions must be
  * foldable, and the row count is known at analysis). Concurrent
  * writers to the SAME identity table can allocate overlapping blocks —
  * the usual single-writer caveat engines without a central sequence
  * share. */
class GraftIdentityRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val MarkerKey = "graft.identity.generated"

  /** The graft warehouse the identifier resolves against — through the
    * leading catalog name when present, else the session's CURRENT
    * catalog (after `USE <graft-catalog>` an unqualified or ns.table
    * identifier must still hit the identity/generated guards; resolving
    * only catalog-qualified names silently dropped them all). */
  private def graftWarehouse(parts: Seq[String]): Option[String] = {
    val cm = spark.sessionState.catalogManager
    val cat =
      if (parts.size >= 2 && cm.isCatalogRegistered(parts.head))
        cm.catalog(parts.head)
      else cm.currentCatalog
    cat match {
      case g: GraftCatalog => Some(g.warehouseDir)
      case _ => None
    }
  }

  private def identityFields(schema: StructType): Seq[(StructField, Int)] =
    schema.fields.zipWithIndex.toSeq.filter(_._1.metadata.contains("identity.start"))

  private def allowExplicit(f: StructField): Boolean =
    f.metadata.getBoolean("identity.allowExplicitInsert")

  /** One write's allocation basis, resolved against the CURRENT snapshot
    * at analysis time. */
  private def basisOf(wh: String, table: String, f: StructField): (Long, Long) = {
    val start = f.metadata.getLong("identity.start")
    val step = f.metadata.getLong("identity.step")
    (new TableStore(spark, wh).identityBasis(table, f.name, start, step), step)
  }

  private def markerMeta(f: StructField): Metadata =
    new MetadataBuilder().putBoolean(MarkerKey, value = true).build()

  private def genExpr(basis: Long, step: Long, dt: DataType): Expression =
    Cast(Add(Literal(basis + step),
      Multiply(Literal(step), MonotonicallyIncreasingID())), dt)

  private def isDefaultKeyword(e: Expression): Boolean = e match {
    case a: UnresolvedAttribute =>
      a.nameParts.length == 1 && a.nameParts.head.equalsIgnoreCase("default")
    case _ => false
  }

  /** Already rewritten by a previous pass of this rule? */
  private def tagged(q: LogicalPlan): Boolean = q match {
    case Project(exprs, _) => exprs.exists {
      case a: Alias => a.metadata.contains(MarkerKey)
      case _ => false
    }
    case t: UnresolvedInlineTable => t.rows.exists(_.exists {
      case a: Alias => a.metadata.contains(MarkerKey)
      case _ => false
    })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i @ InsertIntoStatement(u: UnresolvedRelation, _, userCols, query,
        _, _, byName) if !tagged(query) =>
      graftWarehouse(u.multipartIdentifier) match {
        case None => i
        case Some(wh) =>
          val table = u.multipartIdentifier.last
          val store = new TableStore(spark, wh)
          if (!store.exists(table)) i
          else {
            val schema = DataType.fromJson(
              store.manifests(table).maxBy(_.version).schemaJson)
              .asInstanceOf[StructType]
            val ids = identityFields(schema)
            val gens = schema.fields.zipWithIndex.toSeq
              .filter(fi => GraftGenerated.generation(fi._1).isDefined)
            if (ids.isEmpty && gens.isEmpty) i
            else if (userCols.nonEmpty) rewriteByList(i, wh, table, ids, gens)
            else if (!byName)
              rewritePositional(i, wh, table, schema, ids, gens)
            else i // INSERT BY NAME: names unknown until resolution; the
                   // resolved plan fills NULL like any nullable column
                   // (GraftGeneratedRule then computes generated ones)
          }
      }
  }

  /** INSERT with an explicit column list: omitted identity columns are
    * appended with generated values; listed GENERATED ALWAYS columns
    * (identity or expression-generated) are refused. */
  private def rewriteByList(i: InsertIntoStatement, wh: String, table: String,
      ids: Seq[(StructField, Int)],
      gens: Seq[(StructField, Int)]): LogicalPlan = {
    gens.collectFirst { case (f, _)
        if i.userSpecifiedCols.exists(_.equalsIgnoreCase(f.name)) => f
    }.foreach { f =>
      throw new IllegalArgumentException(
        s"cannot INSERT into GENERATED ALWAYS AS (...) column ${f.name} " +
          s"of $table; omit it from the column list — it is computed")
    }
    val listed = ids.filter { case (f, _) =>
      i.userSpecifiedCols.exists(_.equalsIgnoreCase(f.name)) }
    listed.collectFirst { case (f, _) if !allowExplicit(f) => f }.foreach { f =>
      throw new IllegalArgumentException(
        s"cannot INSERT into GENERATED ALWAYS AS IDENTITY column ${f.name} " +
          s"of $table; omit it from the column list")
    }
    val missing = ids.filterNot { case (f, _) =>
      i.userSpecifiedCols.exists(_.equalsIgnoreCase(f.name)) }
    if (missing.isEmpty) i
    else {
      val gens = missing.map { case (f, _) =>
        val (basis, step) = basisOf(wh, table, f)
        Alias(genExpr(basis, step, f.dataType), f.name)(
          explicitMetadata = Some(markerMeta(f)))
      }
      i.copy(
        userSpecifiedCols = i.userSpecifiedCols ++ missing.map(_._1.name),
        query = Project(UnresolvedStar(None) +: gens, i.query))
    }
  }

  /** Positional INSERT (full arity): the DEFAULT keyword at an identity
    * ordinal of an inline VALUES generates (densely — inline rows must
    * stay foldable); any other expression into GENERATED ALWAYS is
    * refused. Non-inline positional queries can't mark DEFAULT, so
    * GENERATED ALWAYS refuses them outright. */
  private def rewritePositional(i: InsertIntoStatement, wh: String,
      table: String, schema: StructType,
      ids: Seq[(StructField, Int)],
      gens: Seq[(StructField, Int)]): LogicalPlan = i.query match {
    case t: UnresolvedInlineTable if t.rows.nonEmpty &&
        t.rows.head.length == schema.length =>
      var changed = false
      var rows = t.rows
      // expression-generated columns: DEFAULT becomes a typed NULL
      // placeholder (GraftGeneratedRule recomputes the position on the
      // aligned write anyway); anything else is an explicit value — refused
      gens.foreach { case (f, ord) =>
        if (rows.forall(r => isDefaultKeyword(r(ord)))) {
          // the Alias marker keeps the fixpoint idempotent (tagged());
          // GraftGeneratedRule recomputes the position either way
          rows = rows.map(r => r.updated(ord,
            Alias(Cast(Literal(null), f.dataType), f.name)(
              explicitMetadata = Some(markerMeta(f))): Expression))
          changed = true
        } else {
          throw new IllegalArgumentException(
            s"cannot INSERT into GENERATED ALWAYS AS (...) column " +
              s"${f.name} of $table; write DEFAULT in its position or use " +
              "a column list that omits it — it is computed")
        }
      }
      ids.foreach { case (f, ord) =>
        val allDefault = rows.forall(r => isDefaultKeyword(r(ord)))
        val anyDefault = rows.exists(r => isDefaultKeyword(r(ord)))
        if (allDefault) {
          val (basis, step) = basisOf(wh, table, f)
          rows = rows.zipWithIndex.map { case (r, k) =>
            r.updated(ord, Alias(
              Cast(Literal(basis + step * (k + 1L)), f.dataType), f.name)(
              explicitMetadata = Some(markerMeta(f))))
          }
          changed = true
        } else if (!allowExplicit(f) && !anyDefault) {
          throw new IllegalArgumentException(
            s"cannot INSERT into GENERATED ALWAYS AS IDENTITY column " +
              s"${f.name} of $table; write DEFAULT in its position or use " +
              "a column list that omits it")
        } else if (!allowExplicit(f)) {
          throw new IllegalArgumentException(
            s"GENERATED ALWAYS AS IDENTITY column ${f.name} of $table: " +
              "mixing DEFAULT and explicit values is not supported")
        }
      }
      if (changed) i.copy(query = t.copy(rows = rows)) else i
    case _ =>
      ids.collectFirst { case (f, _) if !allowExplicit(f) => f }.foreach { f =>
        throw new IllegalArgumentException(
          s"cannot INSERT positionally into $table: column ${f.name} is " +
            "GENERATED ALWAYS AS IDENTITY; use an insert column list that " +
            "omits it")
      }
      gens.headOption.foreach { case (f, _) =>
        throw new IllegalArgumentException(
          s"cannot INSERT positionally into $table: column ${f.name} is " +
            "GENERATED ALWAYS AS (...); use an insert column list that " +
            "omits it")
      }
      i
  }
}
