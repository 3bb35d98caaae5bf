package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-persisted SQL views: each view is one JSON file under
  * `<warehouse>/_views/` holding its SQL text. Metadata-only — a view
  * costs nothing until queried, and querying expands the stored SQL over
  * the LIVE tables (always-current, like any SQL view).
  *
  * Surface: `CALL <cat>.system.create_view(name, sql)` persists the view
  * AND registers it as a session temp view immediately (so plain
  * `SELECT * FROM <name>` works); `CALL sync_views()` hydrates every
  * persisted view into a fresh session; `CALL drop_view(name)` removes
  * both. (Upstream Spark 4.1 has no analyzer wiring for DSv2
  * `ViewCatalog` DDL — Iceberg routes CREATE VIEW through its OWN
  * session extensions, which a plain session lacks — so the procedure
  * face is the portable one; the storage format is extension-agnostic
  * and an Iceberg-style `ResolveViews` rule could serve it unchanged.) */
object GraftViews {

  private val mapper = new ObjectMapper()

  private def dir(warehouse: String) = new Path(warehouse, "_views")
  private def path(warehouse: String, name: String) =
    new Path(dir(warehouse), s"$name.json")
  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def exists(spark: SparkSession, warehouse: String, name: String): Boolean = {
    val p = path(warehouse, name)
    fs(spark, p).exists(p)
  }

  /** Persist (create-exclusive unless `replace`) and return the name. */
  def create(spark: SparkSession, warehouse: String, name: String,
      sql: String, replace: Boolean = false): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"illegal view name $name")
    val p = path(warehouse, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val json = s"""{"name":${jsonStr(name)},"sql":${jsonStr(sql)}}"""
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    if (replace && f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"view $name already exists")
  }

  def sqlOf(spark: SparkSession, warehouse: String,
      name: String): Option[String] = {
    val p = path(warehouse, name)
    val f = fs(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    Some(mapper.readTree(txt).get("sql").asText())
  }

  /** Expand the view over the live tables. */
  def query(spark: SparkSession, warehouse: String, name: String): DataFrame =
    spark.sql(sqlOf(spark, warehouse, name).getOrElse(
      throw new IllegalArgumentException(s"no view $name")))

  /** Register one persisted view as a session temp view. SQL-defined
    * temp views store the UNANALYZED plan, so every query re-resolves
    * the underlying tables — the view stays current across appends
    * (a DataFrame-registered view would pin the snapshot it captured). */
  def register(spark: SparkSession, warehouse: String, name: String): Unit = {
    val sql = sqlOf(spark, warehouse, name).getOrElse(
      throw new IllegalArgumentException(s"no view $name"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `$name` AS $sql")
    ()
  }

  /** Hydrate every persisted view into the session. Returns the names. */
  def registerAll(spark: SparkSession, warehouse: String): Seq[String] = {
    val names = list(spark, warehouse)
    names.foreach(register(spark, warehouse, _))
    names
  }

  def drop(spark: SparkSession, warehouse: String, name: String): Boolean = {
    val p = path(warehouse, name)
    val f = fs(spark, p)
    val existed = f.exists(p) && f.delete(p, false)
    try spark.catalog.dropTempView(name) catch { case _: Exception => }
    existed
  }

  def list(spark: SparkSession, warehouse: String): Seq[String] = {
    val d = dir(warehouse)
    val f = fs(spark, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case nm if nm.endsWith(".json") => nm.stripSuffix(".json") }
      .toSeq.sorted
  }
}
