package graft.sources

import org.apache.spark.sql.SparkSession

/** S7 — full catalog scan (reference: client.py:131-146 walks
  * information_schema.tables then information_schema.columns;
  * server.py:135-138 lists the databases). The Spark analogue walks
  * `spark.catalog`: every database, its tables/views, and each table's
  * column name/type — plus session-scoped temp views (database = null in
  * the catalog listing), which is where the CLI's loaded table lives.
  */
object Catalog {

  /** Render the full catalog as the reference's tabular readout. */
  def readout(spark: SparkSession): String = {
    val sb = new StringBuilder
    sb ++= "Database Info\n"
    val dbs = spark.catalog.listDatabases().collect().map(_.name).sorted
    val tables = spark.catalog.listTables().collect() ++
      dbs.filter(_ != spark.catalog.currentDatabase)
        .flatMap(db => spark.catalog.listTables(db).collect())
    if (tables.isEmpty) sb ++= "  (no tables)\n"
    tables.sortBy(t => (Option(t.database).getOrElse(""), t.name)).foreach { t =>
      val qualified = Option(t.database).filter(_.nonEmpty)
        .map(db => s"$db.${t.name}").getOrElse(t.name)
      sb ++= s"  table: $qualified (${t.tableType.toLowerCase})\n"
      val cols =
        try spark.catalog.listColumns(qualified).collect()
        catch { case _: Exception => Array.empty[org.apache.spark.sql.catalog.Column] }
      cols.foreach(c => sb ++= s"    ${c.name}: ${c.dataType}\n")
    }
    sb.result()
  }
}
