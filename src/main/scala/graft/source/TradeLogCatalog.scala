package graft.source

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-table catalog for the tradelog — the resolution bridge SQL DML
  * needs: `DELETE FROM` / `MERGE INTO` only resolve against CATALOG
  * tables, so a session registers
  *
  *   spark.sql.catalog.tlog = graft.source.TradeLogCatalog
  *
  * and addresses any log directory as `` tlog.`/path/to/log` `` — the
  * Delta/Iceberg path-table idiom. `loadTable` serves the committed head
  * state (widened schema included) as the SAME [[TradeLogTable]] the
  * `spark.read.format` path builds, so every capability — batch/stream
  * read, writes, time travel options, and the row-level operations of
  * TradeLogRowLevel.scala — is identical through either door.
  *
  * This catalog is a RESOLVER, not a metastore: tables are directories,
  * existence is the committed manifest, and lifecycle verbs (create/
  * drop/rename) stay with the write path and the filesystem — attempts
  * route to UnsupportedOperationException rather than pretending a
  * registry exists. */
final class TradeLogCatalog extends TableCatalog {

  private var catalogName: String = "tradelog"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** The identifier's NAME is the log directory (namespace unused):
    * `` tlog.`/abs/path` ``. A directory with no committed manifest is
    * not a table yet — loading it is NoSuchTable, matching what a head
    * read would throw less legibly. */
  override def loadTable(ident: Identifier): Table = {
    val path = ident.name()
    val (fs, root) = TradeLogFormat.fs(path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root,
        TradeLogFormat.ManifestName)))
      throw new NoSuchTableException(ident)
    new TradeLogTable(path,
      TradeLogFormat.readManifestHeader(path).tableSchema,
      acceptAnySchema = false)
  }

  /** SQL time travel — `SELECT … FROM t VERSION AS OF n`: the version IS
    * the manifest generation, resolved through the same pin the
    * `atGeneration` read option uses (the table carries the resolved
    * generation straight to the scan), and the table serves the
    * snapshot's OWN schema (a pre-widening version hides later columns —
    * the Delta/Iceberg snapshot-schema rule). Versions above the
    * committed head are in-flight or abandoned commit CLAIMS and are
    * refused, same as every other "latest" resolution. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = ident.name()
    requireTable(ident) // NoSuchTable, not a raw FileNotFound (r17 review)
    val gen =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-tradelog VERSION AS OF takes a generation number, " +
            s"got '$version'")
      }
    val headGen = TradeLogFormat.readManifestHeader(path).gen
    require(gen <= headGen,
      s"graft-tradelog $path: generation $gen is not committed " +
        s"(head is $headGen — a gen-$gen snapshot above head would be an " +
        "in-flight or abandoned commit claim)")
    new TradeLogTable(path,
      TradeLogFormat.readManifestInfoAt(path, gen, headerOnly = true)
        .tableSchema,
      resolvedPin = Some(gen), acceptAnySchema = false)
  }

  /** `TIMESTAMP AS OF t` (DSv2 passes epoch MICROseconds): resolved to
    * the newest generation whose snapshot published at or before t —
    * commit time is the snapshot file's mtime, the Delta transaction-log
    * rule ([[TradeLogFormat.resolveWallClockGen]]). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = ident.name()
    requireTable(ident)
    val gen = TradeLogFormat.resolveWallClockGen(path,
      Math.floorDiv(timestamp, 1000L))
    new TradeLogTable(path,
      TradeLogFormat.readManifestInfoAt(path, gen, headerOnly = true)
        .tableSchema,
      resolvedPin = Some(gen), acceptAnySchema = false)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val (fs, root) = TradeLogFormat.fs(ident.name())
    fs.exists(new org.apache.hadoop.fs.Path(root,
      TradeLogFormat.ManifestName))
  }

  private def requireTable(ident: Identifier): Unit =
    if (!tableExists(ident)) throw new NoSuchTableException(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path tables have no enumerable namespace

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-tradelog path tables are created by writing to the path " +
        "(df.write.format(\"graft-tradelog\").save(dir)), not by DDL")

  /** `ALTER TABLE … ADD COLUMNS` — the catalog face of schema evolution
    * (VERDICT r17 #6): top-level, nullable, supported-type columns append
    * to the manifest's extra-column ledger in one header-only commit
    * ([[TradeLogFormat.addColumns]]); existing blocks null-fill on read.
    * Everything else about the schema is append-only by design, so any
    * other change (drop/rename/retype/reposition, nested fields, NOT
    * NULL) is refused with the reason rather than half-supported. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    requireTable(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft-tradelog ADD COLUMNS supports top-level columns only, " +
            s"got ${a.fieldNames.mkString(".")}")
        require(a.position() == null,
          "graft-tradelog schema evolution is append-only — FIRST/AFTER " +
            "positions are not supported")
        require(a.isNullable,
          "graft-tradelog added columns must be nullable (existing rows " +
            "null-fill)")
        org.apache.spark.sql.types.StructField(a.fieldNames()(0),
          a.dataType())
      case other => throw new UnsupportedOperationException(
        s"graft-tradelog schema evolution is append-only ADD COLUMNS; " +
          s"$other is not supported")
    }
    TradeLogFormat.addColumns(ident.name(), adds)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft-tradelog path tables are dropped by deleting the directory")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft-tradelog path tables rename with the directory")
}
