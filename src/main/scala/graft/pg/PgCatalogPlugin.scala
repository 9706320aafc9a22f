package graft.pg

import java.util

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real `pg_catalog` namespace as a DataSource-V2 TableCatalog
  * (reference A33: catalog/src/postgres/mod.rs:25-52 registers the
  * catalog tables under a dedicated schema provider — this is the Spark
  * analogue, so `SELECT ... FROM pg_catalog.pg_type` resolves through
  * the catalog machinery rather than a parser rewrite; the bare-name
  * temp views remain for unqualified references).
  *
  * Wire-up: `spark.sql.catalog.pg_catalog = graft.pg.PgCatalogPlugin`
  * (set by [[PgCompat.registerAll]]); the CatalogManager instantiates
  * it on first reference. Tables are read-only static batches.
  */
final class PgCatalogPlugin extends TableCatalog {

  private var catalogName = "pg_catalog"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private lazy val tables: Map[String, Table] = {
    val static = PgCompat.tableDefs.map { case (n, schema, rows) =>
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      val internal = rows.map(r => conv(r).asInstanceOf[InternalRow].copy()).toArray
      n -> (new StaticTable(n, schema, internal): Table)
    }
    // pg_class / pg_attribute snapshot the LIVE session catalog at scan
    // planning (LiveCatalog) — they shadow the static empty pg_class
    val live = PgCompat.liveTableDefs.map { case (n, schema, fn) =>
      n -> (new DynamicTable(n, schema, fn): Table)
    }
    (static ++ live).toMap
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keysIterator.map(n => Identifier.of(Array.empty[String], n)).toArray

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(ident.name.toLowerCase,
      throw new NoSuchTableException(Seq(catalogName, ident.name)))

  override def tableExists(ident: Identifier): Boolean =
    tables.contains(ident.name.toLowerCase)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("pg_catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("pg_catalog is read-only")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("pg_catalog is read-only")
}

/** Read-only in-memory table serving a fixed row set. */
private[pg] final class StaticTable(
    tableName: String, tableSchema: StructType, rows: Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StaticScan(tableName, tableSchema, rows)
}

private final class StaticScan(
    tableName: String, tableSchema: StructType, rows: Array[InternalRow])
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = tableSchema
  override def description(): String = s"pg_catalog.$tableName"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(StaticPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    StaticReaderFactory
}

private final case class StaticPartition(rows: Array[InternalRow])
    extends InputPartition

private object StaticReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[StaticPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
}
