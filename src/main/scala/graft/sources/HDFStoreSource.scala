package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.store.{HDFStore, StoreMode}
import graft.table.RowIds

/**
 * The "DataFrame HDF5 connector" surface (BASELINE.json north star):
 * `spark.read.format("hdfstore").option("table", name).load(path)` and
 * `df.write.format("hdfstore").option("table", name).save(path)`.
 *
 * Implemented on the stable `sources` API as a [[PrunedFilteredScan]]:
 * Catalyst hands us required columns and pushable filters, and the
 * relation translates `_rowid` comparisons into the store's positional
 * machinery — driver-side SEGMENT pruning first (the HDF5 chunk-B-tree
 * analog), then the residual predicate continues into the parquet scan.
 * Registered via META-INF/services, so `format("hdfstore")` works with no
 * imports — the connector API shape a jHDF-backed binary `.h5` reader can
 * later slot into (SURVEY §4.3).
 */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "hdfstore"

  private def params(parameters: Map[String, String]): (String, String) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("hdfstore: 'path' (store root) is required"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("hdfstore: 'table' option is required"))
    (path, table)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val (path, table) = params(parameters)
    HDFStoreRelation(sqlContext, path, table)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val (path, table) = params(parameters)
    val st = HDFStore.open(sqlContext.sparkSession, path, StoreMode.Infer)
    val exists = st.isTable(table)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"hdfstore table exists: $table")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists => st.table(table).append(data)
      case _ => st.put(table, data)
    }
    HDFStoreRelation(sqlContext, path, table)
  }
}

case class HDFStoreRelation(sqlContext: SQLContext, path: String, tableName: String)
    extends BaseRelation with PrunedFilteredScan {

  private def store = HDFStore.open(sqlContext.sparkSession, path, StoreMode.Read)

  override val schema: StructType = {
    val st = store
    try StructType(st.table(tableName).schema.fields :+
      StructField(RowIds.Col, LongType, nullable = false))
    finally st.close()
  }

  /** `_rowid` bound filters are consumed HERE (segment pruning + parquet
    * row-group stats); everything else is left for Spark to re-apply. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(isRowIdBound)

  private def isRowIdBound(f: Filter): Boolean = f match {
    case EqualTo(RowIds.Col, _) | GreaterThan(RowIds.Col, _) |
         GreaterThanOrEqual(RowIds.Col, _) | LessThan(RowIds.Col, _) |
         LessThanOrEqual(RowIds.Col, _) => true
    case And(l, r) => isRowIdBound(l) && isRowIdBound(r)
    case _ => false
  }

  /** Fold pushed `_rowid` filters into one [lo, hi] interval. */
  private def bounds(filters: Array[Filter]): (Long, Long) = {
    var lo = 0L
    var hi = Long.MaxValue
    def visit(f: Filter): Unit = f match {
      case EqualTo(RowIds.Col, v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan(RowIds.Col, v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(RowIds.Col, v: Long) => lo = math.max(lo, v)
      case LessThan(RowIds.Col, v: Long)           => hi = math.min(hi, v - 1)
      case LessThanOrEqual(RowIds.Col, v: Long)    => hi = math.min(hi, v)
      case And(l, r)                               => visit(l); visit(r)
      case _                                       => ()
    }
    filters.foreach(visit)
    (lo, hi)
  }

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val st = store
    val t = st.table(tableName)
    val (lo, hi) = bounds(filters.filter(isRowIdBound))
    val n = t.nrows
    val base =
      if (lo > hi || n == 0 || lo >= n) t.df.limit(0)
      else if (lo > 0 || hi < Long.MaxValue) t.slice(lo, math.min(hi, n - 1))
      else t.df
    val projected =
      if (requiredColumns.isEmpty) base
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}
