package graft.sources

import graft.grid.{GridStore, ZarrGridStore}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.concurrent.ConcurrentHashMap

/** Standard-Spark entry point for Zarr trees:
  *
  * {{{
  * spark.read.format("zarr").load("/data/era5.zarr")          // v2 or v3
  * spark.read.format("zarr").option("dims", "time,lat,lon")
  *   .load(root)                                              // pick a dim group
  * }}}
  *
  * No [[graft.XarrayContext]] needed — the provider opens the tree
  * (version auto-detected, consolidated metadata preferred), partitions
  * by the store's own chunk grid, and serves the same pruning /
  * projection / metadata-aggregate scan as the registered path
  * ([[GridTable]]). By default the table exposes the dimension group of
  * the first (name-sorted) data variable; `dims` selects another group
  * on multi-group datasets. The reference's analog is its SQL-context
  * dataset registration (xarray_sql/sql.py:105-125) — this surface cuts
  * the context out entirely for read-side use.
  */
class ZarrTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (store, _, groupDims) = ZarrTableProvider.resolve(options)
    store.schema.tableSchema(groupDims,
      store.schema.vars.filter(_.dims == groupDims))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (store, chunks, groupDims) = ZarrTableProvider.resolve(options)
    new GridTable(s"zarr:${options.get("path")}", store, chunks, groupDims)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object ZarrTableProvider {
  // DSv2 calls inferSchema and getTable with the same options in one
  // load(); cache the opened store per root so the tree's metadata is
  // fetched once, not once per callback. Entries are metadata-sized;
  // re-load() of a mutated tree should call invalidate(root).
  private val cache = new ConcurrentHashMap[String, ZarrGridStore]()

  def invalidate(root: String): Unit = {
    cache.remove(root.stripSuffix("/"))
    ()
  }

  private[sources] def resolve(options: CaseInsensitiveStringMap)
      : (GridStore, Map[String, Int], Seq[String]) = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "zarr: no path given (use spark.read.format(\"zarr\").load(<root>))"))
    val root = path.stripSuffix("/")
    val store = cache.computeIfAbsent(root, ZarrGridStore.open(_))
    val groupDims = Option(options.get("dims")) match {
      case Some(ds) =>
        val dims = ds.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        dims.foreach(d => require(
          store.schema.dims.exists(_.name == d),
          s"zarr: unknown dim '$d' (tree has " +
            s"${store.schema.dimNames.mkString(", ")})"))
        require(store.schema.vars.exists(_.dims == dims),
          s"zarr: no variable has exactly dims (${dims.mkString(", ")})")
        dims
      case None =>
        store.schema.vars.headOption.map(_.dims).getOrElse(
          throw new IllegalArgumentException(
            s"zarr: no data variables under $root"))
    }
    (store, store.chunkMap, groupDims)
  }
}
