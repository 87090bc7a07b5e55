package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: partitioned dataset
  * writes (so downstream scans prune), and key salting (so skewed join/agg
  * keys spread across reducers).
  */
object Layout {

  /** Write as a hive-partitioned parquet dataset. Scans filtered on
    * `partitionCols` then prune directories (visible as PartitionFilters in
    * the plan) — the layout decision that turns a 100 TB scan into a
    * per-partition one. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Save as a bucketed+sorted catalog table: both sides of a recurring
    * equi-join bucketed the same way join with NO exchange and NO sort —
    * the pre-shuffle that pays for itself after one reuse at 100 TB.
    * (Bucketing requires the session catalog, hence saveAsTable.)
    * MANAGED tables only: `table` must not name an EXTERNAL table — the
    * leftover-location cleanup below targets the catalog's managed
    * default path, and the drop+delete+write sequence is not atomic
    * across concurrent writers (one writer per table name at a time). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    // idempotent across JVMs: a fresh session's in-memory catalog has no
    // entry for `table`, but the managed location may survive from an
    // earlier run — CREATE then fails LOCATION_ALREADY_EXISTS even under
    // overwrite mode. If the dropped table carried metadata (same-JVM
    // re-run), clean ITS location; otherwise fall back to the managed
    // default path, and only when something actually sits there — never
    // blind-delete a path that may belong to an EXTERNAL table's data.
    val s = df.sparkSession
    val catalog = s.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (catalog.tableExists(ident))
      require(catalog.getTableMetadata(ident).tableType !=
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
        s"writeBucketed refuses to replace EXTERNAL table $table: dropping " +
          "it would orphan its data while the managed-path cleanup below " +
          "deleted unrelated files — rename, or drop the external table first")
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Salt a skewed key: `saltBuckets` pseudo-random buckets derived from
    * stable row content (deterministic — pmod of a hash, no rand()). The
    * heavy key's rows spread over `saltBuckets` reducers. */
  def salted(key: Column, saltFrom: Column, saltBuckets: Int): Column =
    struct(key.as("k"), pmod(hash(saltFrom), lit(saltBuckets)).as("s"))

  /** Z-order (Morton) key: interleave the low `bits` bits of two integer
    * dimensions so rows close in BOTH dimensions sort close in ONE key —
    * the multi-dimensional clustering layout (Delta/Iceberg OPTIMIZE
    * ZORDER) that lets per-file min/max stats skip data for predicates on
    * either dimension, where a plain sort only serves its leading column.
    * Pure exact integer bit arithmetic (shifts + AND), identical in any
    * engine; write-side usage is `df.repartitionByRange(sortCol =
    * zorderKey(...)).sortWithinPartitions(...)` ahead of
    * [[writePartitioned]]. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Skew-safe equi-join of a skewed fact against a small dim: the dim is
    * replicated `saltBuckets` times (explode) so every salted fact bucket
    * finds its row; the join key becomes (key, salt). Correctness never
    * depends on the salt's value (the dim carries all salts); it only
    * spreads the heavy key over `saltBuckets` reducers. The salt is a
    * DETERMINISTIC content hash of the fact row (`saltFrom` columns, or
    * every fact column when empty) — no rand(), no
    * monotonically_increasing_id — so retries and re-runs replay the same
    * partitioning. Caveat: byte-identical duplicate fact rows share a salt;
    * pass a distinguishing `saltFrom` (e.g. a row id) when duplicates of
    * one heavy key dominate. Use when one fact key dominates and AQE's
    * skew split isn't available (e.g. stream-static joins). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltBuckets: Int, saltFrom: Seq[String] = Nil
  ): DataFrame = {
    val saltCols = (if (saltFrom.nonEmpty) saltFrom else fact.columns.toSeq).map(col)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
