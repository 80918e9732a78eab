package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for scale: salting for skewed keys and explicit
  * broadcast, complementing AQE's runtime skew splitting.
  *
  * AQE's skew-join handles post-shuffle partition imbalance, but it can
  * only split what is already shuffled — a single pathological key whose
  * rows exceed one executor's memory still needs SALTING: the fact side
  * spreads each key over `saltFactor` sub-keys, the dimension side is
  * replicated `saltFactor`× (explode over the salt range), and the join
  * key becomes (key, salt). Replication cost is |dim| × saltFactor, which
  * is the standard trade for unbounded hot keys.
  */
object Joins {

  /** Equi-join `fact ⋈ dim` on `key`, salted to defuse hot keys.
    * Output columns = fact.* ++ dim.* (minus the duplicate key). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic spread: hash the whole fact row across the salt range
    // (rand() would break retry/replay semantics of a failed task)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Broadcast-dimension equi-join, stated explicitly (Catalyst's
    * threshold heuristic can miss when size stats are stale). */
  def broadcastJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), Seq(key), joinType)

  /** Top-frequency keys of a column — the census used to decide whether a
    * join needs salting (run on a sample at scale). */
  def keyFrequency(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(topN)

  /** Persist a table bucketed (and sorted) by the join key: two tables
    * bucketed the same way join with NO exchange on either side — the
    * co-location is decided at write time, which is how a 100 TB fact
    * table avoids re-shuffling on every join. Registers in the session
    * catalog (a metastore carries the bucket spec in production). */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
}
