package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations at 100 TB: hot keys are salted
  * so one key's rows spread over `saltFactor` reducers instead of convoying on
  * a single task. AQE's skew-join handles sort-merge spills adaptively; this
  * is the explicit form for when the skew is known ahead of time (e.g. the
  * reference's NULL-heavy partner_id columns) or for aggregations AQE can't
  * split.
  *
  * Deterministic: the salt is `pmod(xxhash64(spark_partition_id, entire
  * row), saltFactor)` — no rand(), so plans stay reproducible and
  * retry-safe (a re-executed task reads the same source partition and salts
  * identically). The partition id is mixed in because BYTE-IDENTICAL hot
  * rows (sentinel/default rows — the usual skew culprits) would otherwise
  * all hash to one salt and still convoy; with it, identical rows spread
  * across reducers as long as they arrive from multiple source partitions.
  */
object Skew {

  /** Join types under which big-side salting is sound: the replicated small
    * side must never be allowed to emit its own unmatched rows (each of the
    * saltFactor replicas would null-extend separately → spurious rows). */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  private def salt(df: DataFrame, saltFactor: Int) =
    df.withColumn("__salt",
      pmod(xxhash64(spark_partition_id() +: df.columns.map(col): _*),
        lit(saltFactor)))

  /** Equi-join `big ⋈ small` on `keys` with the big side salted: big rows get
    * a deterministic salt in [0, saltFactor); the small side is replicated
    * saltFactor× (explode of a literal range) so every (key, salt) pair
    * finds its match. Result is row-identical to the unsalted join.
    *
    * Only big-side-preserving join types are accepted — under right/full
    * outer the replicated small side would emit one null-extended row PER
    * REPLICA for unmatched keys (saltFactor spurious rows each), silently
    * breaking the row-identical contract.
    *
    * Cost model: small side grows saltFactor× (it must be the SMALL side);
    * the big side's hot keys split across saltFactor reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(SafeJoinTypes(joinType.toLowerCase),
      s"saltedJoin supports ${SafeJoinTypes.toSeq.sorted.mkString("/")} — " +
        s"'$joinType' would emit spurious null-extended rows from the " +
        "replicated small side")
    val saltedBig = salt(big, saltFactor)
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: count/sum-like aggs over a skewed key
    * group first on (key, salt), then re-aggregate on key. The first shuffle
    * spreads the hot key; the second moves only saltFactor partial rows per
    * key. Caller supplies partial and final agg column lists with matching
    * names (e.g. partial `sum(x) as s` → final `sum(s) as s`). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partial: Seq[org.apache.spark.sql.Column],
                fin: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    salt(df, saltFactor)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }
}
