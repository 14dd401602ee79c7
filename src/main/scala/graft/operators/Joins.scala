package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed data at scale.
  *
  * AQE's skew-join splitting (enabled in GraftSession/Bench) handles
  * runtime-detected skew; `saltedJoin` is the planned-skew tool for keys
  * KNOWN to be hot (null-heavy foreign keys, default values, celebrity
  * entities) where pre-spreading beats detect-and-split.
  */
object Joins {

  /** Salted equi-join: the large (skewed) side derives a deterministic
    * salt in [0, buckets) from `saltSourceCol` (any well-distributed
    * column — a row id works); the small side is replicated to every
    * bucket. The join key becomes (key, salt), spreading each hot key
    * over `buckets` reducers. Deterministic under retries (no rand()).
    *
    * Cost model: small side grows x buckets (keep it broadcastable);
    * large side gets one extra narrow projection. Use only for the
    * skewed key columns — normal keys pay the replication for nothing.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltSourceCol: String,
      buckets: Int
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = large.withColumn("__salt", pmod(hash(col(saltSourceCol)), lit(buckets)))
    val replicated = small.withColumn(
      "__salt",
      explode(array((0 until buckets).map(lit): _*))
    )
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Banded backward range join: pairs each left row with every right row
    * whose `rightTs` lies in [leftTs - window, leftTs], same key.
    *
    * Scale path: Spark plans a raw inequality join as a nested loop; here
    * both sides bucket by floor(ts / window) (integer div — exact on long
    * timestamps), the left row probes buckets {b-1, b} (which fully cover
    * a window-length look-back), and the exact range predicate refines
    * after an EQUI-join on (key, bucket). One hash shuffle per side; per-
    * row work bounded by bucket occupancy, never the whole partner table.
    *
    * `leftTs` and `rightTs` must be distinct column names; other column
    * names must not clash.
    */
  def rangeJoinBackWindow(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      window: Long
  ): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(leftTs != rightTs, "leftTs and rightTs must be distinct column names")
    val l = left
      .withColumn("__b", expr(s"$leftTs div $window"))
      .withColumn("__probe", explode(array(col("__b") - 1, col("__b"))))
      .drop("__b")
    val r = right.withColumn("__probe", expr(s"$rightTs div $window"))
    l.join(r, Seq(key, "__probe"))
      .where(col(rightTs) >= col(leftTs) - window && col(rightTs) <= col(leftTs))
      .drop("__probe")
  }

  /** Banded FORWARD range join: pairs each left row with every right row
    * whose `rightPos` lies in the half-open window [leftPos, leftPos +
    * window), same (multi-column) key.
    *
    * Same banding as rangeJoinBackWindow, mirrored: a forward window of
    * length `window` starting at bucket b = leftPos div window is fully
    * covered by buckets {b, b+1}, so the left row probes those two and
    * the exact predicate refines after the equi-join. Pairs per left row
    * are bounded by occupancy of two buckets (<= 2*window partner rows
    * when positions are distinct) — never the full per-key occurrence
    * list, which is what makes a dense long document (n_occ^2 blowup)
    * survivable.
    */
  def rangeJoinForwardWindow(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftPos: String,
      rightPos: String,
      window: Long
  ): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(leftPos != rightPos, "leftPos and rightPos must be distinct column names")
    val l = left
      .withColumn("__b", expr(s"$leftPos div $window"))
      .withColumn("__probe", explode(array(col("__b"), col("__b") + 1)))
      .drop("__b")
    val r = right.withColumn("__probe", expr(s"$rightPos div $window"))
    l.join(r, keys :+ "__probe")
      .where(col(rightPos) >= col(leftPos) && col(rightPos) < col(leftPos) + window)
      .drop("__probe")
  }
}
