package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (builder-brief pillar). The reference has no
  * vector operators; this follows the same filter-and-refine shape as its
  * text pipeline (SURVEY §0): cheap bucket/quantized prune -> exact cosine
  * on survivors.
  *
  * Scale design (100 TB):
  *   - brute-force top-k broadcasts the (small) query set and streams the
  *     corpus — one shuffle for the per-query top-k window, carrying only
  *     (q_id, r_id, score).
  *   - the IVF path assigns every vector to a centroid bucket (narrow map),
  *     then searches only the probed buckets — an equi-join on bucket id,
  *     never an all-pairs product.
  *   - quantized (integer) scoring is used where a DuckDB oracle must
  *     reproduce results exactly; float kernels sum strictly
  *     left-to-right so results are deterministic under retries/AQE.
  */
object Similarity {

  /** Elementwise float->double view of an embedding column. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential (left-to-right) dot product of two double arrays —
    * deterministic across partitionings and engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm, sequential sum. */
  def l2Norm(v: Column): Column = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force exact cosine top-k: for every query vector the k nearest
    * corpus vectors. Queries are broadcast; ties break on ascending ref id.
    * Returns (q_id, r_id, cos_sim, rank).
    */
  def cosineTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    // norms are computed ONCE per vector, not per pair — cosine per pair is
    // then a single dot product + one divide (3x less per-pair arithmetic;
    // same doubles, so oracle parity is unchanged)
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_nrm", l2Norm(col("q_vec")))
    val c = corpus.select(col(idCol).as("r_id"), asDouble(col(vecCol)).as("r_vec"))
      .withColumn("r_nrm", l2Norm(col("r_vec")))
    val scored = c
      .crossJoin(broadcast(q))
      .where(col("q_id") =!= col("r_id"))
      .withColumn("cos_sim", dot(col("q_vec"), col("r_vec")) / (col("q_nrm") * col("r_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("r_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "r_id", "cos_sim", "rank")
  }

  /** Scalar-quantized embedding: floor(x * scale) per component, as longs.
    * Integer arithmetic makes downstream scores exactly reproducible by
    * any engine (the oracle), and is the standard memory/bandwidth
    * reduction for the first ANN pass.
    */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => floor(x.cast("double") * scale).cast("long"))

  /** Integer dot product of two quantized vectors (exact). */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** IVF-style coarse assignment: top-`nprobe` centroids by quantized dot
    * product (ties -> lowest centroid id). `centroids` is small and
    * broadcast. Returns (id, centroid_id, score) with `nprobe` rows per id.
    * At scale this bucket id becomes the partition/join key for probing.
    */
  def centroidRanks(
      vectors: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      nprobe: Int,
      scale: Int = 1000
  ): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), quantize(col(vecCol), scale).as("qv"))
    val c = centroids.select(col(idCol).as("centroid_id"), quantize(col(vecCol), scale).as("cv"))
    val scored = v
      .crossJoin(broadcast(c))
      .withColumn("score", dotQ(col("qv"), col("cv")))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("centroid_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= nprobe)
      .select("id", "centroid_id", "score")
  }

  /** Single-bucket assignment (nprobe = 1). */
  def assignToCentroids(
      vectors: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      scale: Int = 1000
  ): DataFrame = centroidRanks(vectors, centroids, idCol, vecCol, nprobe = 1, scale)

  /** IVF probe-and-refine ANN search: corpus vectors live in their nearest
    * centroid's bucket; each query probes its `nprobe` nearest buckets and
    * refines with EXACT cosine over only those buckets' members.
    * Approximate by construction (recall < 1 when a true neighbor lives in
    * an unprobed bucket) but fully deterministic: the coarse phase is
    * integer math, refine tie-breaks on ref id. Returns
    * (q_id, r_id, cos_sim, rank).
    *
    * Scale shape: bucket membership is an equi-join key — the corpus
    * shuffles ONCE by bucket; per-query work is bounded by probed-bucket
    * sizes, never the whole corpus.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      scale: Int = 1000
  ): DataFrame = {
    val buckets = assignToCentroids(corpus, centroids, idCol, vecCol, scale)
      .select(col("id").as("r_id"), col("centroid_id"))
    val probes = centroidRanks(queries, centroids, idCol, vecCol, nprobe, scale)
      .select(col("id").as("q_id"), col("centroid_id"))
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_nrm", l2Norm(col("q_vec")))
    val c = corpus.select(col(idCol).as("r_id"), asDouble(col(vecCol)).as("r_vec"))
      .withColumn("r_nrm", l2Norm(col("r_vec")))
    val cands = probes
      .join(buckets, Seq("centroid_id"))
      .where(col("q_id") =!= col("r_id"))
      .select("q_id", "r_id")
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("r_id").asc)
    cands
      .join(broadcast(q), Seq("q_id"))
      .join(c, Seq("r_id"))
      .withColumn("cos_sim", dot(col("q_vec"), col("r_vec")) / (col("q_nrm") * col("r_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "r_id", "cos_sim", "rank")
  }
}
