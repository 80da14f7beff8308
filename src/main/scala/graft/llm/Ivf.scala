package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** IVF (inverted-file) approximate nearest-neighbor search (SURVEY B44
  * scale path #2, alongside the sign-LSH variant).
  *
  * Coarse quantizer: a deterministic centroid subset (every 25th vector —
  * at 100 TB this would be a k-means sample, but the index structure and
  * query plan are identical). Each corpus vector is assigned to its nearest
  * centroid (one broadcast-join pass); a query probes only the `nProbe`
  * nearest cells, then scores exact cosine inside them.
  *
  * Scale posture: the index build is one map-side pass over the corpus
  * (centroids broadcast); search cost drops from O(n) per probe to
  * O(n · nProbe / nCells), and the cells are a partitioning key — a 100 TB
  * corpus stores cell-partitioned parquet so a probe reads only its cells'
  * files (partition pruning on disk, not just in memory).
  */
object Ivf {

  /** Native codegen dot product (see [[graft.functions.DotProductExpression]]);
    * registered by GraftExtensions or per-entry. */
  private def dot(a: String, b: String) = expr(s"dot_f64($a, $b)")

  private def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm", sqrt(dot("v", "v")))

  /** Deterministic coarse quantizer cells. */
  def centroids(embeddings: DataFrame): DataFrame =
    asDouble(embeddings.filter(col("vec_id") % 25 === 0))
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))

  /** Index: nearest-centroid assignment per corpus vector (broadcast join +
    * per-vector argmax window). */
  def assignments(embeddings: DataFrame): DataFrame = {
    val cents = centroids(embeddings)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))
    asDouble(embeddings)
      .join(broadcast(cents))
      .withColumn("sim", dot("v", "cv") / (col("norm") * col("cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("v"), col("norm"))
  }

  /** Top-k cosine search probing only the nProbe nearest cells per query. */
  def search(embeddings: DataFrame, probeFilter: org.apache.spark.sql.Column,
      k: Int, nProbe: Int): DataFrame = {
    val assigned = assignments(embeddings)
    val cents = centroids(embeddings)
    val probes = asDouble(embeddings.filter(probeFilter))
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("norm").as("pnorm"))
    val wCell = Window.partitionBy(col("probe_id")).orderBy(col("csim").desc, col("cell"))
    val probeCells = probes.join(broadcast(cents))
      .withColumn("csim", dot("pv", "cv") / (col("pnorm") * col("cnorm")))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("pnorm"), col("cell"))
    val wTop = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    probeCells
      .join(assigned, "cell") // only the probed cells' vectors are scored
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", dot("pv", "v") / (col("pnorm") * col("norm")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rn"))
  }

  /** B44 scale path #2 — IVF top-10 for the same probe set as the
    * brute-force query (approximate: recall measured in IvfSpec). */
  private val b44ivf = entryNoOracle("b44_similarity_ivf") { (s, d) =>
    graft.functions.DotProductExpression.register(s)
    search(Tables.embeddings(s, d), col("vec_id") < 20, k = 10, nProbe = 5)
      .orderBy("probe_id", "rn")
  }

  val entries: Seq[Entry] = Seq(b44ivf)
}
