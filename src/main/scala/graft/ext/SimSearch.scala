package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ArrayType(FloatType)) —
  * BASELINE.json extension scope.
  *
  *  - [[cosineTopK]]: brute-force exact top-k. The join is
  *    queries × corpus; with a bounded query set this is a broadcast of
  *    the queries against a single corpus scan — the right baseline, and
  *    embarrassingly parallel at any corpus size.
  *  - [[lshTopK]]: BucketedRandomProjectionLSH bucketed variant — the
  *    scale path when the query set is itself huge (corpus self-join).
  *
  * Dot products fold LEFT-TO-RIGHT over double-cast elements (Spark
  * `aggregate` is a sequential fold), matching a left-associated SQL sum
  * term-for-term, so scores are bit-stable and oracle-mirrorable.
  */
object SimSearch {

  /** Left-associated flat dot product over `dim` elements. Flat
    * element_at chains are whole-stage-codegen'd; the equivalent
    * aggregate/zip_with HOF runs interpreted and re-evaluates captured
    * arrays per element (measured ~6× slower at 64 dims). Addition order
    * (t1+t2)+t3… matches both the HOF fold and the oracle SQL. */
  def dot(a: Column, b: Column, dim: Int = 64): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  /** Flat squared norm. */
  def norm2(a: Column, dim: Int = 64): Column =
    (1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _)

  def cosine(a: Column, b: Column, dim: Int = 64): Column =
    dot(a, b, dim) / (sqrt(norm2(a, dim)) * sqrt(norm2(b, dim)))

  /** Exact top-k cosine neighbors of each query vector (self-matches
    * excluded). Ties break on neighbor id for determinism. Corpus/query
    * norms are precomputed per row, not per pair. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 dim: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol), dim)).as("qn"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol), dim)).as("cn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv"), dim) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), col("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** LSH-bucketed approximate top-k (scale path; MLlib
    * BucketedRandomProjectionLSH under euclidean distance on normalized
    * vectors — rank-equivalent to cosine). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              bucketLength: Double = 2.0, numHashTables: Int = 3,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    import org.apache.spark.sql.Row

    val spark = queries.sparkSession
    val toVec = udf { (arr: Seq[Float]) =>
      val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
      Vectors.dense(arr.map(x => if (n == 0) 0.0 else x / n).toArray)
    }
    val q = queries.select(col(idCol).as("qid"), toVec(col(vecCol)).as("fv"))
    val c = corpus.select(col(idCol).as("cid"), toVec(col(vecCol)).as("fv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("fv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(c)
    val joined = model.approxSimilarityJoin(q, c, 2.0, "dist")
      .select(col("datasetA.qid").as("qid"), col("datasetB.cid").as("cid"), col("dist"))
      .filter(col("qid") =!= col("cid"))
    // On unit vectors: cos = 1 − dist²/2.
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("cid").asc)
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cos_approx"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold within one
    * table (brute force over a bounded id range; LSH for the full set). */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         dim: Int = 64): DataFrame = {
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), cosine(col("va"), col("vb"), dim).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("ida"), col("idb"))
  }
}
