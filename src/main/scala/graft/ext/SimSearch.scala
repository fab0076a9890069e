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

  /** Sequential-fold dot product of two float-array columns in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Sequential-fold squared norm. */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k cosine neighbors of each query vector (self-matches
    * excluded). Ties break on neighbor id for determinism. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
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
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("ida"), col("idb"))
  }
}
