package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CosineSimilarity

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL text and agrees with the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vec_pairs")
    val fromSql = spark.sql("SELECT cosine_sim(a, b) AS c FROM vec_pairs").as[Double].head()
    val fromCol = spark.table("vec_pairs")
      .select(CosineSimilarity(col("a"), col("b")).as("c")).as[Double].head()
    assert(fromSql == fromCol)
    assert(math.abs(fromSql - 10.0 / 14.0) < 1e-12) // (3+4+3)/(|a||b|)=10/14
  }

  test("cosine_sim rejects wrong arity and non-array inputs") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT cosine_sim(1)").collect() }
    intercept[Exception] { spark.sql("SELECT cosine_sim('x', 'y')").collect() }
  }

  test("zorder2 and hash_split_bucket are callable from SQL and agree with the Column API") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    GraftExtensions.register(spark)
    val z = spark.sql("SELECT zorder2(3, 5, 4) AS z").as[Long].head()
    val zCol = Seq((3L, 5L)).toDF("a", "b")
      .select(GraftFunctions.zOrder2(col("a"), col("b"), bits = 4).as("z")).as[Long].head()
    // a=3 (bits 0,1 → z bits 0,2), b=5 (bits 0,2 → z bits 1,5): 1+2+4+32
    assert(z == zCol && z == 39L, s"zorder2(3,5,4) = $z")
    val b = spark.sql("SELECT hash_split_bucket('doc-42', 100) AS b").as[Long].head()
    val bCol = Seq("doc-42").toDF("k")
      .select(GraftFunctions.hashSplitBucket(col("k"), 100).as("b")).as[Long].head()
    assert(b == bCol && b >= 0 && b < 100)
    // tuning args must be literals, like Spark's own round(x, 2)
    intercept[Exception] {
      spark.sql("SELECT zorder2(1, 2, CAST(rand()*4 AS INT))").collect()
    }
  }
}
