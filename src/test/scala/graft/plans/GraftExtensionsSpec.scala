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
}
