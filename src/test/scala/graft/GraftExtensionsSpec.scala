package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity is callable from SQL via the session extension") {
    val prior = SparkSpec.session // keep the shared context alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate() // reuses the shared SparkContext, new session state
      val out = s.sql(
        """SELECT cosine_similarity(
          |  CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
          |  CAST(array(2.0, 3.0, 4.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(out - 20.0 / (math.sqrt(14.0) * math.sqrt(29.0))) < 1e-15)
      // wrong arity surfaces as an analysis error, not a crash
      val err = intercept[Exception] {
        s.sql("SELECT cosine_similarity(CAST(array(1.0) AS ARRAY<FLOAT>))").collect()
      }
      assert(err.getMessage.contains("cosine_similarity"))
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
