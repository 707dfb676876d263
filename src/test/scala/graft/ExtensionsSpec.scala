package graft

/** The SQL surface of the native expressions via SparkSessionExtensions /
  * registry install.
  */
class ExtensionsSpec extends SparkTestBase {

  test("dot_f is callable from SQL and matches the known dot product") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(got === 11.0)
  }

  test("shingles is callable from SQL with a literal width") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT shingles(split('a b c d', ' '), 3) AS sh")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
  }

  test("dot_f from SQL type-checks its inputs") {
    GraftExtensions.install(spark)
    val e = intercept[Exception](spark.sql("SELECT dot_f(array(1, 2), array(3, 4))").collect())
    assert(e.getMessage.toLowerCase.contains("dotf") ||
      e.getMessage.toLowerCase.contains("array<float>"))
  }
}
