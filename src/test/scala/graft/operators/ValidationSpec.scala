package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

/** The reference's 4-defect truth table, run against the REAL operators —
  * the reference's own unit tests mock PySpark out entirely and so test
  * the mocks (reference: src/tests/test_validation.py:10-13,77-84;
  * SURVEY.md §5). Fixture rows, one per defect class:
  *   row 1 clean / row 2 null PK / row 3 null required col /
  *   row 4 malformed timestamp.
  */
class ValidationSpec extends SparkSpec {

  private val rawSchema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("user_id", StringType),
    StructField("order_timestamp", StringType),
    StructField("total_amount", StringType)))

  private val declared = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("order_timestamp", TimestampType, nullable = false),
    StructField("total_amount", DoubleType, nullable = false)))

  private def fixture = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("1", "10", "2025-04-01 11:27:00", "99.5"),
      Row(null, "11", "2025-04-01 11:28:00", "10.0"),
      Row("3", null, "2025-04-01 11:29:00", "20.0"),
      Row("4", "13", "invalid_timestamp", "30.0")),
    rawSchema)

  test("clean row survives, defect rows are rejected with the right reasons") {
    val r = Validation.validate(fixture, declared, "order_id", cache = false)
    val valid = r.valid.collect()
    assert(valid.length == 1)
    assert(valid.head.getInt(0) == 1)
    val reasons = r.rejected.collect()
      .map(x => x.getAs[String](Validation.ReasonCol)).sorted
    assert(reasons.toSeq == Seq(
      "null_primary_key",
      "null_required_column:order_timestamp", // malformed ts -> null after cast
      "null_required_column:user_id"))
  }

  test("enforceSchema alone is the P1 cast-projection (bad values to null, no split)") {
    val out = Validation.enforceSchema(fixture, declared)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      declared.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(out.count() == 4) // no rows dropped — casting only
    assert(out.filter(org.apache.spark.sql.functions.col("order_timestamp").isNull)
      .count() == 1) // the malformed timestamp became null
  }

  test("valid side carries the declared schema, no helper columns") {
    val r = Validation.validate(fixture, declared, "order_id", cache = false)
    assert(r.valid.columns.toSeq == declared.fields.map(_.name).toSeq)
    assert(r.valid.schema.fields.map(_.dataType).toSeq ==
      declared.fields.map(_.dataType).toSeq)
  }

  test("invalid_timestamp tag fires for a bad value in a NON-required ts column") {
    val schema = StructType(Seq(
      StructField("order_id", IntegerType, nullable = false),
      StructField("order_timestamp", TimestampType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("1", "2025-04-01 11:27:00"),
        Row("2", "garbage"),
        Row("3", null)),
      StructType(Seq(
        StructField("order_id", StringType),
        StructField("order_timestamp", StringType))))
    val r = Validation.validate(df, schema, "order_id",
      required = Seq("order_id"), cache = false)
    val reasons = r.rejected.collect()
      .map(_.getAs[String](Validation.ReasonCol))
    assert(reasons.toSeq == Seq("invalid_timestamp:order_timestamp"))
    // a genuinely-null nullable ts is NOT an invalid timestamp
    assert(r.valid.count() == 2)
  }

  test("validate is idempotent: validate(valid) keeps everything") {
    val r1 = Validation.validate(fixture, declared, "order_id", cache = false)
    val r2 = Validation.validate(r1.valid, declared, "order_id", cache = false)
    assert(r2.rejected.isEmpty)
    assert(r2.valid.count() == r1.valid.count())
  }

  test("guarded integral tryCastColumn is value-identical to plain try_cast") {
    import org.apache.spark.sql.functions.col
    // every syntax class try_cast distinguishes: plain/signed/padded
    // (TRY trims all chars <= 0x20, incl. \t and \u0001), decimals and
    // exponents (rejected), overflow per target width, garbage, empty
    val vals = Seq("42", "+42", "-7", " 42 ", "\t42", "\u0001" + "42" + "\u0001",
      "0042", "00000000000000000000042", "0" * 30, "42.5", "42.0", "4e2",
      "2147483647", "2147483648",
      "9223372036854775807", "9223372036854775808", "99999999999999999999",
      "0x1A", "42abc", "", "   ", null)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField("v", StringType))))
    for (t <- Seq(ByteType, ShortType, IntegerType, LongType)) {
      val both = df.select(
        col("v"),
        Validation.tryCastColumn(col("v"), StringType, t).as("guarded"),
        col("v").try_cast(t).as("plain")).collect()
      both.foreach { r =>
        assert(r.get(1) == r.get(2),
          s"$t of ${Option(r.get(0)).map(v => s"'$v'")}: " +
            s"guarded=${r.get(1)} plain=${r.get(2)}")
      }
    }
  }

  test("both ISO-T and space-separated timestamps parse via the CSV reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.csv"),
      "order_num,order_id,user_id,order_timestamp,total_amount,date\n" +
        "1,1,10,2025-04-01T11:27:00,9.5,2025-04-01\n" +
        "2,2,11,2025-04-02 12:00:00,8.5,2025-04-02\n")
    val df = Tables.readCsv(spark, Tables.orders, dir)
    assert(df.count() == 2)
    assert(df.filter(org.apache.spark.sql.functions.col("order_timestamp").isNull).count() == 0)
  }
}
