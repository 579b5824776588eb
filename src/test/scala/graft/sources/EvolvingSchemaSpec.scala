package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Schema evolution across parquet writes: merged reads + conformance
  * to one declared schema (the scale form of the reference's defensive
  * column probing).
  */
class EvolvingSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("readEvolving unions file schemas; conformTo lands on one") {
    val path = Files.createTempDirectory("evolve").toString
    // v1 writer: (id, amount as string — the early pipeline's mistake)
    Seq((1L, "10.5"), (2L, "oops")).toDF("id", "amount")
      .write.mode("append").parquet(path)
    // v2 writer: amount fixed to double, new region column
    Seq((3L, 20.25, "north")).toDF("id", "amount2", "region")
      .withColumnRenamed("amount2", "amount_v2")
      .write.mode("append").parquet(path)

    val merged = Tables.readEvolving(spark, path)
    assert(merged.columns.toSet ==
      Set("id", "amount", "amount_v2", "region"))
    // old files' missing columns are null, not an error
    assert(merged.filter(col("id") === 1L).head()
      .getAs[Any]("region") == null)

    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DoubleType), // string→double coercion
      StructField("region", StringType),
      StructField("brand", StringType))) // never written anywhere
    val conformed = graft.std.SchemaOps.conformTo(merged, target)
    assert(conformed.columns.toSeq == target.fieldNames.toSeq)
    assert(conformed.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      target.fields.map(f => f.name -> f.dataType).toSeq)
    val byId = conformed.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(1) == 10.5) // cast succeeded
    assert(byId(2L).isNullAt(1)) // "oops" coerced to null, ANSI off
    assert(byId(3L).getString(2) == "north")
    assert(byId.values.forall(_.isNullAt(3))) // brand: typed null
  }

  test("conformTo resolves case variants; readConformed handles type drift") {
    // a writer that emitted 'Region' must conform to target 'region'
    // as a cast, not silently become nulls
    val caseDf = Seq((1L, "north")).toDF("id", "Region")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("region", StringType)))
    val row = graft.std.SchemaOps.conformTo(caseDf, target).head()
    assert(row.getString(1) == "north")

    // same-name TYPE drift across revisions: mergeSchema throws on
    // this, readConformed casts each revision before the union
    val v1 = Files.createTempDirectory("rev1").toString
    val v2 = Files.createTempDirectory("rev2").toString
    Seq((1L, "10.5"), (2L, "oops")).toDF("id", "amount")
      .write.mode("overwrite").parquet(v1)
    Seq((3L, 20.25)).toDF("id", "amount")
      .write.mode("overwrite").parquet(v2)
    val t2 = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    val got = Tables.readConformed(spark, Seq(v1, v2), t2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(10.5), 2L -> None, 3L -> Some(20.25)))
  }
}
