package graft.model

import graft.SparkSpec

class CqlSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CqlSchema("t", Seq("pk1", "pk2"), Seq("ck"), Seq("st"))

  test("role assignment covers all four roles") {
    assert(schema.role("pk1") === ColumnRole.PartitionKey)
    assert(schema.role("ck") === ColumnRole.ClusteringKey)
    assert(schema.role("st") === ColumnRole.Static)
    assert(schema.role("v") === ColumnRole.Regular)
    assert(schema.primaryKey === Seq("pk1", "pk2", "ck"))
  }

  test("annotate → fromStruct round-trips roles through StructField.metadata") {
    val df = Seq((1L, "a", 2, "s", 3.0)).toDF("pk1", "pk2", "ck", "st", "v")
    val annotated = schema.annotate(df)
    val back = CqlSchema.fromStruct("t", annotated.schema)
    assert(back.partitionKeys === Seq("pk1", "pk2"))
    assert(back.clusteringKeys === Seq("ck"))
    assert(back.staticColumns === Seq("st"))
    // data untouched
    assert(annotated.collect() === df.collect())
  }

  test("fromStruct recovers the DECLARED composite-key order, not column order") {
    // pk declared (b, a) over a DataFrame whose columns are (a, b, v):
    // composite-key token serialization is order-sensitive, so a recovery
    // that re-sorted by column position would compute wrong tokens
    val sk = CqlSchema("t", Seq("b", "a"), Seq("d", "c"))
    val df = Seq((1L, 2L, 3L, 4L, 5.0)).toDF("a", "b", "c", "d", "v")
    val back = CqlSchema.fromStruct("t", sk.annotate(df).schema)
    assert(back.partitionKeys === Seq("b", "a"))
    assert(back.clusteringKeys === Seq("d", "c"))
  }

  test("annotate keeps the plan declarative (no RDD barrier: pushdown survives)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_").toString + "/t"
    Seq((1L, "x", 10), (2L, "y", 20)).toDF("pk1", "pk2", "v").write.parquet(dir)
    val annotated = CqlSchema("t", Seq("pk1")).annotate(spark.read.parquet(dir))
      .filter($"pk1" === 1L)
    val plan = annotated.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(pk1), EqualTo(pk1,1)]"), plan)
  }
}
