package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an N× scale-up of a testdata directory as N
  * DISJOINT shards of the source corpus — replica i offsets every key
  * column by i·(max+1), and salts document tokens with a per-replica
  * suffix so shingle/term space is disjoint across replicas. The result
  * preserves the source's per-shard join/dup/candidate structure
  * exactly, so candidate-pair counts, cluster sizes and posting lists
  * scale LINEARLY with the factor — the property a soak needs to
  * expose super-linear operators (a quadratic stage shows as a ≫N×
  * time ratio, never hidden by changed data shape).
  *
  * Deliberately NOT synthetic data generation: every row is a
  * key-shifted copy of a driver-generated testdata row (TESTDATA.md
  * fixtures stay the single source of record structure).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <destDir> <factor>
  */
object ScaleUp {

  /** Union `factor` copies of `df`, offsetting each key column by
    * i·(max+1) so shards never collide. */
  private def shard(df: DataFrame, keys: Seq[String], factor: Int,
                    salt: (DataFrame, Int) => DataFrame = (d, _) => d)
  : DataFrame = {
    val maxes: Map[String, Long] = {
      val r = df.agg(count(lit(1)),
        keys.map(k => max(col(k)).cast("long")): _*).head()
      keys.zipWithIndex.map { case (k, i) => k -> (r.getLong(i + 1) + 1) }
        .toMap
    }
    (0 until factor).map { i =>
      val off = keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, (col(k) + lit(i * maxes(k))).cast("long"))
      }
      salt(off, i)
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dest, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(dest).mkdirs()
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dest/$t.parquet")

    // dims: structure shared by every shard — copy once
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)
    write(shard(read("customer"), Seq("c_custkey"), factor), "customer", 4)
    write(shard(read("supplier"), Seq("s_suppkey"), factor), "supplier", 2)
    write(shard(read("part"), Seq("p_partkey"), factor), "part", 4)
    write(shard(read("orders"), Seq("o_orderkey", "o_custkey"), factor),
      "orders", 8)
    write(shard(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), factor), "lineitem", 16)
    write(shard(read("events"), Seq("event_id", "user_id"), factor),
      "events", 16)
    // replica > 0 suffixes every token: shingles/terms are disjoint
    // across shards, so dup clusters and posting lists scale linearly
    write(shard(read("documents"), Seq("doc_id"), factor,
      salt = (d, i) => if (i == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1zr" + i))), // $1 + tag
      "documents", 16)
    write(shard(read("embeddings"), Seq("vec_id"), factor), "embeddings", 8)
    println(s"scaled $src -> $dest x$factor")
    spark.stop()
  }
}
