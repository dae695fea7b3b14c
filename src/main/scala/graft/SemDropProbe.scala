package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throughput probe for [[graft.streaming.Streams.semDropAtIngest]]'s
  * row-local candidate scan — round-14 verdict task 6: the gate's only
  * interpreted expressions are two HOFs (`transform`+`filter` over the
  * packed members, then `array_min`) over ≤~64 in-row members, and the
  * scaladoc names a native best-witness expression as the upgrade path
  * IF a probe justifies it (the round-12 BpeSegment counter-lesson:
  * string/HOF chains are not automatically hot — measure first).
  *
  * Arms (one session, warmed, interleaved, median of 3, noop-forced):
  *   full  — the shipped gate, batch-shape, over the embeddings table
  *           probing its own semDedup index (worst case: every bucket
  *           ~64 members and every row collides with its own bucket).
  *   join  — the same pipeline STOPPED after the stream-static index
  *           join (emits size(members)) — everything except the HOFs.
  * The delta isolates the HOF candidate scan; `hof_share` = (full −
  * join) / full. Adopt a native expression only if the share is a
  * material fraction of the gate.
  *
  * Prints one JSON line:
  * `{"metric":"semdrop_probe","full":F,"join":J,"hof_share":...}`. */
object SemDropProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ProbeSession.local()
    import graft.operators.Ann

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // the x_semdedup sizing laws: first-⌈√N⌉-ids quantizer, planesFor buckets
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case x => x.toString.toDouble
      }.toSeq)).sortBy(_._1).toSeq
    val planes = Ann.hyperplanes(Ann.planesFor(n, 64), 64)
    val index = Ann.semIndexBuckets(emb, "vec_id", "embedding", centroids, planes)
      .localCheckpoint() // index build priced once, not per arm pass

    def fullArm(): DataFrame = graft.streaming.Streams.semDropAtIngest(
      emb, "vec_id", "embedding", index, centroids, planes, tau = 0.2)
    def joinArm(): DataFrame = {
      val cents = broadcast(spark.createDataFrame(centroids).toDF("_cent_id", "_cent"))
      Ann.assignCells(emb, "embedding", centroids)
        .withColumn("bucket", Ann.lshBucket(col("embedding"), planes))
        .withColumn("_nrm", Ann.norm(col("embedding")))
        .join(cents, col("cell") === col("_cent_id"))
        .withColumn("cent_cos", round(
          Ann.dot(col("embedding"), col("_cent")) /
            (col("_nrm") * Ann.norm(col("_cent"))), 4))
        .join(index, Seq("cell", "bucket"), "left")
        .select(col("vec_id"), col("cell"), col("cent_cos"),
          size(col("members")).as("n_members"))
    }

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    force(fullArm()); force(joinArm()) // warm untimed
    val (fa, ja) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 3) {
      fa += time(force(fullArm()))
      ja += time(force(joinArm()))
    }
    def median(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    val (f, j) = (median(fa.result()), median(ja.result()))
    println(f"""{"metric":"semdrop_probe","unit":"sec","n":$n,"full":$f%.3f,"join":$j%.3f,"hof_share":${(f - j) / f}%.3f,"rows_per_sec":${n / f}%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
