package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-19 fact-finder: A/B the minhash candidate-pair renderings in
  * isolation. The r19 first cut (struct band keys + first-matching-band
  * witness instead of the trailing `.distinct()`) regressed
  * x_minhash_pairs ~17× at sf10 while the identical witness idea SPED UP
  * the simhash track — this probe times each rendering piece so the
  * regression is attributed, not guessed at. args(0) = sf dir. */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scratch/sf10")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = ProbeSession.local()
    import graft.operators.TextDedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"r19probe: $name")
      try f catch { case e: Throwable =>
        System.err.println(s"[r19probe] $name failed: ${e.getMessage}")
        results(name) = -1.0; return
      }
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      results(name) = ts.min
      System.err.println(f"[r19probe] $name%-28s ${ts.min}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    val (numHashes, shingle, bandSize, numBands) = (6, 3, 2, 2)
    val eligible = docs.filter(
      graft.operators.TextStats.spaceTokens(col("text")) >= shingle)
    val sig = TextDedup.minhashSignatures(
      eligible, "doc_id", "text", numHashes, shingle)

    // shared: the banded table under each key rendering, checkpointed
    def ckpt(df: DataFrame): DataFrame = df.localCheckpoint()

    // V0: the pre-r19 rendering — string buckets, join, distinct
    val strBuckets = (0 until numBands).map { b =>
      val cols = (0 until bandSize).map(j => col(s"mh${b * bandSize + j}"))
      concat_ws(":", lit(s"b$b") +: cols: _*)
    }
    var bandsStr: DataFrame = null
    timed("ckpt banded (string)") {
      if (bandsStr != null) bandsStr.unpersist(true)
      bandsStr = ckpt(sig.select(col("doc_id"),
        explode(array(strBuckets: _*)).as("bucket")))
    }
    timed("V0 join+distinct (string)")(force(
      bandsStr.as("a").join(bandsStr.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()))
    timed("V1 join only (string)")(force(
      bandsStr.as("a").join(bandsStr.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))))

    // V2: struct keys, join, distinct (isolates struct-key cost)
    def bandKey(b: Int) = struct((0 until bandSize)
      .map(j => col(s"mh${b * bandSize + j}").as(s"k$j")): _*)
    var bandsStruct: DataFrame = null
    timed("ckpt banded (struct+keys)") {
      if (bandsStruct != null) bandsStruct.unpersist(true)
      bandsStruct = ckpt(sig
        .withColumn("_keys", array((0 until numBands).map(bandKey): _*))
        .select(col("doc_id"), col("_keys"),
          posexplode(col("_keys")).as(Seq("_band", "_key"))))
    }
    timed("V2 join+distinct (struct)")(force(
      bandsStruct.as("a").join(bandsStruct.as("b"),
          col("a._band") === col("b._band") && col("a._key") === col("b._key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()))
    // V3: struct keys + witness filter, no distinct (the r19 first cut)
    timed("V3 join+witness (struct)")(force {
      val joined = bandsStruct.as("a").join(bandsStruct.as("b"),
        col("a._band") === col("b._band") && col("a._key") === col("b._key") &&
          col("a.doc_id") < col("b.doc_id"))
      joined.filter(!(0 until numBands - 1)
          .map(j => lit(j) < col("a._band") &&
            element_at(col("a._keys"), j + 1) === element_at(col("b._keys"), j + 1))
          .reduce(_ || _))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    })

    val line = results.map { case (k, v) => s"\"$k\":$v" }
      .mkString(s"""{"sf":"$sfDir","stages":{""", ",", "}}")
    println(line)
    spark.stop()
  }
}
