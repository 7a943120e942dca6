// Microbenchmark for the round-12 kmeansFit Lloyd-round fold (round-11
// verdict #1): per iteration, the OLD shape reunited cluster ids with
// vectors via assignment().join(p) -- a corpus-sized hash join (two
// exchanges) per round -- while the NEW shape computes NearestCellQ and
// posexplode in ONE narrow pass over p (hierarchicalFit's recipe).
// This times exactly those two shapes side by side on the vec-decade
// fixture, with the same quantized frame and the same centroid table, so
// the delta is the join and nothing else.
//
// Run (ASCII only -- the default charset rejects em-dashes):
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.driver.memory=24g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.driver.extraClassPath=target/scala-2.13/classes \
//     -i tools/kmeans_fold_bench.scala < /dev/null
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val dir = sys.env.getOrElse("VEC_DIR", "testdata_vec632k")
val k = sys.env.getOrElse("KM_K", "100").toInt
val iters = sys.env.getOrElse("KM_ITERS", "3").toInt

val raw = spark.read.parquet(s"$dir/embeddings.parquet")
val p = raw.select(col("vec_id").as("id"),
  transform(col("embedding"), x => (x * lit(1 << 24)).cast("long")).as("q"))
  .localCheckpoint(false)
val n = p.count()

// deterministic centroid sample (timing only -- convergence irrelevant)
val centroids: Seq[(Int, Seq[Long])] =
  p.orderBy(xxhash64(col("id"))).limit(k).collect()
    .map(_.getSeq[Long](1).toSeq).zipWithIndex.map { case (v, i) => (i, v) }.toSeq

def newShape(): Long = {
  val t0 = System.nanoTime()
  for (_ <- 1 to iters) {
    p.select(graft.functions.NearestCellQ(col("q"), centroids).as("cluster"),
        posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
  }
  (System.nanoTime() - t0) / 1000000L
}

def oldShape(): Long = {
  val t0 = System.nanoTime()
  for (_ <- 1 to iters) {
    p.select(col("id"), graft.functions.NearestCellQ(col("q"), centroids).as("cluster"))
      .join(p, Seq("id"))
      .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
  }
  (System.nanoTime() - t0) / 1000000L
}

// warmup (codegen/JIT) then alternate, new first
newShape(); oldShape()
val n1 = newShape(); val o1 = oldShape()
val o2 = oldShape(); val n2 = newShape()
println(s"KMEANS_FOLD n=$n k=$k iters=$iters new_ms=[$n1,$n2] old_ms=[$o1,$o2]")
System.exit(0)
