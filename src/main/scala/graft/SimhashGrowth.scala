package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d03's candidate-pair growth law, measured (round-8 verdict task 5):
  * for each fixture dir given as an argument, print the SimHash pair
  * pipeline's internal counts — documents, distinct fingerprints m, the
  * block count the sizing law picks, CANDIDATE pairs the bucket join
  * emits (the rows that pay a Hamming verification), and final output
  * pairs. The law holds when candidates grow ~linearly in m (the old
  * fixed 4x8-bit probe grew ~m^2/256: 47.8M candidates at sf1).
  */
object SimhashGrowth {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1",
        "/root/repo/target/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxDistance = 3
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val hs = ops.Dedup.simhash32(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = hs.count()
      val vals = hs.select(col("simhash")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = vals.count()
      val blocks = ops.Dedup.simhashBlocksFor(m, maxDistance, 32)
      // Reproduce the pipeline's probe join WITHOUT the Hamming filter to
      // count the candidates that pay a verification.
      val base = 32 / blocks
      val rem = 32 % blocks
      val blockMasks = (0 until blocks).map { i =>
        val lo = i * base + math.min(i, rem)
        val w = base + (if (i < rem) 1 else 0)
        ((1L << w) - 1) << lo
      }
      val comboMasks = blockMasks.indices.combinations(blocks - maxDistance)
        .map(c => c.map(blockMasks).reduce(_ | _)).toSeq
      val probes = vals.select(col("simhash"), posexplode(
          array(comboMasks.map(mk => col("simhash").bitwiseAND(lit(mk))): _*))
        .as(Seq("combo", "key")))
      val cand = probes.as("a").join(probes.as("b"),
          col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
            col("a.simhash") < col("b.simhash"))
        .select(col("a.simhash").as("ha"), col("b.simhash").as("hb"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candidates = cand.count()
      val valPairs = cand.filter(col("hamming") <= maxDistance).distinct()
      // OUTPUT size computed arithmetically from cluster sizes — the
      // expansion itself is output-proportional (a join), so counting it
      // by materialization would measure the fixture's identical-
      // fingerprint degeneracy (token permutation preserves frequencies,
      // so every permuted copy shares its source's simhash exactly),
      // not the pipeline. pairs = sum(ca*cb) over matched value pairs +
      // sum(c*(c-1)/2) intra-cluster.
      val sizes = hs.groupBy(col("simhash")).agg(count(lit(1)).as("c"))
      val cross = valPairs
        .join(sizes.as("sa"), col("ha") === col("sa.simhash"))
        .join(sizes.as("sb"), col("hb") === col("sb.simhash"))
        .agg(coalesce(sum(col("sa.c") * col("sb.c")), lit(0L)))
        .head.getLong(0)
      val intra = sizes
        .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0L)).cast("long"))
        .head.getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"## $dir%-28s docs=$nDocs%8d m=$m%8d blocks=$blocks%2d " +
        f"probes/val=${comboMasks.size}%3d candidates=$candidates%12d " +
        f"pairs=${cross + intra}%12d wall=$wall%7.2fs")
      hs.unpersist(); vals.unpersist(); cand.unpersist()
      Caches.reset(spark)
    }
    spark.stop()
  }
}
