package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GenScale replica scheme past the 64-replica rotation wrap —
  * the raw-index `slice()` overflow shipped broken for replicas > 64
  * until round 10, and only the sf10 (100x) gate exposed it. 66 replicas
  * crosses the wrap with two post-wrap rows (r=64 negated identity,
  * r=65 negated rotation-1).
  */
class GenScaleSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("embedding replicas stay norm-preserving and pairwise distinct past the rotation wrap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_genscale_spec")
    try {
      graft.tools.GenScale.scale(spark, "/root/testdata/sf0.001", dir.toString, 66)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id") % 100000L as "base", expr("vec_id div 100000L") as "r",
          col("embedding"))
      val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val nBase = base.count()
      assert(emb.count() == 66 * nBase)
      assert(emb.agg(min(size(col("embedding"))), max(size(col("embedding"))))
        .head() == org.apache.spark.sql.Row(64, 64))

      // rotation + sign flip preserve the |value| multiset BIT-EXACTLY:
      // every replica of a base id must sort to replica 0's array of
      // absolute values (a float-order-free exactness check, unlike an
      // L2 norm whose summation order moves with the rotation)
      val canon = emb.select(col("base"), col("r"),
        array_sort(transform(col("embedding"), x => abs(x))).as("canon"))
      val distinctCanon = canon.groupBy(col("base"))
        .agg(countDistinct(col("canon")).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(distinctCanon == 1L,
        s"a replica changed the |value| multiset (max distinct canon per base = $distinctCanon)")

      // no two replicas of a base id may be byte-identical (the negation
      // past the wrap exists precisely so r=64 is not a copy of r=0)
      val dupPairs = emb.groupBy(col("base"), col("embedding")).count()
        .filter(col("count") > 1).count()
      assert(dupPairs == 0L, s"$dupPairs duplicate (base, embedding) replica pairs")

      // r=64 is exactly the negation of r=0
      val negMismatch = emb.filter(col("r") === 0)
        .select(col("base"), col("embedding").as("e0"))
        .join(emb.filter(col("r") === 64)
          .select(col("base"), col("embedding").as("e64")), Seq("base"))
        .filter(not(col("e64") === transform(col("e0"), x => -x)))
        .count()
      assert(negMismatch == 0L, s"$negMismatch rows where r=64 != -r=0")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
