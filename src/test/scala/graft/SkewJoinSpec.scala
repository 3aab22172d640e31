package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join result equals plain join on skewed keys") {
    // 90% of big-side rows share one hot key
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "payload")
    val small = (1 to 10).map(i => (i.toLong, s"dim$i")).toDF("sk", "name")
    val plain = big.join(small, big("k") === small("sk"))
      .groupBy("name").count().orderBy("name").collect().toSeq
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "sk", saltFactor = 8)
      .groupBy("name").count().orderBy("name").collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads the hot key across partitions deterministically") {
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val salts = big.withColumn(
        "_salt", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8L)))
      .groupBy("_salt").count()
    assert(salts.count() == 8) // all 8 salt buckets populated
    // deterministic: same input -> same salts
    val again = big.withColumn(
        "_salt", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8L)))
      .groupBy("_salt").count()
    assert(salts.orderBy("_salt").collect().toSeq == again.orderBy("_salt").collect().toSeq)
  }
}
