package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The connector `bucket` function backing STORAGE-PARTITIONED JOINS
  * (Iceberg's SPJ design on Spark's public V2 function machinery):
  * when a scan reports `KeyGroupedPartitioning(bucket(n, key))`,
  * Spark resolves the transform through the table's catalog
  * ([[CommitLogCatalog.loadFunction]] → here), and two sides whose
  * bound functions share a `canonicalName` and bucket count are
  * co-partitioned — the join plans with ZERO shuffle exchanges.
  *
  * Semantics are EXACTLY the layout hash
  * [[CommitLogStats.compactBucketed]] wrote the segments with:
  * `pmod(murmur3_hash(key, seed=42), n)` — Spark's own `hash()`
  * column function — so if Spark ever EVALUATES the function (the
  * one-side storage-partitioned shuffle,
  * `spark.sql.sources.v2.bucketing.shuffle.enabled`), rows land in
  * the same buckets the files hold. NULL hashes to the seed,
  * matching `hash(NULL)`. Integral keys only — the layouts
  * compactBucketed serves in practice; anything else refuses the
  * bind and the join falls back to a plain shuffle (never wrong,
  * only unoptimized). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(murmur3_hash(key, 42), n) — the " +
      "compactBucketed segment-layout function"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length < 2)
      throw new UnsupportedOperationException(
        s"graft bucket: expects (numBuckets INT, key, ...), got " +
          inputType.simpleString)
    val keyTypes = inputType.fields.drop(1).map(_.dataType)
    keyTypes.find {
      case ByteType | ShortType | IntegerType | LongType => false
      case _ => true
    }.foreach(other => throw new UnsupportedOperationException(
      s"graft bucket: unsupported key type $other — integral " +
        "bucket keys only"))
    GraftBucketBound(keyTypes.toSeq)
  }
}

final case class GraftBucketBound(keyTypes: Seq[DataType])
    extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] =
    (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // both sides of an SPJ compare this: one engine, one layout hash
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    // Spark's hash(k1, k2, ...): murmur3 seeded 42, each value's
    // hash seeding the next; NULL leaves the running seed unchanged
    var h = 42
    var i = 0
    while (i < keyTypes.length) {
      if (!input.isNullAt(i + 1)) h = keyTypes(i) match {
        case LongType => org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashLong(input.getLong(i + 1), h)
        case IntegerType => org.apache.spark.unsafe.hash
          .Murmur3_x86_32.hashInt(input.getInt(i + 1), h)
        case ShortType => org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashInt(input.getShort(i + 1).toInt, h)
        case _ => org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashInt(input.getByte(i + 1).toInt, h)
      }
      i += 1
    }
    ((h % n) + n) % n
  }
}
