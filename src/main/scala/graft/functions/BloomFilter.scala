package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable Bloom filter over LONG keys — the membership sketch that makes
  * a 100 TB-scale suppression anti-join feasible when the suppression set
  * is too large to broadcast as an exact hash set.
  *
  * Why not Spark's built-in runtime bloom join (`spark.sql.optimizer
  * .runtime.bloomFilter.*`)? That one is planner-injected, size-capped
  * far below billion-key suppression lists, and its sketch is transient —
  * it cannot be STORED and reused across pipeline runs. This one is an
  * explicit, persistable column value: build once over the already-trained
  * corpus fingerprints (one map pass + constant-size merges), write the
  * bytes next to the run manifest, and every later ingest probes it
  * map-side. See [[graft.ops.BloomSuppress]] for the exact-answer
  * anti-join built on top (the sketch only PRUNES; candidates are
  * re-verified exactly, so false positives never change answers).
  *
  * Layout of the emitted bytes: `[mBits: int][k: int][words: long...]`,
  * all big-endian. Hashing is Kirsch–Mitzenmacher double hashing from two
  * splitmix64 finalizer mixes — fully deterministic across runs/engines,
  * so a stored sketch keeps answering for the corpus it was built from.
  *
  * Reference analog: the reference dedupes retrieval work with an exact
  * checkpoint anti-join (`background_retrieval.py:157-169`); this is the
  * sketch form of the same suppression contract for key sets that outgrow
  * an exact broadcast.
  */
object BloomBits {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def headerBytes: Int = 8

  /** Sized for target fpp at n keys: m = -n ln p / (ln 2)^2, k = m/n ln 2.
    * m is rounded up to a word multiple and clamped to [64, 2^31) bits
    * (256 MB — the sketch is a driver/broadcast-resident model, keep it
    * bounded); k clamped to [1, 8].
    */
  def size(expectedKeys: Long, fpp: Double): (Int, Int) = {
    // fail loudly: fpp >= 1 would silently clamp to a useless 64-bit
    // sketch (pruning keeps everything), fpp <= 0 yields NaN/oversized m
    require(fpp > 0.0 && fpp < 1.0,
      s"bloom size: fpp must be in (0, 1), got $fpp")
    val n = math.max(1L, expectedKeys).toDouble
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n * math.log(fpp) / (ln2 * ln2))
    val m = math.min(Int.MaxValue.toDouble - 64, math.max(64.0, mRaw))
    val mBits = ((m.toLong + 63) / 64 * 64).toInt
    val k = math.max(1, math.min(8, math.round(mBits / n * ln2).toInt))
    (mBits, k)
  }

  def set(words: Array[Long], mBits: Int, k: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def serialize(words: Array[Long], mBits: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(headerBytes + words.length * 8)
    bb.putInt(mBits).putInt(k) // header big-endian
    // words little-endian: bit `pos` of the filter lives at byte
    // `header + pos/8`, bit `pos%8` — the layout [[contains]] indexes
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** Probe (codegen entry point). Reads the header on every call — two
    * int loads against an L1-resident array, noise next to the k mixes.
    */
  def contains(bytes: Array[Byte], key: Long): Boolean = {
    val mBits =
      ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
        ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val k = bytes(7) & 0xff
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      val byteIdx = headerBytes + (pos >>> 3)
      if (((bytes(byteIdx) >> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  /** In-place OR of two sketches with identical (mBits, k) headers. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length &&
      java.util.Arrays.equals(a.take(headerBytes), b.take(headerBytes)),
      "bloom_union: sketches have different (mBits, k) parameters")
    var i = headerBytes
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** Aggregate: fold long keys into one Bloom sketch. Buffer is a flat
  * word array (constant size mBits/64 longs); partial aggregation
  * map-side-combines, and the shuffle carries one sketch per partition.
  */
case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"bloom_agg: mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"bloom_agg: k must be in [1,16], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BIGINT input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buf, mBits, k, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomBits.serialize(buf, mBits, k)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** Union aggregate over SERIALIZED sketches — re-aggregation of stored
  * per-day/per-shard sketches into one, same contract as the KLL/freq
  * merge aggregates: suppression lists compose without touching raw keys.
  */
case class BloomMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY sketches, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) bytes.clone() else BloomBits.union(buf, bytes)
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else BloomBits.union(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_merge_agg"
}

/** Scalar probe: `bloom_contains(sketchBytes, key)`. The sketch side is
  * normally a foldable literal (the built sketch), which codegen hoists
  * into the references array — per-row cost is k mixes + k bit tests,
  * fully inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(bits: Any, key: Any): Any =
    BloomBits.contains(bits.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, key) =>
      s"graft.functions.BloomBits.contains($b, $key)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
