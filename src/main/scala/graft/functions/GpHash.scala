package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's tuple-placement hash, bit-exact: PG's Jenkins
  * lookup3 datum hash (reference `src/backend/access/hash/hashfunc.c:
  * 241-520` mix/final/hash_any, `hash_uint32` at :515) reduced to a
  * segment by the jump-consistent hash (`src/backend/cdb/cdbhash.c:
  * 549` jump_consistent_hash; multi-key combine = rotate-left-1 XOR
  * per `cdbhash` at :191).
  *
  * This powers `get_ao_distribution(regclass)` — the introspection
  * function that reports per-segment tuple counts — so a migrated
  * skew-check script sees the SAME placement the reference computes.
  * The regress cluster has 3 segments (gpdemo default); the engine
  * exposes that as `graft.gp.numsegments`.
  *
  * Scale note: the hash evaluates as one deterministic map-side
  * function over the distribution columns followed by a single
  * groupBy(segment) — linear, shuffle = numsegments rows.
  */
object GpHash {

  @inline private def rot(x: Int, k: Int): Int = Integer.rotateLeft(x, k)

  /** lookup3 final(): mixes (a,b,c) into c (hashfunc.c:275). */
  private def finalMix(a0: Int, b0: Int, c0: Int): Int = {
    var a = a0; var b = b0; var c = c0
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** lookup3 mix() (hashfunc.c:241). Returns the mixed triple. */
  private def mix(a0: Int, b0: Int, c0: Int): (Int, Int, Int) = {
    var a = a0; var b = b0; var c = c0
    a -= c; a ^= rot(c, 4); c += b
    b -= a; b ^= rot(a, 6); a += c
    c -= b; c ^= rot(b, 8); b += a
    a -= c; a ^= rot(c, 16); c += b
    b -= a; b ^= rot(a, 19); a += c
    c -= b; c ^= rot(b, 4); b += a
    (a, b, c)
  }

  /** PG hash_uint32 (hashfunc.c:515): the int2/int4 datum hash. */
  def hashUint32(k: Int): Int = {
    val init = 0x9e3779b9 + 4 + 3923095
    finalMix(init + k, init, init)
  }

  /** PG hashint8 (hashfunc.c:55): low^high halves (sign-extended
    * complement when negative) so values fitting in 32 bits hash
    * identically to their int4 form. */
  def hashInt8(v: Long): Int = {
    val lo = v.toInt
    val hi = (v >> 32).toInt
    hashUint32(lo ^ (if (v >= 0) hi else ~hi))
  }

  /** PG hash_any over bytes, little-endian byte path (hashfunc.c:
    * 406-513) — the text/bytea/float8 datum hash. */
  def hashBytes(bytes: Array[Byte]): Int = {
    val keylen = bytes.length
    val init = 0x9e3779b9 + keylen + 3923095
    var a = init; var b = init; var c = init
    var off = 0
    var len = keylen
    @inline def u(i: Int): Int = bytes(off + i) & 0xff
    while (len >= 12) {
      a += u(0) + (u(1) << 8) + (u(2) << 16) + (u(3) << 24)
      b += u(4) + (u(5) << 8) + (u(6) << 16) + (u(7) << 24)
      c += u(8) + (u(9) << 8) + (u(10) << 16) + (u(11) << 24)
      val t = mix(a, b, c); a = t._1; b = t._2; c = t._3
      off += 12; len -= 12
    }
    // last 11 bytes; the lowest byte of c is reserved for the length
    if (len >= 11) c += u(10) << 24
    if (len >= 10) c += u(9) << 16
    if (len >= 9) c += u(8) << 8
    if (len >= 8) b += u(7) << 24
    if (len >= 7) b += u(6) << 16
    if (len >= 6) b += u(5) << 8
    if (len >= 5) b += u(4)
    if (len >= 4) a += u(3) << 24
    if (len >= 3) a += u(2) << 16
    if (len >= 2) a += u(1) << 8
    if (len >= 1) a += u(0)
    finalMix(a, b, c)
  }

  /** PG hashfloat8 (hashfunc.c:108): ±0 hash 0, else hash the LE
    * IEEE bytes; float4 widens to float8 first (cross-type equality). */
  def hashFloat8(d: Double): Int =
    if (d == 0.0d) 0
    else {
      val bits = java.lang.Double.doubleToLongBits(d)
      val bytes = new Array[Byte](8)
      var i = 0
      while (i < 8) { bytes(i) = (bits >>> (8 * i)).toByte; i += 1 }
      hashBytes(bytes)
    }

  /** cdbhash.c:549 jump_consistent_hash — maps a 32-bit hash (as
    * unsigned) onto [0, numSegments). */
  def jumpHash(hash32: Int, numSegments: Int): Int = {
    var key = hash32.toLong & 0xffffffffL
    var b = -1L
    var j = 0L
    while (j < numSegments) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * ((1L << 31).toDouble / ((key >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }

  /** One distribution-key datum's 32-bit hash (the default — non
    * legacy — hash opclasses; cdbhash.c makeCdbHash). */
  def datumHash(v: Any): Int = v match {
    case null => 0 // combined via rotate only (cdbhash: null adds no XOR)
    case i: Int => hashUint32(i)
    case s: Short => hashUint32(s.toInt)
    case b: Byte => hashUint32(b.toInt)
    case l: Long => hashInt8(l)
    case b: Boolean => hashUint32(if (b) 1 else 0)
    case s: String => hashBytes(s.getBytes("UTF-8"))
    case b: Array[Byte] => hashBytes(b)
    case f: Float => hashFloat8(f.toDouble)
    case d: Double => hashFloat8(d)
    case d: java.sql.Date =>
      // DateADT = days since 2000-01-01, hashed as int4 (date.h)
      hashUint32((d.toLocalDate.toEpochDay - 10957L).toInt)
    case d: java.time.LocalDate => hashUint32((d.toEpochDay - 10957L).toInt)
    case other => throw new IllegalArgumentException(
      s"no cdbhash mapping for distribution-key type ${other.getClass}")
  }

  /** Segment for a composite distribution key: rotate-left-1 then XOR
    * each attribute's hash, in declaration order (cdbhash.c:191), then
    * jump-reduce. NULL attributes rotate without XOR. */
  def segmentFor(values: Seq[Any], numSegments: Int): Int = {
    var h = 0
    values.foreach { v =>
      h = Integer.rotateLeft(h, 1)
      if (v != null) h ^= datumHash(v)
    }
    jumpHash(h, numSegments)
  }

  /** The session's segment count for placement introspection. */
  def numSegments(spark: SparkSession): Int =
    spark.conf.getOption("graft.gp.numsegments").map(_.toInt).getOrElse(3)

  /** `get_ao_distribution('t'::regclass)` (pg_proc.sql:149: OUT
    * segmentid int4, OUT tupcount int8): per-segment tuple counts
    * under the table's DISTRIBUTED BY placement. One map-side hash +
    * one numsegments-row aggregate. */
  def aoDistribution(spark: SparkSession, table: String): DataFrame = {
    val nseg = numSegments(spark)
    val distCols = graft.operators.GreengageDdl.hashDistCols(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"get_ao_distribution: $table is not hash-distributed " +
          "(DISTRIBUTED RANDOMLY/REPLICATED placement is not per-key)"))
    val segUdf = udf((r: org.apache.spark.sql.Row) =>
      segmentFor(r.toSeq, nseg))
    spark.table(table)
      .select(segUdf(struct(distCols.map(col): _*)).as("segmentid"))
      .groupBy("segmentid").agg(count(lit(1)).as("tupcount"))
  }
}
