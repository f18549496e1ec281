package graft.engine

import graft.model.Rendered

/**
 * The shuffled row shape: `(key, meta, value)` — the Spark analog of
 * the reference's SortableFeature `(64-bit key, byte value)`
 * (`collection/SortableFeature.java`, key layout
 * `FeatureGroup.java:168-196`). Sorting and range-partitioning touch
 * only two longs; everything else rides in one opaque byte array, so
 * the 4M+-row shuffle sorts without string comparisons and the
 * UnsafeRow is three fixed fields.
 *
 *   key  = Hilbert tile id (zoom-major)        — range-partition key
 *   meta = layerId(8b) | biased sortKey(22b) | featureId low bits(32b)
 *   value = varint payload:
 *     [geomType u8][flags u8][group zz-varint?][groupLimit varint?]
 *     [featureId varint][nCmds varint][cmds varints][attrs bytes]
 *
 * Ties beyond (key, meta) break by unsigned value bytes, mirroring the
 * reference's byte-level tie-break (`SortableFeature.java:10-16`).
 */
case class Kv(key: Long, meta: Long, value: Array[Byte])

object KvCodec {
  val SortKeyBias = 1 << 21 // sortKey in [-2^21, 2^21)

  def packMeta(layerId: Int, sortKey: Int, featureId: Long): Long = {
    // clamp to the representable range (the reference clamps to
    // SORT_KEY_MIN/MAX the same way) — without it an out-of-range key
    // silently wraps and inverts in-layer ordering
    val clamped = math.min(math.max(sortKey, -SortKeyBias), SortKeyBias - 1)
    val sk = (clamped + SortKeyBias) & 0x3fffff
    (layerId.toLong & 0xff) << 54 | sk.toLong << 32 | (featureId & 0xffffffffL)
  }

  def layerId(meta: Long): Int = ((meta >>> 54) & 0xff).toInt
  def sortKey(meta: Long): Int = (((meta >>> 32) & 0x3fffff) - SortKeyBias).toInt

  /** Descending sort-key semantics (reference `setSortKeyDescending`):
    * reflect the key inside the valid range so larger values order
    * FIRST within a layer. Reflection (not negation) keeps the mapping
    * a bijection over [-bias, bias). */
  def descendingSortKey(sortKey: Int): Int = {
    val clamped = math.min(math.max(sortKey, -SortKeyBias), SortKeyBias - 1)
    -1 - clamped
  }

  def encode(r: Rendered, layerId: Int): Kv = {
    val out = new java.io.ByteArrayOutputStream(
      16 + r.commands.length * 2 + r.attrs.length)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    out.write(r.geom_type)
    val hasGroup = r.group != 0
    // flags byte: bit0 = hasGroup, bits 1..5 = extra-precision scale
    out.write((if (hasGroup) 1 else 0) | ((r.scale & 0x1f) << 1))
    if (hasGroup) {
      varint((r.group << 1) ^ (r.group >> 63)) // zigzag
      varint(r.group_limit.toLong)
    }
    varint(r.feature_id)
    varint(r.commands.length.toLong)
    var i = 0
    while (i < r.commands.length) {
      varint(r.commands(i).toLong & 0xffffffffL)
      i += 1
    }
    out.write(r.attrs, 0, r.attrs.length)
    Kv(r.tile_id, packMeta(layerId, r.sort_key, r.feature_id), out.toByteArray)
  }

  /** Fast group peek for the map-side label-grid limit: returns
    * (group, limit) or (0, 0). */
  def peekGroup(value: Array[Byte]): (Long, Int) = {
    if ((value(1) & 1) == 0) (0L, 0)
    else {
      val r = new VarReader(value, 2)
      val zz = r.readVarint()
      ((zz >>> 1) ^ -(zz & 1), r.readVarint().toInt)
    }
  }

  def decode(kv: Kv, layers: IndexedSeq[String]): Rendered = {
    val v = kv.value
    val geomType = v(0) & 0xff
    val hasGroup = (v(1) & 1) != 0
    val scale = (v(1) >> 1) & 0x1f
    val r = new VarReader(v, 2)
    var group = 0L
    var limit = 0
    if (hasGroup) {
      val zz = r.readVarint()
      group = (zz >>> 1) ^ -(zz & 1)
      limit = r.readVarint().toInt
    }
    val featureId = r.readVarint()
    val n = r.readVarint().toInt
    val cmds = new Array[Int](n)
    var i = 0
    while (i < n) { cmds(i) = r.readVarint().toInt; i += 1 }
    val attrs = java.util.Arrays.copyOfRange(v, r.pos, v.length)
    Rendered(kv.key, layers(layerId(kv.meta)), sortKey(kv.meta), featureId,
      geomType, cmds, attrs, group, limit, scale)
  }

  final class VarReader(b: Array[Byte], var pos: Int) {
    def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val x = b(pos) & 0xff
        pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
  }
}
