package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM reader for netCDF-3 "classic" files (magic `CDF\x01`/`\x02`,
  * 64-bit-offset `\x05`) — the pre-HDF5 container many observation
  * archives still ship. Flat format: header (dims, global atts, vars
  * with atts/offsets), then fixed-size variable data, then record
  * variables interleaved per record. Big-endian throughout.
  *
  * Exposes the same Dataset/Attr surface as [[Hdf5Mini]] so
  * [[NetCDF.decode]] can dispatch on the magic bytes.
  */
private[sources] object NetCdf3Mini {
  import Hdf5Mini.{Attr, Dtype}

  final case class Var(name: String, dims: Seq[Long], attrs: Map[String, Attr],
      ncType: Int, vsize: Long, begin: Long, isRecord: Boolean)

  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 4, 6 -> 8)

  final class Reader(data: Array[Byte]) {
    private val bb = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
    private var pos = 0
    private val version: Int = {
      require(data.length > 4 && data(0) == 'C' && data(1) == 'D' && data(2) == 'F',
        "not a netCDF classic file")
      data(3).toInt
    }
    private val offSize = if (version == 5) 8 else 4 // CDF-5 unsupported ints aside

    private def i4(): Int = { val v = bb.getInt(pos); pos += 4; v }
    private def i8(): Long = { val v = bb.getLong(pos); pos += 8; v }
    private def offset(): Long = if (version >= 2) { i8() } else i4().toLong & 0xffffffffL
    private def name(): String = {
      val n = i4()
      val s = new String(data, pos, n, "UTF-8")
      pos += (n + 3) / 4 * 4 // padded to 4
      s
    }

    private def attrs(): Map[String, Attr] = {
      val tag = i4(); val n = i4()
      require(tag == 0x0C || (tag == 0 && n == 0), s"bad att_list tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val t = i4(); val cnt = i4()
        val sz = TypeSizes(t) * cnt
        val raw = java.util.Arrays.copyOfRange(data, pos, pos + sz)
        pos += (sz + 3) / 4 * 4
        // map to the HDF5-side Dtype classes: char→string, int→fixed, fp→float
        val dt = t match {
          case 2 => Dtype(3, cnt, signed = false, bigEndian = true)
          case 1 | 3 | 4 => Dtype(0, TypeSizes(t), signed = true, bigEndian = true)
          case 5 | 6 => Dtype(1, TypeSizes(t), signed = true, bigEndian = true)
        }
        val dims = if (t == 2) Seq(1L) else Seq(cnt.toLong)
        nm -> Attr(nm, dt, dims, raw)
      }.toMap
    }

    /** (record-dim length, variables) parsed from the header */
    val (numRecs, vars): (Long, Seq[Var]) = {
      pos = 4
      val nrecs = if (version >= 5) i8() else i4().toLong
      // dim list
      val dtag = i4(); val ndims = i4()
      require(dtag == 0x0A || (dtag == 0 && ndims == 0), s"bad dim_list tag $dtag")
      val dimLens = (0 until ndims).map { _ => name(); i4().toLong }
      attrs() // global attributes (unused here)
      val vtag = i4(); val nvars = i4()
      require(vtag == 0x0B || (vtag == 0 && nvars == 0), s"bad var_list tag $vtag")
      val vs = (0 until nvars).map { _ =>
        val nm = name()
        val nd = i4()
        val dimIds = (0 until nd).map(_ => i4())
        val va = attrs()
        val t = i4()
        val vsize = i4().toLong & 0xffffffffL
        val begin = offset()
        val isRec = dimIds.headOption.exists(dimLens(_) == 0L)
        val shape = dimIds.map(id => if (dimLens(id) == 0L) nrecs else dimLens(id))
        Var(nm, shape, va, t, vsize, begin, isRec)
      }
      (nrecs, vs)
    }

    private val recSize: Long = vars.filter(_.isRecord).map(_.vsize).sum

    /** values of a variable in C order as doubles (raw, no CF decoding) */
    def readDoubles(v: Var): Array[Double] = {
      val es = TypeSizes(v.ncType)
      val perRec = if (v.isRecord) v.dims.drop(1).product max 1L else 0L
      val n = (v.dims.product max 1L).toInt
      val out = new Array[Double](n)
      def decode(off: Long): Double = v.ncType match {
        case 1 => data(off.toInt).toDouble
        case 3 => bb.getShort(off.toInt).toDouble
        case 4 => bb.getInt(off.toInt).toDouble
        case 5 => bb.getFloat(off.toInt).toDouble
        case 6 => bb.getDouble(off.toInt)
        case t => throw new IllegalArgumentException(s"nc type $t not numeric")
      }
      var i = 0
      while (i < n) {
        val addr =
          if (v.isRecord) v.begin + (i / perRec) * recSize + (i % perRec) * es
          else v.begin + i.toLong * es
        out(i) = decode(addr)
        i += 1
      }
      out
    }

    def byName: Map[String, Var] = vars.map(v => v.name -> v).toMap
  }
}
