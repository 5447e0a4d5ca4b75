package graft.ts

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal reader for the subset of Python's pickle format that tsod
  * model files contain — the format is public (documented opcode-by-
  * opcode in CPython's `Lib/pickletools.py`). The reference persists
  * detectors with `joblib.dump` (`/root/reference/tsod/base.py:95-104`,
  * `tests/test_persistence.py:24-48`); for plain parameter objects
  * (floats/ints/strings/lists/dicts — no numpy ARRAYS) joblib emits a
  * standard uncompressed pickle stream, which this VM replays into a
  * neutral value tree. Numpy SCALARS (`np.float64` — what fitted tsod
  * thresholds become) are supported via their reduce form; numpy arrays
  * and arbitrary callables are rejected loudly. Nothing is ever
  * executed: STACK_GLOBAL/REDUCE build inert (module, name, args)
  * records that [[JoblibIO]] pattern-matches — the classic pickle
  * security hole is structurally absent.
  */
object PickleMini {

  sealed trait PValue
  final case class PInt(v: Long) extends PValue
  final case class PFloat(v: Double) extends PValue
  final case class PStr(v: String) extends PValue
  final case class PBytes(v: Array[Byte]) extends PValue
  final case class PBool(v: Boolean) extends PValue
  case object PNone extends PValue
  final case class PList(items: mutable.ArrayBuffer[PValue]) extends PValue
  final case class PTuple(items: Vector[PValue]) extends PValue
  final case class PDict(items: mutable.LinkedHashMap[PValue, PValue]) extends PValue
  final case class PGlobal(module: String, name: String) extends PValue
  /** NEWOBJ/REDUCE result: an inert class-or-callable application;
    * BUILD attaches `state` (the instance `__dict__` for tsod objects).
    */
  final case class PObj(cls: PGlobal, args: Vector[PValue]) extends PValue {
    var state: PValue = PNone
  }

  def loads(data: Array[Byte]): PValue = {
    val stack = mutable.ArrayBuffer.empty[PValue]
    val marks = mutable.Stack.empty[Int]
    val memo = mutable.Map.empty[Int, PValue]
    var memoN = 0
    var i = 0
    def u8(): Int = { val v = data(i) & 0xFF; i += 1; v }
    def bytesAt(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(data, i, i + n); i += n; b
    }
    def leInt(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v |= (data(i + k) & 0xFFL) << (8 * k); k += 1 }
      i += n; v
    }
    def utf8(n: Int): String = new String(bytesAt(n), "UTF-8")
    def line(): String = {
      val s = i
      while (data(i) != '\n') i += 1
      val out = new String(data, s, i - s, "UTF-8"); i += 1; out
    }
    def pop(): PValue = stack.remove(stack.length - 1)
    def popToMark(): Vector[PValue] = {
      val m = marks.pop()
      val items = stack.slice(m, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }
    while (i < data.length) {
      val op = u8()
      (op: @annotation.switch) match {
        case 0x80 => u8() // PROTO
        case 0x95 => i += 8 // FRAME (length prefix; content follows inline)
        case '.' => return stack.last // STOP
        case '(' => marks.push(stack.length) // MARK
        case ')' => stack += PTuple(Vector.empty)
        case ']' => stack += PList(mutable.ArrayBuffer.empty)
        case '}' => stack += PDict(mutable.LinkedHashMap.empty)
        case 0x8c => stack += PStr(utf8(u8())) // SHORT_BINUNICODE
        case 'X' => stack += PStr(utf8(leInt(4).toInt)) // BINUNICODE
        case 'C' => stack += PBytes(bytesAt(u8())) // SHORT_BINBYTES
        case 'G' => // BINFLOAT — the one big-endian number in the format
          stack += PFloat(ByteBuffer.wrap(bytesAt(8))
            .order(ByteOrder.BIG_ENDIAN).getDouble)
        case 'K' => stack += PInt(u8()) // BININT1
        case 'M' => stack += PInt(leInt(2)) // BININT2
        case 'J' => stack += PInt(leInt(4).toInt) // BININT (signed)
        case 0x8a => // LONG1: n-byte little-endian two's-complement
          val n = u8()
          if (n == 0) stack += PInt(0L)
          else {
            var v = leInt(n)
            if (n < 8 && (v & (1L << (8 * n - 1))) != 0) v -= 1L << (8 * n)
            stack += PInt(v)
          }
        case 0x88 => stack += PBool(true) // NEWTRUE
        case 0x89 => stack += PBool(false) // NEWFALSE
        case 'N' => stack += PNone
        case 0x94 => memo(memoN) = stack.last; memoN += 1 // MEMOIZE
        case 'q' => val k = u8(); memo(k) = stack.last; memoN = math.max(memoN, k + 1)
        case 'r' => val k = leInt(4).toInt; memo(k) = stack.last; memoN = math.max(memoN, k + 1)
        case 'h' => stack += memo(u8()) // BINGET
        case 'j' => stack += memo(leInt(4).toInt) // LONG_BINGET
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          stack += PGlobal(str(module), str(name))
        case 'c' => stack += PGlobal(line(), line()) // GLOBAL (proto 0/2 form)
        case 0x81 | 'R' => // NEWOBJ / REDUCE — both inert here
          val args = pop() match {
            case PTuple(a) => a
            case other => Vector(other)
          }
          pop() match {
            case g: PGlobal => stack += PObj(g, args)
            case other => fail(s"NEWOBJ/REDUCE on non-global $other")
          }
        case 0x85 => stack += PTuple(Vector(pop())) // TUPLE1
        case 0x86 => val b = pop(); val a = pop(); stack += PTuple(Vector(a, b))
        case 0x87 =>
          val c = pop(); val b = pop(); val a = pop()
          stack += PTuple(Vector(a, b, c))
        case 't' => stack += PTuple(popToMark()) // TUPLE
        case 'a' => // APPEND
          val v = pop()
          stack.last match { case PList(xs) => xs += v; case o => fail(s"APPEND to $o") }
        case 'e' => // APPENDS
          val items = popToMark()
          stack.last match { case PList(xs) => xs ++= items; case o => fail(s"APPENDS to $o") }
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last match { case PDict(m) => m(k) = v; case o => fail(s"SETITEM to $o") }
        case 'u' => // SETITEMS
          val items = popToMark()
          stack.last match {
            case PDict(m) => items.grouped(2).foreach { case Vector(k, v) => m(k) = v }
            case o => fail(s"SETITEMS to $o")
          }
        case 'b' => // BUILD: attach instance state
          val st = pop()
          stack.last match { case o: PObj => o.state = st; case o => fail(s"BUILD on $o") }
        case '0' => pop() // POP
        case other =>
          fail(f"unsupported pickle opcode 0x$other%02x at offset ${i - 1}")
      }
    }
    fail("pickle stream ended without STOP")
  }

  private def str(v: PValue): String = v match {
    case PStr(s) => s
    case other => fail(s"expected str, got $other")
  }

  private def fail(msg: String): Nothing =
    throw new TsodSparkException(s"joblib/pickle: $msg")
}

/** Load the reference's joblib detector files (`tsod.load`
  * compatibility): replay the pickle into a value tree with
  * [[PickleMini]], then map each `tsod.*` class onto its engine
  * counterpart by its pickled `__dict__`. Attribute names follow
  * `/root/reference/tsod/detectors.py` / `hampel.py` (`_min`, `_max`,
  * `_max_diff`, `_window_size`, ...). Unsupported classes or value
  * shapes raise a [[TsodSparkException]] naming the offender — never a
  * silently wrong detector.
  */
object JoblibIO {
  import PickleMini._

  def fromBytes(bytes: Array[Byte]): Detector = toDetector(PickleMini.loads(bytes))

  def load(path: String): Detector =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // ---- WRITE parity --------------------------------------------------

  /** Serialize an engine detector as a pickle-protocol-2 stream the
    * REFERENCE itself loads (`tsod.load` → `joblib.load`; an
    * uncompressed `joblib.dump` file IS a plain pickle stream, so the
    * inverse direction of [[load]] closes the §2.3 round-trip: a model
    * fitted here can go back into the reference). Emission mirrors what
    * CPython pickles for these plain-attribute classes: `GLOBAL
    * module.Class`, `NEWOBJ` with empty args, then the instance
    * `__dict__` via `SETITEMS` + `BUILD` — every opcode is documented
    * in `Lib/pickletools.py`, and [[PickleMini]] replays the stream, so
    * the round trip is testable JVM-side as well. No memoization is
    * emitted (detector graphs are tiny trees, never self-referential).
    */
  def toBytes(d: Detector): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2) // PROTO 2
    wDetector(out, d)
    out.write('.')
    out.toByteArray
  }

  def save(d: Detector, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), toBytes(d))

  private def wLine(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    o.write(s.getBytes("UTF-8")); o.write('\n')
  }
  private def wFloat(o: java.io.ByteArrayOutputStream, v: Double): Unit = {
    o.write('G') // BINFLOAT: the one big-endian number in the format
    val bits = java.lang.Double.doubleToLongBits(v)
    var k = 7
    while (k >= 0) { o.write(((bits >>> (8 * k)) & 0xFF).toInt); k -= 1 }
  }
  private def wInt(o: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v < 256) { o.write('K'); o.write(v.toInt) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) {
      o.write('J')
      var k = 0
      while (k < 4) { o.write(((v >>> (8 * k)) & 0xFF).toInt); k += 1 }
    } else {
      o.write(0x8a); o.write(8) // LONG1, 8-byte two's-complement LE
      var k = 0
      while (k < 8) { o.write(((v >>> (8 * k)) & 0xFF).toInt); k += 1 }
    }
  private def wStr(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    // Always BINUNICODE ('X', protocol 1+): the stream declares PROTO 2,
    // and SHORT_BINUNICODE (0x8c) is a protocol-4 opcode — CPython's
    // unpickler tolerates the mix but strict proto-2 validators reject it.
    val b = s.getBytes("UTF-8")
    o.write('X') // BINUNICODE
    var k = 0
    while (k < 4) { o.write((b.length >>> (8 * k)) & 0xFF); k += 1 }
    o.write(b)
  }
  private def wBool(o: java.io.ByteArrayOutputStream, v: Boolean): Unit =
    o.write(if (v) 0x88 else 0x89)

  private def wState(o: java.io.ByteArrayOutputStream, module: String,
      cls: String)(writeItems: => Unit): Unit = {
    o.write('c'); wLine(o, module); wLine(o, cls) // GLOBAL
    o.write(')'); o.write(0x81) // EMPTY_TUPLE, NEWOBJ → Class.__new__
    o.write('}'); o.write('(') // EMPTY_DICT, MARK
    writeItems
    o.write('u'); o.write('b') // SETITEMS, BUILD → instance __dict__
  }

  private def wDetector(o: java.io.ByteArrayOutputStream, d: Detector): Unit = {
    def kv(k: String)(v: => Unit): Unit = { wStr(o, k); v }
    d match {
      case RangeDetector(mn, mx, (q1, q2)) =>
        wState(o, "tsod.detectors", "RangeDetector") {
          kv("_min")(wFloat(o, mn)); kv("_max")(wFloat(o, mx))
          kv("_quantiles") {
            o.write(']'); o.write('(')
            wFloat(o, q1); wFloat(o, q2)
            o.write('e')
          }
        }
      case DiffDetector(md, dir) =>
        wState(o, "tsod.detectors", "DiffDetector") {
          kv("_max_diff")(wFloat(o, md)); kv("_direction")(wStr(o, dir))
        }
      case GradientDetector(mg, dir) =>
        wState(o, "tsod.detectors", "GradientDetector") {
          kv("_max_gradient")(wFloat(o, mg)); kv("_direction")(wStr(o, dir))
        }
      case RollingStdDevDetector(ws, ms, center) =>
        wState(o, "tsod.detectors", "RollingStandardDeviationDetector") {
          kv("_window_size")(wInt(o, ws)); kv("_max_std")(wFloat(o, ms))
          kv("_center")(wBool(o, center))
        }
      case ConstantValueDetector(ws, th) =>
        wState(o, "tsod.detectors", "ConstantValueDetector") {
          kv("_threshold")(wFloat(o, th)); kv("_window_size")(wInt(o, ws))
        }
      case ConstantGradientDetector(ws) =>
        wState(o, "tsod.detectors", "ConstantGradientDetector") {
          // the reference subclass carries ConstantValueDetector's
          // threshold in its state; the engine hard-wires its 1e-7
          kv("_threshold")(wFloat(o, 1e-7)); kv("_window_size")(wInt(o, ws))
        }
      case h: HampelDetector =>
        wState(o, "tsod.hampel", "HampelDetector") {
          kv("_threshold")(wFloat(o, h.threshold))
          kv("_window_size")(wInt(o, h.windowSize))
        }
      case CombinedDetector(ds) =>
        wState(o, "tsod.detectors", "CombinedDetector") {
          kv("_detectors") {
            o.write(']'); o.write('(')
            ds.foreach(wDetector(o, _))
            o.write('e')
          }
        }
      case other =>
        throw new TsodSparkException(
          s"joblib save: no reference counterpart for ${other.getClass.getSimpleName}")
    }
  }

  private def stateOf(o: PObj): Map[String, PValue] = o.state match {
    case PDict(m) =>
      m.collect { case (PStr(k), v) => k -> v }.toMap
    case PTuple(Vector(PDict(m), _)) => // (dict, slots) two-tuple state form
      m.collect { case (PStr(k), v) => k -> v }.toMap
    case PNone => Map.empty
    case other => throw new TsodSparkException(s"joblib: unsupported object state $other")
  }

  /** Numbers arrive as python ints/floats or as numpy float64 SCALARS
    * (`numpy.core.multiarray.scalar(dtype('f8'), <8 bytes LE>)` — the
    * reduce form fitted tsod thresholds pickle to).
    */
  private def num(v: PValue): Double = v match {
    case PFloat(d) => d
    case PInt(l) => l.toDouble
    case o @ PObj(PGlobal(m, "scalar"), Vector(dtype, PBytes(b)))
        if m.startsWith("numpy") =>
      val descr = dtype match {
        case PObj(PGlobal(dm, "dtype"), args) if dm.startsWith("numpy") =>
          args.headOption.map {
            case PStr(s) => s
            case other => other.toString
          }.getOrElse("?")
        case other => other.toString
      }
      if (!(descr == "f8" || descr == "<f8") || b.length != 8)
        throw new TsodSparkException(s"joblib: unsupported numpy scalar dtype $descr")
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case other => throw new TsodSparkException(s"joblib: expected number, got $other")
  }

  private def intOf(v: PValue): Int = v match {
    case PInt(l) => l.toInt
    case other => num(other).toInt
  }

  private def strOf(v: PValue): String = v match {
    case PStr(s) => s
    case other => throw new TsodSparkException(s"joblib: expected str, got $other")
  }

  private def boolOf(v: PValue): Boolean = v match {
    case PBool(b) => b
    case other => throw new TsodSparkException(s"joblib: expected bool, got $other")
  }

  private def toDetector(v: PValue): Detector = v match {
    case o @ PObj(PGlobal(module, cls), _) if module.startsWith("tsod") =>
      val st = stateOf(o)
      def n(k: String): Double = num(st(k))
      cls match {
        case "CombinedDetector" => st("_detectors") match {
          case PList(items) => CombinedDetector(items.map(toDetector).toSeq)
          case PTuple(items) => CombinedDetector(items.map(toDetector))
          case other => throw new TsodSparkException(s"joblib: _detectors is $other")
        }
        case "RangeDetector" =>
          val qs = st.get("_quantiles") match {
            case Some(PList(items)) if items.length == 2 =>
              (num(items(0)), num(items(1)))
            case Some(PTuple(Vector(a, b))) => (num(a), num(b))
            case Some(PNone) | None => (0.0, 1.0)
            case Some(other) => throw new TsodSparkException(s"joblib: _quantiles is $other")
          }
          RangeDetector(n("_min"), n("_max"), qs)
        case "DiffDetector" =>
          DiffDetector(n("_max_diff"),
            st.get("_direction").map(strOf).getOrElse("both"))
        case "GradientDetector" =>
          GradientDetector(n("_max_gradient"),
            st.get("_direction").map(strOf).getOrElse("both"))
        case "RollingStandardDeviationDetector" =>
          RollingStdDevDetector(intOf(st("_window_size")), n("_max_std"),
            st.get("_center").map(boolOf).getOrElse(true))
        // ConstantGradientDetector subclasses ConstantValueDetector in the
        // reference, so its pickled state carries _threshold too — our
        // counterpart hard-wires the reference's fixed 1e-7, so only the
        // window survives the mapping
        case "ConstantGradientDetector" =>
          ConstantGradientDetector(intOf(st("_window_size")))
        case "ConstantValueDetector" =>
          ConstantValueDetector(intOf(st("_window_size")), n("_threshold"))
        case "HampelDetector" =>
          HampelDetector(intOf(st("_window_size")), n("_threshold"))
        case other =>
          throw new TsodSparkException(s"joblib: unsupported tsod class $other")
      }
    case other =>
      throw new TsodSparkException(s"joblib: not a tsod detector object: $other")
  }
}
