package graft.ts

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** joblib/pickle interop pinned two ways: against the reference's OWN
  * committed model file (`tests/data/combined.joblib`, 244 bytes of
  * protocol-4 pickle, vendored verbatim into resources — the file
  * `tests/test_persistence.py:24-48` loads), and against hand-assembled
  * pickle streams whose expected values come from the byte layout in the
  * test itself (numpy-float64 scalar thresholds, protocol-2 GLOBAL
  * opcodes, every mapped detector class).
  */
class JoblibIOSpec extends AnyFunSuite {

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("the reference's committed combined.joblib loads to the expected detectors") {
    val d = JoblibIO.fromBytes(fixtureBytes("combined.joblib"))
    assert(d == CombinedDetector(Seq(
      ConstantValueDetector(windowSize = 5, threshold = 1e-7),
      RangeDetector(Double.NegativeInfinity, 2.0, (0.0, 1.0)))))
  }

  test("DetectorIO.load sniffs pickle vs JSON by leading byte") {
    val tmp = java.nio.file.Files.createTempDirectory("joblib").toString
    val pk = s"$tmp/combined.joblib"
    java.nio.file.Files.write(java.nio.file.Paths.get(pk),
      fixtureBytes("combined.joblib"))
    val fromPickle = DetectorIO.load(pk)
    assert(fromPickle.isInstanceOf[CombinedDetector])
    // and the JSON round-trip of the pickle-loaded detector still works
    val js = s"$tmp/combined.json"
    DetectorIO.save(fromPickle, js)
    assert(DetectorIO.load(js) == fromPickle)
  }

  // ---- hand-assembled pickle streams ----------------------------------

  private class Pk {
    private val out = new ByteArrayOutputStream()
    out.write(0x80); out.write(4) // PROTO 4 (no FRAME — optional)
    def op(b: Int): Pk = { out.write(b); this }
    def str(s: String): Pk = {
      val b = s.getBytes("UTF-8")
      out.write(0x8c); out.write(b.length); out.write(b); this
    }
    def global(module: String, name: String): Pk =
      str(module).str(name).op(0x93)
    def float(d: Double): Pk = {
      out.write('G')
      val bb = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.BIG_ENDIAN).putDouble(d)
      out.write(bb.array()); this
    }
    def int1(v: Int): Pk = { out.write('K'); out.write(v); this }
    def bytes(b: Array[Byte]): Pk = {
      out.write('C'); out.write(b.length); out.write(b); this
    }
    def done(): Array[Byte] = { out.write('.'); out.toByteArray }
  }
  private def EMPTY_TUPLE = ')'
  private def NEWOBJ = 0x81
  private def REDUCE = 'R'
  private def EMPTY_DICT = '}'
  private def MARK = '('
  private def SETITEMS = 'u'
  private def BUILD = 'b'
  private def TUPLE2 = 0x86
  private def NEWTRUE = 0x88

  /** `cls()` then BUILD with a `{name: <already emitted by body>}` dict. */
  private def obj(p: Pk, cls: String, module: String = "tsod.detectors")(
      state: Pk => Pk): Pk = {
    p.global(module, cls).op(EMPTY_TUPLE).op(NEWOBJ)
    p.op(EMPTY_DICT).op(MARK)
    state(p)
    p.op(SETITEMS).op(BUILD)
  }

  test("every mapped detector class parses from its pickled __dict__") {
    val hampel = obj(new Pk, "HampelDetector", "tsod.hampel") { p =>
      p.str("_window_size").int1(7).str("_threshold").float(2.5)
    }.done()
    assert(JoblibIO.fromBytes(hampel) == HampelDetector(7, 2.5))

    val diff = obj(new Pk, "DiffDetector") { p =>
      p.str("_max_diff").float(120.0).str("_direction").str("positive")
    }.done()
    assert(JoblibIO.fromBytes(diff) == DiffDetector(120.0, "positive"))

    val grad = obj(new Pk, "GradientDetector") { p =>
      p.str("_max_gradient").float(0.5).str("_direction").str("both")
    }.done()
    assert(JoblibIO.fromBytes(grad) == GradientDetector(0.5, "both"))

    val roll = obj(new Pk, "RollingStandardDeviationDetector") { p =>
      p.str("_window_size").int1(10).str("_max_std").float(60.0)
        .str("_center").op(NEWTRUE)
    }.done()
    assert(JoblibIO.fromBytes(roll) == RollingStdDevDetector(10, 60.0, center = true))

    // subclass state carries the inherited _threshold — only the window maps
    val cgrad = obj(new Pk, "ConstantGradientDetector") { p =>
      p.str("_window_size").int1(4).str("_threshold").float(1e-7)
    }.done()
    assert(JoblibIO.fromBytes(cgrad) == ConstantGradientDetector(4))
  }

  test("numpy float64 scalar thresholds (fitted-model form) decode exactly") {
    // RangeDetector whose _max is numpy.core.multiarray.scalar(
    //   numpy.dtype('f8'), <8 bytes little-endian>) — the reduce form a
    // fitted tsod detector pickles to
    val maxBytes = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(173.25).array()
    val p = new Pk
    p.global("tsod.detectors", "RangeDetector").op(EMPTY_TUPLE).op(NEWOBJ)
    p.op(EMPTY_DICT).op(MARK)
    p.str("_min").float(-5.0)
    p.str("_max")
    p.global("numpy.core.multiarray", "scalar")
    p.global("numpy", "dtype").str("f8").op(0x85).op(REDUCE) // TUPLE1 args
    p.bytes(maxBytes).op(TUPLE2).op(REDUCE)
    p.op(SETITEMS).op(BUILD)
    assert(JoblibIO.fromBytes(p.done()) ==
      RangeDetector(-5.0, 173.25, (0.0, 1.0)))
  }

  test("protocol-2 GLOBAL/BINPUT opcode forms parse too") {
    // same detector as the fixture's first child but with 'c'-style
    // GLOBAL, 'q' BINPUT, 'h' BINGET — what older joblib/python emit
    val out = new ByteArrayOutputStream()
    def raw(str: String): Unit = out.write(str.getBytes("UTF-8"))
    out.write(0x80); out.write(2) // PROTO 2
    raw("ctsod.detectors\nConstantValueDetector\n") // GLOBAL
    out.write('q'); out.write(0) // BINPUT 0
    out.write(')'); out.write(NEWOBJ)
    out.write('}'); out.write(MARK)
    out.write('X'); out.write(Array[Byte](10, 0, 0, 0), 0, 4) // BINUNICODE
    raw("_threshold")
    out.write('G')
    out.write(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.BIG_ENDIAN).putDouble(1e-7).array())
    out.write('X'); out.write(Array[Byte](12, 0, 0, 0), 0, 4)
    raw("_window_size")
    out.write('K'); out.write(3)
    raw("ub")
    out.write('h'); out.write(0) // BINGET 0 resolves the memoized global
    out.write('0') // POP it again (exercises memo + POP)
    out.write('.')
    val d = JoblibIO.fromBytes(out.toByteArray)
    assert(d == ConstantValueDetector(3, 1e-7))
  }

  test("unsupported classes fail loudly, not silently") {
    val bad = obj(new Pk, "FrobnicatorDetector") { p =>
      p.str("_x").int1(1)
    }.done()
    val e = intercept[TsodSparkException](JoblibIO.fromBytes(bad))
    assert(e.getMessage.contains("FrobnicatorDetector"))
  }
}
