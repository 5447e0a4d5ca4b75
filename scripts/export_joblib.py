#!/usr/bin/env python3
"""One-shot migration: export a tsod joblib detector artifact to the
engine's JSON parameter document (DetectorIO format, "tsodspark/1").

A user of the reference persists fitted detectors with
``detector.save(path)`` → ``joblib.dump`` (reference ``tsod/base.py:13-22``,
fixture ``tests/data/combined.joblib``). The engine deliberately replaced
pickles with a portable JSON document; this script bridges existing
artifacts so saved models survive the migration:

    python3 scripts/export_joblib.py <in.joblib> <out.json>

Implementation note: tsod detectors pickle to pure-Python state (floats,
ints, lists — no numpy arrays), so the file is readable with a stub
Unpickler that fabricates placeholder classes for ``tsod.*`` — neither
joblib nor tsod needs to be importable. If an artifact DOES carry
joblib-specific numpy wrappers, we fail with a clear message instead of
guessing.
"""
import pickle
import sys


class _TsodStub:
    """Placeholder for a pickled tsod class: records its name + state."""

    _clsname = "?"

    def __init__(self, *args, **kwargs):
        self.state = {}

    def __setstate__(self, state):
        self.state = state if isinstance(state, dict) else {"__state__": state}


def _make_stub(name):
    return type(name, (_TsodStub,), {"_clsname": name})


class TsodUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "tsod" or module.startswith("tsod."):
            return _make_stub(name)
        if module.startswith("joblib"):
            raise SystemExit(
                f"artifact uses {module}.{name} (joblib numpy wrapper); "
                "re-save it from tsod with plain pickle, or install joblib "
                "and re-export")
        return super().find_class(module, name)


def _num(x):
    """Engine JSON number form: infinities/NaN as strings (graft.util.Json)."""
    x = float(x)
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    return x


def convert(obj):
    name = getattr(obj, "_clsname", None)
    if name is None:
        raise SystemExit(f"not a tsod detector: {type(obj)}")
    st = obj.state
    if name == "CombinedDetector":
        return {"type": "CombinedDetector",
                "detectors": [convert(d) for d in st["_detectors"]]}
    if name == "RangeDetector":
        q = st.get("_quantiles") or [0.0, 1.0]
        return {"type": "RangeDetector",
                "min_value": _num(st["_min"]), "max_value": _num(st["_max"]),
                "quantiles": [_num(q[0]), _num(q[1])]}
    if name == "DiffDetector":
        return {"type": "DiffDetector", "max_diff": _num(st["_max_diff"]),
                "direction": st.get("_direction", "both")}
    if name == "GradientDetector":
        return {"type": "GradientDetector",
                "max_gradient": _num(st["_max_gradient"]),
                "direction": st.get("_direction", "both")}
    if name == "RollingStandardDeviationDetector":
        return {"type": "RollingStdDevDetector",
                "window_size": int(st["_window_size"]),
                "max_std": _num(st["_max_std"]),
                "center": bool(st.get("_center", True))}
    if name == "ConstantValueDetector":
        return {"type": "ConstantValueDetector",
                "window_size": int(st["_window_size"]),
                "threshold": _num(st["_threshold"])}
    if name == "ConstantGradientDetector":
        return {"type": "ConstantGradientDetector",
                "window_size": int(st["_window_size"])}
    if name == "HampelDetector":
        return {"type": "HampelDetector",
                "window_size": int(st["_window_size"]),
                "threshold": _num(st["_threshold"]),
                "k": 1.4826, "impl": "native"}
    raise SystemExit(f"unknown tsod detector class: {name}")


def main(src, dst):
    import json
    with open(src, "rb") as f:
        obj = TsodUnpickler(f).load()
    doc = {"format": "tsodspark/1", "detector": convert(obj)}
    with open(dst, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
