#!/usr/bin/env python3
"""Generate golden detector masks by running the REAL reference (tsod)
over fixture series, for ScalaTest parity tests.

Writes src/test/resources/golden/<series>.csv with columns:
ts,value,<one column per detector config: 0/1 mask>
plus golden/fitted_params.json with fit() outputs.

numba is absent in this container; the reference's @jit is stubbed to a
no-op decorator, so hampel runs as pure python (identical semantics).
"""
import sys, types, json, os

fake = types.ModuleType("numba")
fake.jit = lambda *a, **k: (lambda f: f)
sys.modules["numba"] = fake
try:
    import joblib  # noqa
except ImportError:
    jb = types.ModuleType("joblib"); jb.dump = jb.load = None
    sys.modules["joblib"] = jb
sys.path.insert(0, "/root/reference")

import warnings
warnings.simplefilter("ignore")
import numpy as np
import pandas as pd
import tsod
from tsod.detectors import (RangeDetector, DiffDetector, GradientDetector,
                            RollingStandardDeviationDetector,
                            ConstantValueDetector, ConstantGradientDetector,
                            CombinedDetector)
from tsod.hampel import HampelDetector

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

def hourly(values, start="2020"):
    idx = pd.date_range(start=start, periods=len(values), freq="1h")
    return pd.Series(np.asarray(values, dtype=float), index=idx)

nan = np.nan

# ---- fixture series ----------------------------------------------------
series = {}
series["range_normal"] = hourly([0, nan, 1, 0, 2, nan, 3.14, 4])
series["range_abnormal"] = hourly([-1.0, nan, 2.0, nan, 1.0, 0.0, 4.1, 10.0])
series["cgrad_normal"] = hourly([0, nan, 1, 1.1, 1.4, 1.5555, 3.14, 4])
series["cgrad_abnormal"] = hourly([-1, 2.0, 2.1, 2.2, 2.3, 2.4, 4, 10])
series["const_abnormal"] = hourly([-1, nan, 1, 1, 1, 1, 4, 10])
series["jump_normal"] = hourly([-0.5,-0.6,0.6,0.6,0.1,0.6,0.4,0.8,0.7,1.5,1.6,1.1,0.3,2.1,0.7,0.3,-1.7,-0.3,0.0,-1.0])
series["jump_abnormal"] = hourly([-0.5,-1.5,1.5,0.6,0.1,0.6,0.4,0.8,0.7,1.5,1.6,1.1,0.3,2.1,0.7,0.3,-1.7,-0.3,0.0,-1.0])

# random walk with injected outliers (tests/data_generation.py semantics)
rng = np.random.RandomState(42)
steps = rng.choice([-1.0, 1.0], size=120)
walk = steps.cumsum()
oidx = rng.choice(np.arange(10, 110), size=12, replace=False)
walk[oidx] += rng.choice([-10.0, 10.0], size=12)
walk[[15, 40, 41, 42, 77]] = [walk[15], nan, nan, nan, nan]
series["walk"] = hourly(walk)

# irregular cadence: exercises gradient dt (seconds vary), incl. sub-hour
vals = np.sin(np.linspace(0, 6, 60)) * 3
vals[7] = 25.0; vals[23] = -18.0
vals[30:35] = 1.25  # constant stretch
vals[40:46] = np.linspace(2.0, 3.0, 6)  # linear stretch
vals[[5, 18, 50]] = nan
t0 = pd.Timestamp("2021-03-01T00:00:00")
deltas = rng.choice([60, 120, 300, 900, 3600, 7. * 60], size=60).astype(float)
ts = t0 + pd.to_timedelta(np.cumsum(deltas), unit="s")
series["irregular"] = pd.Series(vals, index=pd.DatetimeIndex(ts))

# seeded normal fixture for quantile fit (tests/test_detectors.py:140-166)
nrm = pd.Series(rng.normal(size=1000),
                index=pd.date_range("2020", periods=1000, freq="1h"))
nrm.iloc[42] = -6.5; nrm.iloc[560] = 10.5
tst = pd.Series(np.random.RandomState(7).normal(size=1000),
                index=pd.date_range("2020", periods=1000, freq="1h"))
tst.iloc[142] = -4.5; tst.iloc[960] = 5.5
series["quant_train"] = nrm
series["quant_test"] = tst

# ---- detector configs ---------------------------------------------------
def D(**kw):
    return kw

configs = {
    "range_0_2": lambda: RangeDetector(min_value=0, max_value=2),
    "range_min3": lambda: RangeDetector(min_value=3),
    "range_max3": lambda: RangeDetector(max_value=3),
    "diff_0p5": lambda: DiffDetector(max_diff=0.5),
    "diff_0p5_pos": lambda: DiffDetector(max_diff=0.5, direction="positive"),
    "diff_0p5_neg": lambda: DiffDetector(max_diff=0.5, direction="negative"),
    "grad_1em4": lambda: GradientDetector(max_gradient=1e-4),
    "grad_1em4_pos": lambda: GradientDetector(max_gradient=1e-4, direction="positive"),
    "rollstd_w4_0p5": lambda: RollingStandardDeviationDetector(window_size=4, max_std=0.5),
    "rollstd_w5_0p5_right": lambda: RollingStandardDeviationDetector(window_size=5, max_std=0.5, center=False),
    "rollstd_w10_1": lambda: RollingStandardDeviationDetector(window_size=10, max_std=1.0),
    "const_w3_1em4": lambda: ConstantValueDetector(3, 1e-4),
    "const_w5_1em7": lambda: ConstantValueDetector(5, 1e-7),
    "cgrad_w3": lambda: ConstantGradientDetector(3),
    "cgrad_w5": lambda: ConstantGradientDetector(5),
    "hampel_w5_t3": lambda: HampelDetector(window_size=5, threshold=3),
    "hampel_w3_t2": lambda: HampelDetector(window_size=3, threshold=2.0),
    "hampel_w1_t0": lambda: HampelDetector(window_size=1, threshold=0),
    "combined_const_range2": lambda: CombinedDetector(
        [ConstantValueDetector(), RangeDetector(max_value=2.0)]),
}

# fitted detectors: (mask column name, train series key, constructor, param attr names)
fitted = {
    "fit_range_on_range_normal": ("range_normal", lambda: RangeDetector(), ["_min", "_max"]),
    "fit_range_q_on_quant_train": ("quant_train", lambda: RangeDetector(quantiles=[0.001, 0.999]), ["_min", "_max"]),
    "fit_diff_on_range_normal": ("range_normal", lambda: DiffDetector(), ["_max_diff"]),
    "fit_diff_on_walk": ("walk", lambda: DiffDetector(), ["_max_diff"]),
    "fit_grad_on_jump_normal": ("jump_normal", lambda: GradientDetector(), ["_max_gradient"]),
    "fit_grad_on_irregular": ("irregular", lambda: GradientDetector(), ["_max_gradient"]),
    "fit_rollstd_w10_on_quant_train": ("quant_train", lambda: RollingStandardDeviationDetector(window_size=10), ["_max_std"]),
    "fit_rollstd_w4_on_walk": ("walk", lambda: RollingStandardDeviationDetector(window_size=4), ["_max_std"]),
}

params_out = {}
for name, (train_key, ctor, attrs) in fitted.items():
    det = ctor().fit(series[train_key])
    params_out[name] = {a: (None if pd.isna(getattr(det, a)) else float(getattr(det, a)))
                        for a in attrs}

with open(f"{OUT}/fitted_params.json", "w") as f:
    json.dump(params_out, f, indent=1)

for sname, s in series.items():
    out = pd.DataFrame({
        "ts": s.index.strftime("%Y-%m-%dT%H:%M:%S"),
        "value": ["" if pd.isna(v) else repr(float(v)) for v in s.values],
    })
    for cname, ctor in configs.items():
        mask = ctor().detect(s)
        mask = np.asarray(mask, dtype=bool)  # hampel returns a list
        assert len(mask) == len(s), (sname, cname)
        out[cname] = mask.astype(int)
    # fitted detectors applied to every series too
    for fname, (train_key, ctor, attrs) in fitted.items():
        det = ctor().fit(series[train_key])
        mask = np.asarray(det.detect(s), dtype=bool)
        out[fname] = mask.astype(int)
    out.to_csv(f"{OUT}/{sname}.csv", index=False)
    print(sname, len(s), "rows,", out.shape[1] - 2, "mask cols")

# sanity: reference's own test expectations
rd = RangeDetector().fit(series["range_normal"])
assert list(rd.detect(series["range_abnormal"])) == [True,False,False,False,False,False,True,True]
assert sum(RangeDetector(0,2).detect(series["range_normal"])) == 2
assert sum(RangeDetector(min_value=3).detect(series["range_normal"])) == 4
assert sum(RangeDetector(max_value=3).detect(series["range_normal"])) == 2
assert sum(ConstantGradientDetector(3).detect(series["cgrad_abnormal"])) == 5
assert sum(ConstantValueDetector(3, 1e-4).detect(series["const_abnormal"])) == 4
gd = GradientDetector().fit(series["jump_normal"])
m = gd.detect(series["jump_abnormal"])
assert sum(m) == 1 and bool(m.iloc[2])
qd = RangeDetector(quantiles=[0.001, 0.999]).fit(series["quant_train"])
assert sum(qd.detect(series["quant_test"])) == 2
print("reference self-checks OK")
