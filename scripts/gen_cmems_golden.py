#!/usr/bin/env python3
"""Run the REAL reference (tsod) over the CMEMS fixture series decoded by
the Spark netCDF reader, producing golden masks for NetCdfSourceSpec's
end-to-end parity test.

Input : src/test/resources/golden/cmems_temp0.csv  (ts,value,qc — written
        by `sbt "Test/runMain graft.sources.DumpCmemsGolden"`)
Output: src/test/resources/golden/cmems_masks.csv  (ts,value,<mask cols>)

This closes the loop the unit fixtures can't: the reference's pandas
detectors consume the exact numbers the Spark reader feeds the Spark
detectors (34797-row real marine-obs series: 10-minute cadence, NaN
gaps, QC flags), so every mask bit must agree. xarray/netCDF4 are not
installed in this container; the decode itself is pinned separately by
NetCdfSourceSpec's independent byte-level spot checks.
"""
import sys, types, os

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
from tsod.detectors import (RangeDetector, DiffDetector, GradientDetector,
                            RollingStandardDeviationDetector,
                            ConstantValueDetector, ConstantGradientDetector,
                            CombinedDetector)
from tsod.hampel import HampelDetector

GOLDEN = os.path.join(os.path.dirname(__file__), "..",
                      "src", "test", "resources", "golden")

# round_trip parser: the default C float parser can be off by one ulp,
# which would make the reference detect() consume (and the masks CSV
# echo) different doubles than the Spark reader produced
src = pd.read_csv(f"{GOLDEN}/cmems_temp0.csv", float_precision="round_trip")
idx = pd.DatetimeIndex(pd.to_datetime(src["ts"]))
s = pd.Series(src["value"].astype(float).values, index=idx)
qc = pd.Series(src["qc"].values, index=idx)
good = s[qc == 1]

configs = {
    "range_fit_goodqc": RangeDetector().fit(good),
    "range_fitq_goodqc": RangeDetector(quantiles=[0.001, 0.999]).fit(good),
    "range_10_15": RangeDetector(min_value=10, max_value=15),
    "diff_0p1": DiffDetector(max_diff=0.1),
    "grad_1em4": GradientDetector(max_gradient=1e-4),
    "rollstd_w10_0p05": RollingStandardDeviationDetector(window_size=10, max_std=0.05),
    "const_w3_1em4": ConstantValueDetector(3, 1e-4),
    "cgrad_w3": ConstantGradientDetector(3),
    "hampel_w5_t3": HampelDetector(window_size=5, threshold=3),
    "combined_const_range18": CombinedDetector(
        [ConstantValueDetector(), RangeDetector(max_value=18.0)]),
}

out = pd.DataFrame({
    "ts": idx.strftime("%Y-%m-%dT%H:%M:%S"),
    "value": ["" if pd.isna(v) else repr(float(v)) for v in s.values],
})
for name, det in configs.items():
    mask = np.asarray(det.detect(s), dtype=bool)
    assert len(mask) == len(s), name
    out[name] = mask.astype(int)
    print(f"{name}: {mask.sum()} anomalies / {len(s)}")

out.to_csv(f"{GOLDEN}/cmems_masks.csv", index=False)
print("wrote", f"{GOLDEN}/cmems_masks.csv")
