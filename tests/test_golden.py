"""Golden-file guard: kernel outputs must match tests/golden/kernels.json
bit-for-bit (doubles compared via big-endian hex bit patterns).

Regenerate ONLY on a deliberate semantics change: python tools/gen_golden.py
"""

import json
import os
import struct

import numpy as np
import pytest

from rust_timeseries_spark import datagen
from rust_timeseries_spark.operators import recursion as rec
from rust_timeseries_spark.stats import acd, el, hac

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden", "kernels.json")))


def f2hex(x):
    return struct.pack(">d", float(x)).hex()


def arr2hex(a):
    return [f2hex(v) for v in np.asarray(a, dtype=np.float64).ravel()]


_SERIES = {
    "trending_128_b0.5": datagen.trending_durations(128, 0.5),
    "trending_256_b1": datagen.trending_durations(256, 1.0),
    "noisy_200": datagen.noisy_durations(200),
    "tiny": np.array([1.0, 2.0, 3.0, 4.0]),
}


@pytest.mark.parametrize("case", GOLDEN["psi"], ids=lambda c: c["name"])
def test_golden_psi(case):
    import re
    m = re.match(r"(.+)_p(\d)q(\d)_(uncond_mean|sample_mean)$", case["name"])
    series_key, p, q, init_name = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
    x = _SERIES[series_key]
    omega, alpha, beta = 0.2, np.full(q, 0.15), np.full(p, 0.2)
    pi, di = rec.seed_init(init_name, omega, alpha, beta, float(x.mean()), p, q)
    psi = rec.psi_recursion_np(x, omega, alpha, beta, pi, di)
    fc = rec.forecast_np(omega, alpha, beta, np.concatenate([pi, psi])[-p:], x[-q:], 5)
    assert arr2hex(psi[:8]) == case["psi_head"]
    assert arr2hex(psi[-8:]) == case["psi_tail"]
    assert arr2hex(fc) == case["forecast"]


@pytest.mark.parametrize("case", GOLDEN["el"], ids=lambda c: c["name"])
def test_golden_el(case):
    x = {
        "normal_200": datagen.normal_residuals(200),
        "normal_500": datagen.normal_residuals(500, seed=99),
        "ar1_400": datagen.ar1_residuals(400, 0.5),
    }[case["name"]]
    r = el.escanciano_lobato_np(x)
    assert r["p_tilde"] == case["p_tilde"]
    assert f2hex(r["stat"]) == case["stat"]
    assert f2hex(r["p_value"]) == case["p_value"]


@pytest.mark.parametrize("case", GOLDEN["hac"], ids=lambda c: c["name"])
def test_golden_hac(case):
    name = case["name"]
    kern = name.split("_bw")[0]
    bw_s = name.split("_bw")[1].split("_")[0]
    bw = None if bw_s == "None" else int(bw_s)
    center = "_cTrue" in name
    ssc = "_sscTrue" in name
    sc = datagen.iid_scores(300, 4)
    m = hac.hac_covariance_np(sc, kern, bw, center, ssc)
    assert arr2hex(m) == case["cov"]


@pytest.mark.parametrize("case", GOLDEN["acd_fixed_theta"], ids=lambda c: c["name"])
def test_golden_acd_fixed_theta(case):
    x = datagen.noisy_durations(200)
    name = case["name"]
    p = int(name[1])
    q = int(name[3])
    law = "weibull" if "weibull" in name else "exponential"
    t0 = 20 if "t020" in name else None
    init = "sample_mean" if "sample_mean" in name else "uncond_mean"
    spec = acd.AcdSpec(
        p=p, q=q, law=law,
        law_params={"k": 1.5} if law == "weibull" else {},
        t0=t0, init=init,
    )
    th = np.array(case["theta"])
    assert f2hex(acd.loglik(x, th, spec)) == case["loglik"]
    assert arr2hex(acd.grad(x, th, spec)) == case["grad"]
