"""Generate tests/golden/*.json — frozen outputs of the engine's
numerical kernels on the reference fixtures (FIXTURES.md F-2/F-3/F-4).

The pip wheel of the reference is not installable in this sandbox, so
the goldens come from the engine's own pure-numpy oracle, which mirrors
the cited reference code line-by-line (SURVEY.md §5.2 fallback). Freezing
them pins the numerics against accidental drift in later rounds: the
comparison in tests/test_golden.py is exact float equality (doubles are
serialized via hex bit patterns).

Regenerate only on a deliberate, documented semantics change:
    python tools/gen_golden.py
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_timeseries_spark import datagen  # noqa: E402
from rust_timeseries_spark.operators import recursion as rec  # noqa: E402
from rust_timeseries_spark.stats import acd, el, hac  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def f2hex(x) -> str:
    return struct.pack(">d", float(x)).hex()


def arr2hex(a) -> list[str]:
    return [f2hex(v) for v in np.asarray(a, dtype=np.float64).ravel()]


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out: dict = {}

    # --- ψ recursion paths (F-2 fixtures) --------------------------------
    psi_cases = []
    for name, x in [
        ("trending_128_b0.5", datagen.trending_durations(128, 0.5)),
        ("trending_256_b1", datagen.trending_durations(256, 1.0)),
        ("noisy_200", datagen.noisy_durations(200)),
        ("tiny", np.array([1.0, 2.0, 3.0, 4.0])),
    ]:
        for p, q, init in [(1, 1, "uncond_mean"), (1, 2, "sample_mean"), (2, 1, "uncond_mean")]:
            omega = 0.2
            alpha = np.full(q, 0.15)
            beta = np.full(p, 0.2)
            pi, di = rec.seed_init(init, omega, alpha, beta, float(x.mean()), p, q)
            psi = rec.psi_recursion_np(x, omega, alpha, beta, pi, di)
            fc = rec.forecast_np(omega, alpha, beta, np.concatenate([pi, psi])[-p:], x[-q:], 5)
            psi_cases.append(
                {
                    "name": f"{name}_p{p}q{q}_{init}",
                    "psi_head": arr2hex(psi[:8]),
                    "psi_tail": arr2hex(psi[-8:]),
                    "forecast": arr2hex(fc),
                }
            )
    out["psi"] = psi_cases

    # --- Escanciano–Lobato (F-3) ------------------------------------------
    el_cases = []
    for name, x in [
        ("normal_200", datagen.normal_residuals(200)),
        ("normal_500", datagen.normal_residuals(500, seed=99)),
        ("ar1_400", datagen.ar1_residuals(400, 0.5)),
    ]:
        r = el.escanciano_lobato_np(x)
        el_cases.append(
            {"name": name, "p_tilde": r["p_tilde"], "stat": f2hex(r["stat"]), "p_value": f2hex(r["p_value"])}
        )
    out["el"] = el_cases

    # --- HAC (F-4) ----------------------------------------------------------
    hac_cases = []
    for kern, bw, center, ssc in [
        ("bartlett", None, False, True),
        ("bartlett", 5, True, True),
        ("parzen", None, False, False),
        ("quadratic_spectral", 0, False, True),
        ("iid", None, False, True),
    ]:
        sc = datagen.iid_scores(300, 4)
        m = hac.hac_covariance_np(sc, kern, bw, center, ssc)
        hac_cases.append(
            {"name": f"{kern}_bw{bw}_c{center}_ssc{ssc}", "cov": arr2hex(m)}
        )
    out["hac"] = hac_cases

    # --- ACD loglik/grad at fixed θ (deterministic given θ) ----------------
    acd_cases = []
    x = datagen.noisy_durations(200)
    for spec, theta in [
        (acd.AcdSpec(p=1, q=1), [0.1, -0.2, 0.3]),
        (acd.AcdSpec(p=1, q=2, init="sample_mean"), [0.1, -0.2, 0.3, 0.05]),
        (acd.AcdSpec(p=1, q=1, law="weibull", law_params={"k": 1.5}), [0.1, -0.2, 0.3]),
        (acd.AcdSpec(p=1, q=1, t0=20), [0.1, -0.2, 0.3]),
    ]:
        th = np.array(theta)
        acd_cases.append(
            {
                "name": f"p{spec.p}q{spec.q}_{spec.law}_t0{spec.t0}_{spec.init}",
                "theta": theta,
                "loglik": f2hex(acd.loglik(x, th, spec)),
                "grad": arr2hex(acd.grad(x, th, spec)),
            }
        )
    out["acd_fixed_theta"] = acd_cases

    path = os.path.join(GOLDEN_DIR, "kernels.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(path, sum(len(v) for v in out.values()), "cases")


if __name__ == "__main__":
    main()
