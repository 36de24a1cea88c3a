"""10⁷-document MinHash+LSH dedup stress (round-3 verdict item 1).

Generates a JVM-side synthetic corpus with planted near-dups
(datagen.document_corpus — no Python in the row path), runs the
engine's scale dedup path (minhash_signatures → lsh_candidate_pairs →
exact-Jaccard verification), and reports one JSON line:

* wall time per stage and docs/sec;
* candidate-pair count vs the collision-rate model — planted near-dup
  pairs (= n_docs/dup_every) plus incidental band collisions. The run
  FAILS (exit 1) if candidates exceed ``model_slack ×`` the planted
  count: that would mean bucket sizes are drifting toward the all-pairs
  regime instead of staying collision-bounded.

Usage: python tools/dedup_stress.py [n_docs] [cpus]
       default 10_000_000 docs on local[32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_SLACK = 3.0


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dup_every = 20

    from rust_timeseries_spark import datagen
    from rust_timeseries_spark.operators import dedup
    from rust_timeseries_spark.session import build_spark

    spark = build_spark(
        app_name="dedup-stress", master=f"local[{cpus}]", shuffle_partitions=cpus * 4
    )
    docs = datagen.document_corpus(
        spark, n_docs, dup_every=dup_every, num_partitions=cpus * 4
    )

    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(docs, num_perm=32)
    cands = dedup.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    n_cands = cands.count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    verified = dedup.lsh_verified_pairs(
        docs, num_perm=32, bands=8, rows_per_band=4, threshold=0.5
    )
    n_verified = verified.count()
    t_verify = time.perf_counter() - t0
    spark.stop()

    planted = n_docs // dup_every
    ok = n_cands <= MODEL_SLACK * planted
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "planted_near_dup_pairs": planted,
                "candidate_pairs": n_cands,
                "candidates_over_planted": round(n_cands / max(1, planted), 3),
                "verified_pairs": n_verified,
                "candidate_stage_sec": round(t_cand, 1),
                "full_verified_pipeline_sec": round(t_verify, 1),
                "docs_per_sec_candidate_stage": round(n_docs / t_cand, 1),
                "collision_model_ok": ok,
                "cpus": cpus,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
