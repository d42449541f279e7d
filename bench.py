"""Benchmark harness: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: MSM throughput (points/s) on the available accelerator —
the dominant kernel of the fold step (SURVEY.md §6 / BASELINE.md north star).
`vs_baseline` is measured throughput / 1e6 points/s, the interim per-chip
roofline target recorded in BASELINE.md (the reference publishes no absolute
numbers).

Env knobs: MIRA_BENCH_LOG_N (default 16), MIRA_BENCH_METRIC=msm|ntt.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    # persistent compile cache to amortize across rounds
    os.makedirs(".jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    backend = jax.default_backend()
    log_n = int(os.environ.get("MIRA_BENCH_LOG_N", "16" if backend != "cpu" else "10"))
    which = os.environ.get("MIRA_BENCH_METRIC", "msm")
    n = 1 << log_n

    import random

    from mira_tpu.fields.limbs import limb_field
    from mira_tpu.fields.params import BN254_FR

    rng = random.Random(0)
    lf = limb_field(BN254_FR)

    if which == "fold":
        # per-fold hot path: witness RLC fold + row-parallel homogeneous gate
        # evaluation (the reference's criterion fold_step benches measure the
        # same inner work, benches/poseidon/main.rs:161-199)
        import jax.numpy as jnp

        from mira_tpu.workloads.demo import demo_structure

        k = min(log_n, 17)
        S, advice = demo_structure(k)
        ev = S._evaluator("homogeneous")
        nrow = 1 << k
        w_vals = []
        for col in advice:
            w_vals.extend(col + [0] * (nrow - len(col)))
        W0 = lf.encode(w_vals)
        challenges = lf.encode([12345, 1])
        r = lf.encode([991])

        @jax.jit
        def fold_eval(W0_, r_):
            Wf = lf.add(W0_, lf.mul(r_, W0_))
            return ev._run(ev.static_cols, (Wf,), (), challenges)

        jax.block_until_ready(fold_eval(W0, r))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fold_eval(W0, r)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        value = nrow / dt
        print(
            json.dumps(
                {
                    "metric": f"fold_rows_per_sec@2^{k}/{backend}",
                    "value": round(value, 1),
                    "unit": "rows/s",
                    "vs_baseline": round(value / 1e7, 4),
                }
            )
        )
        return

    if which == "ntt":
        from mira_tpu.ops.ntt import ntt

        a = lf.encode([rng.randrange(BN254_FR) for _ in range(n)])
        ntt(a, BN254_FR).block_until_ready()  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = ntt(a, BN254_FR)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        value = n / dt
        print(
            json.dumps(
                {
                    "metric": f"ntt_elems_per_sec@2^{log_n}/{backend}",
                    "value": round(value, 1),
                    "unit": "elems/s",
                    "vs_baseline": round(value / 1e8, 4),
                }
            )
        )
        return

    from mira_tpu.curves.host import BN254_G1, AffinePoint
    from mira_tpu.curves.jax_curve import jacobian_ops
    from mira_tpu.ops.msm import encode_scalars, msm

    if backend == "tpu":
        # fused Pallas kernel: accumulators stay in VMEM across all 254 bits
        from mira_tpu.ops.pallas_msm import msm_pallas as msm_fn
    else:
        msm_fn = msm

    ops = jacobian_ops("bn254")
    # distinct points (tiled but materialized -- a stride-0 broadcast of one
    # point lets XLA collapse the whole per-lane computation)
    base_n = min(n, 1024)
    bases = [AffinePoint.random(BN254_G1, rng) for _ in range(base_n)]
    pts = ops.encode_points(bases)
    import jax.numpy as jnp

    pts = tuple(jnp.tile(c, (n // base_n, 1)) for c in pts)
    scalars = encode_scalars(
        [rng.randrange(BN254_G1.scalar_modulus) for _ in range(n)],
        BN254_G1.scalar_modulus,
    )
    scalars2 = encode_scalars(
        [rng.randrange(BN254_G1.scalar_modulus) for _ in range(n)],
        BN254_G1.scalar_modulus,
    )

    import numpy as np

    out = msm_fn(scalars, pts, BN254_G1)  # compile + run
    jax.block_until_ready(out)
    [np.asarray(c) for c in out]
    # time with forced host materialization (block_until_ready alone has been
    # observed returning early on some axon-tunnel dispatches)
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = msm_fn(scalars2, pts, BN254_G1)
        [np.asarray(c) for c in out]
    dt = (time.perf_counter() - t0) / reps
    value = n / dt
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_sec@2^{log_n}/{backend}",
                "value": round(value, 1),
                "unit": "points/s",
                "vs_baseline": round(value / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
