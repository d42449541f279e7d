"""Benchmark harness: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: MSM throughput (points/s) on the available accelerator —
the dominant kernel of the fold step (SURVEY.md §6 / BASELINE.md north star).
`vs_baseline` is measured throughput / 1e6 points/s, the interim per-chip
roofline target recorded in BASELINE.md (the reference publishes no absolute
numbers).

Env knobs: MIRA_BENCH_LOG_N (default 16), MIRA_BENCH_METRIC=msm|ntt|fold|poseidon.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_accelerator(timeout_s: int = 150) -> bool:
    """The axon TPU tunnel can be DOWN in a way that makes jax.devices()
    block forever (observed: >9 min with a thread parked in ep_poll).
    Probe backend init in a subprocess with a timeout; on failure fall back
    to the CPU backend so the bench always produces its JSON line."""
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_accelerator():
        # deregister the axon PJRT plugin before any backend initializes
        # (mira_tpu/__init__.py MIRA_FORCE_CPU dance)
        os.environ["MIRA_FORCE_CPU"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import mira_tpu  # noqa: F401  (applies the deregistration)

    import jax

    # persistent compile cache to amortize across rounds (per-machine dir:
    # cross-machine XLA:CPU AOT loads SIGILL — utils/compile_cache.py)
    try:
        from mira_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
        )
    except Exception:
        pass

    backend = jax.default_backend()
    log_n = int(os.environ.get("MIRA_BENCH_LOG_N", "16" if backend != "cpu" else "10"))
    which = os.environ.get("MIRA_BENCH_METRIC", "ivc")
    n = 1 << log_n

    if which == "ivc":
        # North-star metric (VERDICT r1 item 5): IVC fold-step latency with a
        # REAL (binding) commitment key — the analog of the reference's
        # criterion fold_1_step/fold_2_step benches
        # (/root/reference/benches/poseidon/main.rs:161-199).  Reports the
        # steady-state (last) step; verify correctness is covered by
        # tests/test_ivc.py and the workload drives, not timed here (the
        # reference's bench folds without deciding too).  vs_baseline is
        # measured against the round-1 CPU/mock-key 7.2 s/step record
        # (BASELINE.md) — >1.0 means beating it.
        try:
            k = int(os.environ.get("MIRA_BENCH_IVC_K", "17"))
            steps = int(os.environ.get("MIRA_BENCH_IVC_STEPS", "3"))
            from mira_tpu.curves.host import BN254_G1, GRUMPKIN
            from mira_tpu.ivc.ivc import IVC
            from mira_tpu.ivc.public_params import CircuitSide, PublicParams
            from mira_tpu.ivc.step_circuit import TrivialCircuit
            from mira_tpu.ops.commitment import CommitmentKey
            from mira_tpu.workloads.poseidon import PoseidonStepCircuit

            ck1 = CommitmentKey.load_or_setup_cache(BN254_G1, k + 4, "bn256")
            ck2 = CommitmentKey.load_or_setup_cache(GRUMPKIN, k + 4, "grumpkin")
            sc1 = PoseidonStepCircuit(BN254_G1.scalar_modulus, 1)
            sc2 = TrivialCircuit(arity=1)
            pp = PublicParams(
                CircuitSide(sc1, ck1, k), CircuitSide(sc2, ck2, k),
                BN254_G1, GRUMPKIN,
            )
            ivc = IVC(pp, sc1, [0], sc2, [0])
            step_secs = []
            for _ in range(steps):
                t0 = time.perf_counter()
                ivc.fold_step()
                step_secs.append(time.perf_counter() - t0)
            value = step_secs[-1]
            print(
                json.dumps(
                    {
                        "metric": f"ivc_fold_step_sec@k{k}/{backend}",
                        "value": round(value, 2),
                        "unit": "s/step",
                        "vs_baseline": round(7.2 / value, 4),
                        "all_steps": [round(s, 1) for s in step_secs],
                    }
                )
            )
            return
        except Exception as e:  # fall back to the kernel metric
            print(f"ivc bench failed ({type(e).__name__}: {e}); "
                  "falling back to msm", file=sys.stderr)
            which = "msm"

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

        k = min(log_n, 20)
        S, advice = demo_structure(k)
        nrow = 1 << k
        w_vals = []
        for col in advice:
            w_vals.extend(col + [0] * (nrow - len(col)))
        W0 = lf.encode(w_vals)

        impl = os.environ.get("MIRA_BENCH_FOLD_IMPL")
        if impl is None:
            impl = "pallas" if backend != "cpu" else "xla"

        if impl == "pallas":
            # fused multi-point sweep: P(W1 + j*W2) at all cross-term
            # points in one pass (polynomial/pallas_evaluator.py)
            import numpy as np

            W2 = lf.mul(W0, lf.encode([3])[0][None])
            js = [1, 2, 3, 4, 5]
            ch1, ch2 = [12345, 1], [777, 1]
            pev = S._pallas_fold_evaluator()

            def run_once():
                out = pev.fold_eval_multi((W0,), (W2,), js, ch1, ch2)
                np.asarray(out[0, :1, 0])

            run_once()  # compile
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                run_once()
            dt = (time.perf_counter() - t0) / reps
            value = len(js) * nrow / dt
        else:
            ev = S._evaluator("homogeneous")
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

    if which == "poseidon":
        # batched 2-to-1 sponge hashes (Merkle-level workload) on device
        import jax.numpy as jnp
        import numpy as np

        impl = os.environ.get("MIRA_BENCH_POSEIDON_IMPL")
        if impl is None:
            # fused VMEM-resident Pallas sponge on TPU; XLA batched version
            # (one HBM round-trip per CIOS step) elsewhere
            impl = "pallas" if backend != "cpu" else "xla"
        if impl == "pallas":
            from mira_tpu.ops.pallas_poseidon import (
                poseidon_hash_batch_pallas as hash_batch,
            )
        else:
            from mira_tpu.ops.poseidon_device import (
                poseidon_hash_batch as hash_batch,
            )

        vals = lf.encode(
            [rng.randrange(BN254_FR) for _ in range(2 * n)]
        ).reshape(n, 2, 16)
        out = hash_batch(vals, BN254_FR)  # compile + run
        np.asarray(out[:1])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = hash_batch(vals, BN254_FR)
            np.asarray(out[:1])
        dt = (time.perf_counter() - t0) / reps
        value = n / dt
        print(
            json.dumps(
                {
                    "metric": f"poseidon_hashes_per_sec@2^{log_n}/{backend}",
                    "value": round(value, 1),
                    "unit": "hashes/s",
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

    if backend == "cpu":
        # CPU-host fallback (tunnel down / forced): the runtime's real CPU
        # commitment path is the native C++ Pippenger, not XLA:CPU emulation
        from mira_tpu.ops.native_msm import available as _nmsm_ok

        if _nmsm_ok():
            from mira_tpu.ops.native_msm import msm_native

            base_n = min(n, 1024)
            bases = [AffinePoint.random(BN254_G1, rng) for _ in range(base_n)]
            pts_host = [bases[i % base_n] for i in range(n)]
            vals = [rng.randrange(BN254_G1.scalar_modulus) for _ in range(n)]
            msm_native(vals, pts_host)  # warm (thread pool, tables)
            reps = 2
            t0 = time.perf_counter()
            for _ in range(reps):
                msm_native(vals, pts_host)
            dt = (time.perf_counter() - t0) / reps
            value = n / dt
            print(
                json.dumps(
                    {
                        "metric": f"msm_points_per_sec@2^{log_n}/cpu-native",
                        "value": round(value, 1),
                        "unit": "points/s",
                        "vs_baseline": round(value / 1e6, 4),
                    }
                )
            )
            return

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
