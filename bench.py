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


def _dump_profile():
    """MIRA_BENCH_PROFILE=<path>: write the collected span tree + per-span
    aggregate after an IVC bench — the analog of the reference's
    build_profiling.py/analyze_profiling.py over its JSON span logs
    (/root/reference/.scripts/build_profiling.py:17-85)."""
    path = os.environ.get("MIRA_BENCH_PROFILE")
    if not path:
        return
    from mira_tpu.utils.tracing import aggregate, report

    txt = ("== span tree (>=0.05s) ==\n" + report(0.05)
           + "\n\n== per-span aggregate (>=0.01s) ==\n" + aggregate(0.01)
           + "\n")
    with open(path, "w") as f:
        f.write(txt)
    print(f"profile written to {path}", file=sys.stderr)



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
            steps = int(os.environ.get("MIRA_BENCH_IVC_STEPS", "5"))
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
            # steady state: step 1 captures tapes + builds MSM tables, step 2
            # may still land compiles — report the median of the tail so one
            # tunnel hiccup can't masquerade as the steady-state number
            # (VERDICT r2 item 3: assert flatness, report min-flat)
            tail = sorted(step_secs[2:]) if steps > 3 else sorted(step_secs)
            value = tail[len(tail) // 2]
            flat = (
                len(step_secs) >= 2
                and abs(step_secs[-1] - step_secs[-2])
                <= 0.2 * max(step_secs[-1], step_secs[-2])
            )
            if not flat:
                print(
                    f"warning: per-step times not flat: {step_secs}",
                    file=sys.stderr,
                )
            print(
                json.dumps(
                    {
                        "metric": f"ivc_fold_step_sec@k{k}/{backend}",
                        "value": round(value, 2),
                        "unit": "s/step",
                        "vs_baseline": round(7.2 / value, 4),
                        "all_steps": [round(s, 1) for s in step_secs],
                        "steady": flat,
                    }
                )
            )
            _dump_profile()
            return
        except Exception as e:  # fall back to the kernel metric
            print(f"ivc bench failed ({type(e).__name__}: {e}); "
                  "falling back to msm", file=sys.stderr)
            which = "msm"

    if which == "ivc-snarkstar":
        # VERDICT r2 item 8: SnarkStar (Groth16-verifier folding) at the
        # reference's batch-1 scale — k=19 tables, REAL ck 2^23/2^24
        # (/root/reference/examples/groth16/main.rs:47-77), real Groth16
        # proofs + true Gt cross terms, strict verify inside run().
        os.environ.setdefault("MIRA_MSM_FB_WINDOW", "4")  # table HBM x1/4
        os.environ.setdefault("MIRA_CK_DROP_ENC", "1")  # free key enc
        # keep tables for the RECURRING widths only (cross terms 2^19,
        # delta positions); one-shot zero-step commits at 2^22+ must not
        # spend minutes building multi-GB tables they use once
        os.environ.setdefault("MIRA_MSM_FB_BUDGET_MB", "2000")
        steps = int(os.environ.get("MIRA_BENCH_IVC_STEPS", "4"))
        # VERDICT r3 item 4: the reference ladder scales batch 1->32
        # (k 19->24, ck 2^23->2^28); MIRA_BENCH_SNARKSTAR_BATCH picks the
        # rung (real keys load as prefixes of the largest cached key).
        batch = int(os.environ.get("MIRA_BENCH_SNARKSTAR_BATCH", "1"))
        if batch not in (1, 2, 4, 8, 16, 32):
            raise SystemExit(
                f"MIRA_BENCH_SNARKSTAR_BATCH={batch} is not a reference "
                "ladder rung; pick one of 1/2/4/8/16/32 "
                "(/root/reference/examples/groth16/main.rs:47-77)"
            )
        from mira_tpu.workloads.snarkstar import ck_sizes, run as snarkstar_run
        from mira_tpu.workloads.snarkstar import table_sizes

        k_tab = table_sizes(batch)[0]
        k_ck = ck_sizes(batch)[0]
        step_secs = snarkstar_run(
            steps=steps, batch_size=batch, use_mock_ck=False,
            real_proofs=True
        )
        tail = sorted(step_secs[2:]) if steps > 3 else sorted(step_secs)
        value = tail[len(tail) // 2]
        # per-rung CPU-runtime baselines (BASELINE.md round-1); rungs never
        # measured on CPU get no ratio rather than a meaningless one
        cpu_base = {1: 21.5, 2: 61.5}.get(batch)
        print(
            json.dumps(
                {
                    "metric": f"snarkstar_fold_step_sec@b{batch}-k{k_tab}"
                              f"-ck{k_ck}/{backend}",
                    "value": round(value, 2),
                    "unit": "s/step",
                    "vs_baseline": (
                        round(cpu_base / value, 4) if cpu_base else None
                    ),
                    "all_steps": [round(s, 1) for s in step_secs],
                }
            )
        )
        _dump_profile()
        return

    if which == "ivc-tensorstar":
        # TensorStar (zkml program-counter folding) with the zkml pairing
        # instance shape (num_g1=23, num_g2=2, gt 3/12 —
        # /root/reference/examples/zkml/main.rs:183-190) and REAL keys at
        # the reference's k=22 (the step-folding circuit with 23 G1 + 2 G2
        # in-circuit scalar-muls and the gt fold needs >2^21 rows — we
        # verified 2^19/2^20/2^21 all overflow, matching the reference's
        # ladder choice).  NOTE: k=22 holds several ~3.2 GB witness arrays
        # live; it needs a device with ~16 GB reliably free (the shared
        # tunnel chip here fluctuates), a mesh (row-sharded witnesses), or
        # the CPU runtime (BASELINE.md round-1: full k=22 e2e on 4 cores,
        # 767 s/fold).
        os.environ.setdefault("MIRA_MSM_FB_WINDOW", "4")
        os.environ.setdefault("MIRA_MSM_FB_BUDGET_MB", "2000")
        os.environ.setdefault("MIRA_CK_DROP_ENC", "1")
        k = int(os.environ.get("MIRA_BENCH_TENSORSTAR_K", "22"))
        steps = int(os.environ.get("MIRA_BENCH_IVC_STEPS", "3"))
        from mira_tpu.workloads.tensorstar import run as tensorstar_run

        step_secs = tensorstar_run(
            repeat_count=steps, matrix_dim=128, use_mock_ck=False,
            k_override=None if k == 22 else k,  # 22 = the reference ladder
        )
        tail = sorted(step_secs[1:]) if steps > 2 else sorted(step_secs)
        value = tail[len(tail) // 2]
        print(
            json.dumps(
                {
                    "metric": f"tensorstar_fold_step_sec@k{k}/{backend}",
                    "value": round(value, 2),
                    "unit": "s/step",
                    "vs_baseline": round(767.0 / value, 4),
                    "all_steps": [round(s, 1) for s in step_secs],
                }
            )
        )
        _dump_profile()
        return

    if which == "scaling":
        _scaling_driver()
        return
    if which == "scaling-worker":
        _scaling_worker()
        return

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

    bucket_check = None
    if backend == "tpu":
        # bucket-accumulation Pallas kernel (round 4): complete on the
        # duplicate-heavy tiled bases via offset buckets
        from mira_tpu.ops.pallas_msm import msm_pallas

        def msm_fn(s, p, c):
            return msm_pallas(s, p, c, method="bucket")

        # Device-executed correctness smoke for the DEFAULT generic-base
        # commitment kernel (VERDICT r4 item 5a / ADVICE r4 medium): the
        # full adversarial case is MIRA_RUN_SLOW-gated in CI because the
        # Pallas interpreter compiles it minutes-slow on CPU; here the
        # COMPILED kernel checks against the host MSM on a duplicate/zero/
        # infinity-lane input every bench run, so the driver-recorded
        # artifact certifies the kernel the suite can't.
        chk_rng = random.Random(99)
        chk_base = [AffinePoint.random(BN254_G1, chk_rng) for _ in range(8)]
        chk_pts = [chk_base[i % 7] for i in range(255)]
        chk_pts.append(AffinePoint.identity(BN254_G1))
        chk_sc = [
            chk_rng.randrange(BN254_G1.scalar_modulus) for _ in range(256)
        ]
        chk_sc[3] = chk_sc[10]  # exact (scalar, point) duplicate pair
        chk_sc[5] = 0
        chk_ops = jacobian_ops("bn254")
        chk_out = msm_pallas(
            encode_scalars(chk_sc, BN254_G1.scalar_modulus),
            chk_ops.encode_points(chk_pts), BN254_G1, method="bucket",
        )
        chk_got = chk_ops.decode_points(tuple(c[None] for c in chk_out))[0]
        from mira_tpu.curves.host import msm_host

        chk_want = msm_host(chk_sc, chk_pts)
        if (chk_got.x.v, chk_got.y.v) != (chk_want.x.v, chk_want.y.v):
            raise SystemExit(
                "bucket kernel correctness smoke FAILED on device: "
                f"got {chk_got}, want {chk_want}"
            )
        # fixed-base kernel smoke on the same input (distinct bases only —
        # its documented precondition): table build + kernel vs host
        from mira_tpu.ops.pallas_msm import (
            msm_pallas_fixed, precompute_fixed_table,
        )

        fb_pts = [AffinePoint.random(BN254_G1, chk_rng) for _ in range(256)]
        fb_sc = [
            chk_rng.randrange(BN254_G1.scalar_modulus) for _ in range(256)
        ]
        fb_sc[0] = 0
        fb_enc = chk_ops.encode_points(fb_pts)
        fb_tab = precompute_fixed_table(fb_enc, BN254_G1, 3)
        fb_out = msm_pallas_fixed(
            encode_scalars(fb_sc, BN254_G1.scalar_modulus), fb_tab,
            BN254_G1, 3,
        )
        fb_got = chk_ops.decode_points(tuple(c[None] for c in fb_out))[0]
        fb_want = msm_host(fb_sc, fb_pts)
        if (fb_got.x.v, fb_got.y.v) != (fb_want.x.v, fb_want.y.v):
            raise SystemExit(
                "fixed-base kernel correctness smoke FAILED on device: "
                f"got {fb_got}, want {fb_want}"
            )
        bucket_check = "pass+fixed"
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
    rec = {
        "metric": f"msm_points_per_sec@2^{log_n}/{backend}",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / 1e6, 4),
    }
    if bucket_check:
        rec["bucket_check"] = bucket_check
    print(json.dumps(rec))


def _scaling_driver():
    """Scaling-efficiency harness (BASELINE.json: ops/s scaling efficiency at
    1 chip / 1 host / N hosts, >=80% target; substitutes for the rayon
    parallelism of /root/reference/src/commitment.rs:66 and src/fft.rs:131).

    Runs each sharded kernel at mesh sizes 1/2/4/8 in fresh subprocesses
    (XLA device count is fixed at backend init) and reports
    eff@n = throughput(n) / (n * throughput(1)) per kernel, one JSON line
    each.  On real multi-chip hardware the same harness measures true ICI
    scaling; on a virtual CPU mesh the devices share the host cores, so the
    absolute efficiencies understate hardware behavior once n exceeds the
    core count (noted in the output)."""
    import subprocess

    import jax

    ndev_avail = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8)]
    virtual = ndev_avail < 2  # single real device -> virtual CPU mesh
    ncores = os.cpu_count() or 1
    for kern in ("msm", "ntt", "fold"):
        thr = {}
        for n in sizes:
            env = dict(os.environ)
            env["MIRA_BENCH_METRIC"] = "scaling-worker"
            env["MIRA_SCALING_N"] = str(n)
            env["MIRA_SCALING_KERNEL"] = kern
            if virtual:
                env["JAX_PLATFORMS"] = "cpu"
                env["MIRA_FORCE_CPU"] = "1"
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + f" --xla_force_host_platform_device_count={n}"
                ).strip()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"scaling worker failed (kern={kern} n={n}): "
                      f"{r.stderr[-500:]}", file=sys.stderr)
                continue
            thr[n] = json.loads(line[-1])["throughput"]
        if 1 not in thr:
            continue
        effs = {
            n: round(thr[n] / (n * thr[1]), 4) for n in thr
        }
        top = max(n for n in thr)
        mesh_kind = "cpu-virtual" if virtual else "device"
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency@{kern}/{mesh_kind}",
                    "value": effs[top],
                    "unit": f"eff@{top}dev",
                    "vs_baseline": round(effs[top] / 0.8, 4),
                    "throughput_per_mesh": {
                        str(n): round(v, 1) for n, v in thr.items()
                    },
                    "eff_per_mesh": {str(n): effs[n] for n in effs},
                    "note": (
                        f"virtual mesh shares {ncores} host cores"
                        if virtual else "real devices"
                    ),
                }
            )
        )


def _scaling_worker():
    """One (kernel, mesh size) throughput measurement; prints
    {"throughput": ops_per_sec}."""
    import random
    import time

    import jax
    import jax.numpy as jnp

    from mira_tpu.fields.limbs import limb_field
    from mira_tpu.fields.params import BN254_FR
    from mira_tpu.parallel.mesh import AXIS, make_mesh

    n_mesh = int(os.environ["MIRA_SCALING_N"])
    kern = os.environ["MIRA_SCALING_KERNEL"]
    mesh = make_mesh(n_mesh)
    lf = limb_field(BN254_FR)
    rng = random.Random(0)

    if kern == "msm":
        from mira_tpu.curves.host import BN254_G1
        from mira_tpu.ops.commitment import CommitmentKey
        from mira_tpu.ops.msm import encode_scalars
        from mira_tpu.parallel.msm import sharded_msm

        # VERDICT r3 item 9: measure at shard sizes where the per-shard
        # engine amortizes (>= 2^16 points/shard on the 8-way mesh).  The
        # hash-derived key supplies distinct affine bases without a python
        # point-generation loop.
        log_n = int(os.environ.get("MIRA_SCALING_MSM_LOG_N", "19"))
        n = 1 << log_n
        ck = CommitmentKey.load_or_setup_cache(
            BN254_G1, log_n, "scaling")
        enc_pts = ck._enc
        sc = encode_scalars(
            [rng.randrange(BN254_G1.scalar_modulus) for _ in range(n)],
            BN254_G1.scalar_modulus,
        )

        if jax.default_backend() == "cpu":
            # host-threaded shard engine: XLA:CPU wedges >=3 concurrent
            # pure_callbacks on this 4-core host (parallel/msm.py
            # sharded_msm_host docstring); same shard decomposition,
            # engine and reduction, rayon-style
            from mira_tpu.parallel.msm import sharded_msm_host

            import numpy as np

            sc_np = np.asarray(sc)
            pts_np = tuple(np.asarray(c) for c in enc_pts)

            def run():
                sharded_msm_host(sc_np, pts_np, BN254_G1, n_mesh)
        else:
            def run():
                out = sharded_msm(sc, enc_pts, BN254_G1, mesh)
                jax.block_until_ready(out)

    elif kern == "ntt":
        from mira_tpu.parallel.ntt import distributed_ntt

        n = 1 << int(os.environ.get("MIRA_SCALING_NTT_LOG_N", "14"))
        a = lf.encode([rng.randrange(BN254_FR) for _ in range(n)])

        def run():
            jax.block_until_ready(distributed_ntt(a, BN254_FR, mesh))

    else:  # fold: row-sharded witness RLC + quadratic gate term
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n = 1 << int(os.environ.get("MIRA_SCALING_FOLD_LOG_N", "16"))
        W = lf.encode([rng.randrange(BN254_FR) for _ in range(n)])
        r = lf.encode([7])

        @jax.jit
        @partial(
            shard_map, mesh=mesh, in_specs=(P(AXIS), P(None)),
            out_specs=P(AXIS), check_vma=False,
        )
        def fold_rows(w, r_):
            folded = lf.add(w, lf.mul(r_, w))
            return lf.mul(folded, folded)

        def run():
            jax.block_until_ready(fold_rows(W, r))

    run()  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"throughput": n / dt}))


if __name__ == "__main__":
    main()
