"""Benchmark: sparse neighborhood-aggregation (SpMM) forward+backward edges/s/chip.

This is BASELINE.json's north-star metric — the reference's hot kernel is
torch_sparse.spmm on CUDA (MultiDismantler_net_graphsage.py:139-377, loss
MultiDismantler_torch.py:420); ours is the packed Pallas band kernel
(mdcommunity_tpu/ops/band_pallas.py: lane-packed node pairs, single-DMA
double-buffered h windows, in-kernel rank-1 liveness scales and mirror
expansion) over block-band adjacency storage (ops/dense_band.py), with bf16
activation storage and f32 accumulation — the production TPU configuration
(exact-parity tested against the f32 XLA engine in tests/test_band_pallas.py;
the measured engine A/B lives in scripts/tune_band_packed.py).

Workload: a 2^20-node layer of a locality-ordered duplex graph — circular
power-law offsets with tail exponent 2.5, matching the GMM generator's
connection kernel P(d) ~ d^(-1/T), T=0.4 (GMM.py:6-68 / Hyperbolic.py:101-117)
after angular ordering — 2^23 directed (symmetrized) edges, 64-dim features
(the model family's embedding width), 10% of nodes removed (mid-dismantling
liveness mask).  Timed: value_and_grad of a scalar loss through the SpMM,
i.e. forward + backward, K iterations chained inside one jit (a host sync via
float() is the only reliable fence on this backend), per-iteration time taken
as the SLOPE of median chain time across two K values — any constant
per-call effect of the tunnel (claim, streaming, caching) cancels in the
slope (see _measure; scripts/bench_kscaling.py is the validation harness).

vs_baseline: the reference publishes no edges/s number (it is a single-GPU
Python capsule); the denominator 6.0e8 edges/s is a documented estimate of
torch_sparse.spmm fwd+bwd throughput on the reference's V100 at D=64 fp32
(~900 GB/s HBM / ~1.5 KB moved per edge over fwd+bwd).  Values > 1 beat it.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def ring_powerlaw_edges(n, e, rng, alpha=2.5, scale=8.0):
    """Directed edges with circular power-law offsets (locality-ordered
    geometric graph surrogate; alpha matches GMM's T=0.4 tail)."""
    src = rng.integers(0, n, e).astype(np.int64)
    off = (scale * (rng.pareto(alpha, e) + 1.0)).astype(np.int64)
    off = np.minimum(off, n // 2 - 1) * rng.choice(np.array([-1, 1]), e)
    dst = (src + off) % n
    return src, dst


# v5e per-chip peaks (public spec: 819 GB/s HBM, 197 bf16 TFLOP/s — the
# kernel's dots run bf16 with f32 accumulation, so the bf16 number applies
# even though the base is stored int8).
V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12
# MEASURED practical stream ceiling of this chip (r04 probe,
# results_tpu/chip_r04/hbm_roof.json): an XLA f32 read+write stream tops out
# at ~657 GB/s and a minimal Pallas int8 read stream at ~757-811 GB/s — the
# datasheet 819 is not reachable by any real mixed-stream kernel.  The sol
# line reports fractions of BOTH roofs; the practical one is what a perfect
# kernel with this traffic mix could actually hit.
V5E_HBM_PRACTICAL = 657e9


def sol_model(pk, dbg, dim, h_bytes):
    """Speed-of-light model of ONE packed-kernel pass (fwd OR bwd — the
    backward is the same kernel with scales swapped, so its cost is
    identical).

    HBM bytes actually moved, from the kernel's own structure
    (mdcommunity_tpu/ops/band_pallas.py):
      base   int8 [nb, 2, S/2, W2]      — streamed once per pass
      h      windows [WIN, 2D] per prog — whole packed h + 2B-row halos
      out    [pad_n/2, 2D]              — written once
      scales 2 f32 vectors pre-gathered into per-program windows
      mirror oh/geT int8 one-hots + a SECOND full h read for compaction
             (mirror_compact's einsum streams h2 again) + small sub buffers
    FLOPs: the band dots are dense [2Sh, W2/2]x[W2/2, D] pairs per block —
    they multiply every stored band slot, occupied or not, which is exactly
    why edges/s is density-dependent while bytes/s and wall time are not.
    """
    nb, S, B, Cp, W2 = pk.nb, pk.S, pk.B, pk.Cp, pk.W2
    pad_n = pk.pad_n
    n_prog = nb // pk.G
    WIN = (pk.G * S + 2 * B) // 2

    b_base = pk.base_pk.nbytes                      # int8 band
    b_h = n_prog * WIN * 2 * dim * h_bytes          # windows (h + halo reads)
    b_out = pad_n * dim * h_bytes
    b_scales = 2 * (pad_n * 4)                      # colw+roww windows, f32
    b_mirror = 0
    fl_mirror = 0
    if Cp:
        b_mirror = (
            pk.oh.nbytes + pk.geT.nbytes            # one-hot operands
            + pad_n * dim * h_bytes                 # compaction re-reads h
            + 2 * nb * Cp * dim * 4                 # sub write + kernel read
        )
        # compaction einsum + in-kernel expansion dot
        fl_mirror = 2 * nb * Cp * (S // 2) * 2 * dim + 2 * nb * S * Cp * dim
    bytes_pass = b_base + b_h + b_out + b_scales + b_mirror
    flops_pass = 2 * nb * S * W2 * dim + fl_mirror
    return {
        "bytes_pass": bytes_pass,
        "flops_pass": flops_pass,
        "base_frac": round(b_base / bytes_pass, 3),
        "h_frac": round((b_h + b_out + (pad_n * dim * h_bytes if Cp else 0))
                        / bytes_pass, 3),
    }


def _start_watchdog(timeout_s=720):
    """Fork a watchdog CHILD process (not SIGALRM: a wedged device op that
    blocks inside a C extension holding the GIL never returns control to the
    interpreter, so an in-process signal handler would never run).  The child
    shares our stdout fd; if we have not killed it within timeout_s it writes
    the one required JSON error line directly to fd 1 and SIGKILLs us so the
    driver is never hung.  Returns the child pid (kill it on success)."""
    import os
    import signal

    parent = os.getpid()
    pid = os.fork()
    if pid:
        return pid
    # child: detach from any inherited SIGALRM etc., then arm
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    time.sleep(timeout_s)
    try:
        os.kill(parent, 0)  # still alive -> wedged
    except OSError:
        os._exit(0)
    msg = (
        json.dumps(
            {
                "metric": "spmm_fwdbwd_edges_per_s_per_chip",
                "value": 0.0,
                "unit": "edges/s",
                "vs_baseline": 0.0,
                "error": "tpu unreachable (watchdog fired)",
            }
        )
        + "\n"
    )
    os.write(1, msg.encode())
    os.kill(parent, signal.SIGKILL)
    os._exit(0)


def _measure(e, n=1 << 20, dim=64, S=256, B=128, G=32, Ks=(8, 40), seed=0):
    """Build the workload at `e` directed edges and time the fwd+bwd chain
    by K-SCALING: run the chain at each K in Ks and take the slope of
    median-time vs K as the per-iteration time.

    Why a slope and not one K with an RTT subtraction: the r02 methodology
    (time one K=32 chain, subtract a nop round-trip) reported 2.8x the
    physical HBM peak on this tunnel backend — per-call constant effects
    (claim, streaming, result caching) are neither zero nor equal to the nop
    RTT, and any constant-per-call effect cancels exactly in the slope (the
    r03 K-sweep at K=8/32/96 is linear to <0.2%, scripts/bench_kscaling.py).
    Returns (edges_per_s, t_iter_s, sol_dict)."""
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.band_pallas import (
        pack_band,
        pack_rows,
        spmm_band_packed,
    )
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

    rng = np.random.default_rng(seed)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.int8)
    pk = pack_band(dbg, G=G)

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h2 = pack_rows(
        jnp.asarray(rng.standard_normal((dbg.pad_n, dim)).astype(np.float32))
    ).astype(jnp.bfloat16)

    def make_chain(K):
        @jax.jit
        def chain(pk, dbg, row, col, h2):
            grad_step = jax.grad(
                lambda x2: jnp.sum(
                    jnp.square(
                        spmm_band_packed(pk, dbg, row, col, x2).astype(
                            jnp.float32
                        )
                    )
                )
                * 1e-6
            )

            def body(i, x2):
                return x2 + grad_step(x2) / jnp.bfloat16(1.0 + i)

            return jax.lax.fori_loop(0, K, body, h2)

        return chain

    # result sync via host scalar transfer; block_until_ready does not fence
    # execution on the tunnel backend
    med = {}
    for K in Ks:
        chain = make_chain(K)
        float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        med[K] = float(np.median(ts))

    from mdcommunity_tpu.utils.profiling import ThroughputMeter

    k0, k1 = Ks[0], Ks[-1]
    t_meas_iter = (med[k1] - med[k0]) / (k1 - k0)
    if t_meas_iter <= 0:
        # host timing noise can only produce a non-positive K-slope when the
        # chain time is not execution-bound; a negative edges/s in the
        # required JSON line would be garbage — emit the error marker
        # instead (same convention as the watchdog; ADVICE r3)
        print(json.dumps({
            "metric": "spmm_fwdbwd_edges_per_s_per_chip",
            "value": 0,
            "unit": "edges/s",
            "vs_baseline": 0,
            "error": f"non-positive K-slope ({t_meas_iter:.2e}s/iter): "
                     f"chain medians {med}",
        }))
        sys.exit(1)
    meter = ThroughputMeter("edges")
    meter.add(e2 * (k1 - k0), med[k1] - med[k0])

    # ---- speed-of-light accounting (BASELINE.json: "edges/s ... at
    # speed-of-light per chip").  One chain iteration = fwd pass + bwd pass
    # + the elementwise glue (cotangent 2y·1e-6: read y / write g2; update
    # x2 += dh2/c: read x2, dh2 / write x2 — 5 h-sized streams, XLA-fused).
    sol = sol_model(pk, dbg, dim, jnp.dtype(jnp.bfloat16).itemsize)
    glue = 5 * dbg.n_blocks * dbg.S * dim * 2
    bytes_iter = 2 * sol["bytes_pass"] + glue
    flops_iter = 2 * sol["flops_pass"]
    t_hbm = bytes_iter / V5E_HBM_BYTES_PER_S
    t_mxu = flops_iter / V5E_BF16_FLOPS
    sol_dict = {
        # fraction of the v5e roofline this run achieves (1.0 = at speed of
        # light for the binding resource)
        "sol_fraction": round(
            max(t_hbm, t_mxu) / max(t_meas_iter, 1e-12), 3
        ),
        "bottleneck": "hbm" if t_hbm >= t_mxu else "mxu",
        "achieved_hbm_gbps": round(bytes_iter / t_meas_iter / 1e9, 1),
        "peak_hbm_gbps": round(V5E_HBM_BYTES_PER_S / 1e9, 1),
        "practical_hbm_gbps": round(V5E_HBM_PRACTICAL / 1e9, 1),
        "sol_fraction_practical": round(
            (bytes_iter / t_meas_iter) / V5E_HBM_PRACTICAL, 3
        ),
        "achieved_tflops": round(flops_iter / t_meas_iter / 1e12, 2),
        "peak_bf16_tflops": round(V5E_BF16_FLOPS / 1e12, 1),
        # traffic composition of one kernel pass: the int8 base vs the bf16
        # h/out streams — says where the next 2x lives (base_frac near 2/3
        # means int4/bitpacked base storage is the lever)
        "base_frac": sol["base_frac"],
        "h_frac": sol["h_frac"],
        # band occupancy of THIS workload: edges/s scales linearly with it
        # while wall time and bytes/s do not (dense band storage) — the
        # headline number is one operating point, not a constant
        "band_density": round(e2 / (dbg.pad_n * dbg.W2), 4),
    }
    return meter.rate, t_meas_iter, sol_dict


def main(density_sweep=False):
    # Watchdog: the axon tunnel can wedge such that the first device op
    # blocks forever (claim wait has no timeout).  A normal full run takes
    # ~2-3 min including compile; if we are still stuck at 12 min, emit the
    # one required JSON line with an error marker instead of hanging the
    # driver.
    import os

    watchdog = _start_watchdog(1800 if density_sweep else 720)

    baseline_edges_per_s = 6.0e8
    e_head = 1 << 22
    edges_per_s, t_iter, sol_dict = _measure(e_head)
    out = {
        "metric": "spmm_fwdbwd_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline_edges_per_s, 4),
        "sol": sol_dict,
    }
    if density_sweep:
        # sensitivity of the headline point: same storage shape, different
        # band occupancy (time should stay ~flat; edges/s moves linearly)
        sweep = []
        for ee in (1 << 21, 1 << 23):
            eps, ti, sd = _measure(ee)
            sweep.append(
                {
                    "directed_edges": 2 * ee,
                    "band_density": sd["band_density"],
                    "edges_per_s": round(eps, 1),
                    "t_iter_ms": round(ti * 1e3, 3),
                    "sol_fraction": sd["sol_fraction"],
                }
            )
        sweep.insert(
            1,
            {
                "directed_edges": 2 * e_head,
                "band_density": sol_dict["band_density"],
                "edges_per_s": round(edges_per_s, 1),
                "t_iter_ms": round(t_iter * 1e3, 3),
                "sol_fraction": sol_dict["sol_fraction"],
            },
        )
        out["density_sweep"] = sweep

    import signal as _signal

    os.kill(watchdog, _signal.SIGKILL)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    main(density_sweep="--density-sweep" in sys.argv[1:])
