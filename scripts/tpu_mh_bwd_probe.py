"""Block-shape sweep for the natural-layout training attention kernels
(ops/flash_attention.py mh fwd+bwd) at encoder training shapes (dev tool).

Times the two backward kernels separately (dq vs dkv) by calling
flash_attention_mh_bwd with each candidate block config, plus the lse
forward, and prints ms per call. FLOP floors (at the dh=64 50%-MXU cap) are
printed for reference: fwd 4BT^2d, dq 6BT^2d, dkv 8BT^2d.

Usage: python scripts/tpu_mh_bwd_probe.py [d] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _fetch(out):
    # the tunnel's block_until_ready can return early on chained calls —
    # fetching a VALUE is the reliable sync (CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(label, fn, n=8):
    _fetch(fn())
    _fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _fetch(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    from asr_ttl_mtl_tpu.ops.flash_attention import (
        flash_attention_h2, flash_attention_h2_bwd,
    )

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H = d // 64
    T = 1536
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    q, k, v, g = mk(B, T, d), mk(B, T, d), mk(B, T, d), mk(B, T, d)

    flops = 4 * B * T * T * d
    peak = 197e12
    print(f"d={d} H={H} B={B} T={T}; fwd floor @50% MXU = {flops/(peak*0.5)*1e3:.2f} ms, "
          f"dq = {1.5*flops/(peak*0.5)*1e3:.2f}, dkv = {2*flops/(peak*0.5)*1e3:.2f}", flush=True)

    out, lse = jax.block_until_ready(
        flash_attention_h2(q, k, v, n_head=H, scale=0.125)
    )
    hpb = 128 // 64
    n_lane = d // 128
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, T, n_lane, hpb, 64).sum(axis=-1).transpose(2, 0, 1, 3)
    )
    delta = jax.block_until_ready(jax.jit(lambda x: x + 0.0)(delta))

    print("h2 forward (lse):")
    for bq in (128, 256, 512, 768):
        try:
            timeit(
                f"fwd bq={bq}",
                lambda bq=bq: flash_attention_h2(
                    q, k, v, n_head=H, scale=0.125, block_q=bq
                ),
            )
        except Exception as e:
            print(f"  fwd bq={bq}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    print("h2 backward (dq+dkv together):")
    for bq in (128, 256, 512, 768):
        try:
            timeit(
                f"bwd bq={bq}",
                lambda bq=bq: flash_attention_h2_bwd(
                    q, k, v, lse, delta, g, n_head=H, scale=0.125, block_q=bq,
                ),
            )
        except Exception as e:
            print(f"  bwd bq={bq}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


def compare_paths():
    """End-to-end per-call grad cost: h2 natural path vs head-split kernels
    including their split/merge relayouts (what the old training path paid)."""
    from asr_ttl_mtl_tpu.ops.flash_attention import (
        flash_attention_mh_vjp, flash_attention_vjp,
    )

    d = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    H = d // 64
    T = 1536
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    q, k, v = mk(B, T, d), mk(B, T, d), mk(B, T, d)

    def loss_h2(q, k, v):
        out = flash_attention_mh_vjp(q, k, v, H, None, 0.125)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_split(q, k, v):
        split = lambda x: x.reshape(B, T, H, 64).transpose(0, 2, 1, 3).reshape(B * H, T, 64)
        out = flash_attention_vjp(split(q), split(k), split(v), False, 0, None, 0.125)
        out = out.reshape(B, H, T, 64).transpose(0, 2, 1, 3).reshape(B, T, d)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_h2 = jax.jit(jax.grad(loss_h2, argnums=(0, 1, 2)))
    g_sp = jax.jit(jax.grad(loss_split, argnums=(0, 1, 2)))
    timeit(f"grad h2 natural  d={d} B={B}", lambda: g_h2(q, k, v))
    timeit(f"grad head-split  d={d} B={B}", lambda: g_sp(q, k, v))
    f_h2 = jax.jit(lambda q, k, v: flash_attention_mh_vjp(q, k, v, H, None, 0.125))
    timeit(f"fwd-only mh (inference kernel)", lambda: f_h2(q, k, v))




def block_grad_sweep():
    """Pick (fwd block_q, bwd block_q) by timing the full grad path."""
    import functools as ft

    from asr_ttl_mtl_tpu.ops.flash_attention import (
        flash_attention_h2, flash_attention_h2_bwd,
    )

    d = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    H = d // 64
    T = 1536
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    q, k, v = mk(B, T, d), mk(B, T, d), mk(B, T, d)

    for fbq in (256, 512, 768):
        for bbq in (256, 512, 768):

            @ft.partial(jax.custom_vjp, nondiff_argnums=())
            def att(q, k, v):
                out, _ = flash_attention_h2(q, k, v, n_head=H, scale=0.125, block_q=fbq)
                return out

            def fwd(q, k, v):
                out, lse = flash_attention_h2(q, k, v, n_head=H, scale=0.125, block_q=fbq)
                return out, (q, k, v, out, lse)

            def bwd(res, g):
                q, k, v, out, lse = res
                hpb, n_lane = 2, d // 128
                delta = (
                    (g.astype(jnp.float32) * out.astype(jnp.float32))
                    .reshape(B, T, n_lane, hpb, 64).sum(axis=-1).transpose(2, 0, 1, 3)
                )
                return flash_attention_h2_bwd(
                    q, k, v, lse, delta, g, n_head=H, scale=0.125, block_q=bbq
                )

            att.defvjp(fwd, bwd)
            gfn = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(att(q, k, v).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            ))
            try:
                timeit(f"grad fwd_bq={fbq} bwd_bq={bbq}", lambda: gfn(q, k, v))
            except Exception as e:
                print(f"  grad fwd_bq={fbq} bwd_bq={bbq}: FAILED {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare_paths()
    elif len(sys.argv) > 1 and sys.argv[1] == "gradsweep":
        block_grad_sweep()
    else:
        main()
