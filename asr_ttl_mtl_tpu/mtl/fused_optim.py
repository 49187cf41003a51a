"""Fused multi-group AdamW: the per-leaf optimizer tail collapsed into a few
lane-aligned flat-buffer chains.

The reference's 4-group AdamW (speech_disorder/trainer.py:139-198) maps to an
optax chain of clip_by_global_norm + multi_transform(adamw x 4) — which XLA
lowers to an ~8-op elementwise chain PER LEAF (~180 leaves x (m, v, update,
apply) = the ~3000-op tail the round-3 HLO rollup measured at >20% of train
step device time; each tiny fusion pays fixed launch overhead that dwarfs its
math at bias/layernorm sizes).

This transformation is arithmetically IDENTICAL to that chain (same optax
0.2.6 formulas, same float-op order per element — see test_fused_optim.py for
the bit-parity differential) but keeps Adam's m/v state as ONE (rows, 128)
fp32 buffer per (group, dtype):

  * gradients are packed group-wise into flat buffers (one fused concatenate
    per group; each leaf's segment is padded to a 128-lane row boundary so
    the slice back out is row-aligned),
  * the clip + m/v + bias-correction + adam-term math runs as ~4 fused
    elementwise chains over the flat buffers,
  * per leaf only the final  (adam_seg + wd*p) * -lr  remains, which XLA
    fuses into the apply-updates add (one small kernel per leaf instead of
    the full chain).

The (rows, 128) 2-D shape is deliberate: XLA factorizes large 1-D arrays
into 2-D tiled layouts using the smallest factor of the length, which for an
awkward total can transiently pad the minor dim 3 -> 128 (a measured 19 GB
allocation at compile, see trainer._state_pack_spec). Lane-aligned rows keep
the layout exact and the pack/unpack copies cheap (~2 x params bytes, <1 ms).

Buffer handles per dispatch drop too: m+v shrink from ~360 leaves to ~9
buffers, which on tunnel-attached TPUs saves ~0.6 ms/handle of dispatch
marshalling (PERF.md "Known environment effects").

Sharded-training extensions (round 5):

  * tp > 1 / pjit meshes: the flat buffers stay replicated; GSPMD
    all-gathers each tp-sharded grad leaf into its buffer segment during
    packing and reshards the per-leaf update slice back at apply. The
    optimizer math is replicated (cheap at these model sizes) but the
    ~3000-op per-leaf dispatch tail is still gone.
  * ZeRO-1 over dp (`zero_axis`): each (rows, 128) m/v buffer is row-sharded
    over the dp axis of the surrounding shard_map — every device stores and
    updates only rows/dp of the optimizer state (the flat row-aligned layout
    makes the shard a contiguous row range), then the per-group adam terms
    are all-gathered for the per-leaf apply. The update arithmetic is
    bit-identical to the unsharded one (elementwise math on disjoint row
    ranges + exact all-gather — standalone differential in
    test_fused_optim.py); inside a full train step the two programs'
    fusion contexts can FMA-contract differently (~1 fp32 ulp, measured).
  * `moment_dtype=bfloat16`: m/v buffers stored in bf16 (halves optimizer
    HBM — what lets whisper-medium's 769M-param state fit one 16 GB chip);
    each step's math runs in f32 from upcast moments, storing rounded.
    NOT bit-identical to fp32 moments — convergence differential in
    tests/test_fused_optim.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 scalar (shared: every group increments alike)
    m: Dict[str, jnp.ndarray]  # (group, dtype) key -> (rows, 128) buffer
    v: Dict[str, jnp.ndarray]


def _leaf_rows(shape: Tuple[int, ...]) -> int:
    size = int(np.prod(shape or (1,)))
    return (size + 127) // 128


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def _make_spec(labels: Any, group_hparams: Dict[str, Tuple[float, float]], params):
    """(treedef, per-leaf (key|None, row, shape, dtype), rows per key)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    label_leaves = jax.tree_util.tree_leaves(labels)
    if len(label_leaves) != len(leaves):
        raise ValueError(
            f"labels tree has {len(label_leaves)} leaves, params {len(leaves)}"
        )
    totals: Dict[str, int] = {}
    entries = []
    for leaf, lab in zip(leaves, label_leaves):
        if lab == "frozen":
            entries.append((None, 0, tuple(leaf.shape), leaf.dtype))
            continue
        if lab not in group_hparams:
            raise ValueError(f"unknown optimizer group {lab!r}")
        key = f"{lab}:{jnp.dtype(leaf.dtype).name}"
        row = totals.get(key, 0)
        entries.append((key, row, tuple(leaf.shape), leaf.dtype))
        totals[key] = row + _leaf_rows(leaf.shape)
    return treedef, entries, totals


def _pack_flat(tree_leaves, entries, totals):
    """Leaves -> {key: (rows, 128)} via one padded concatenate per key."""
    segs: Dict[str, list] = {k: [] for k in totals}
    for leaf, (key, _row, shape, _dt) in zip(tree_leaves, entries):
        if key is None:
            continue
        size = int(np.prod(shape or (1,)))
        rows = _leaf_rows(shape)
        flat = jnp.ravel(leaf)
        if rows * 128 != size:
            flat = jnp.pad(flat, (0, rows * 128 - size))
        segs[key].append(flat.reshape(rows, 128))
    return {k: jnp.concatenate(v, axis=0) for k, v in segs.items()}


def migrate_per_leaf_state(
    labels: Any,
    group_hparams: Dict[str, Tuple[float, float]],
    params: Any,
    chain_state: Any,
) -> FusedAdamWState:
    """Convert a per-leaf `chain(clip_by_global_norm, multi_transform(adamw
    x groups))` optimizer state (what pre-fused-optimizer checkpoints hold)
    into the arithmetically-identical FusedAdamWState.

    The fused path's m/v buffers ARE the per-leaf mu/nu tensors packed
    group-wise into (rows, 128) buffers, and every group's adam count
    increments on every step, so the mapping is exact — a run resumed
    through this migration continues bit-identically to one resumed with
    fused_optimizer=False."""
    treedef, entries, totals = _make_spec(labels, group_hparams, params)
    leaves = treedef.flatten_up_to(params)
    label_leaves = jax.tree_util.tree_leaves(labels)

    partition = chain_state[1]  # (ClipState, PartitionState)
    inner = partition.inner_states
    per_group_mu = {}
    per_group_nu = {}
    counts = []
    for g in group_hparams:
        adam = inner[g].inner_state[0]  # MaskedState -> (ScaleByAdamState, ...)
        per_group_mu[g] = treedef.flatten_up_to(adam.mu)
        per_group_nu[g] = treedef.flatten_up_to(adam.nu)
        counts.append(np.asarray(adam.count))
    if len(set(int(c) for c in counts)) != 1:
        raise ValueError(f"per-group adam counts disagree: {counts}")

    mu_leaves, nu_leaves = [], []
    for i, (leaf, lab) in enumerate(zip(leaves, label_leaves)):
        if lab == "frozen":
            mu_leaves.append(jnp.zeros_like(leaf))
            nu_leaves.append(jnp.zeros_like(leaf))
        else:
            mu_leaves.append(per_group_mu[lab][i])
            nu_leaves.append(per_group_nu[lab][i])

    return FusedAdamWState(
        count=jnp.asarray(int(counts[0]), jnp.int32),
        m=_pack_flat(mu_leaves, entries, totals),
        v=_pack_flat(nu_leaves, entries, totals),
    )


def fused_multigroup_adamw(
    labels: Any,
    group_hparams: Dict[str, Tuple[float, float]],
    clip_norm: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Any = jnp.float32,
    zero_axis: Optional[str] = None,
    zero_size: int = 1,
) -> optax.GradientTransformation:
    """One GradientTransformation equivalent to
    chain(clip_by_global_norm(clip_norm), multi_transform({g: adamw(lr_g,
    weight_decay=wd_g)}, labels)).

    `labels`: pytree congruent with params mapping each leaf to a group name
    (a key of `group_hparams`) or "frozen" (updates forced to zero, no state).
    `group_hparams`: group -> (learning_rate, weight_decay).
    `moment_dtype`: storage dtype of the m/v buffers (fp32 default is
    bit-identical to the per-leaf chain; bf16 halves optimizer HBM, math
    still runs in f32 from upcast moments).
    `zero_axis`/`zero_size`: ZeRO-1 — update_fn must then run inside a
    shard_map over `zero_axis` with the m/v buffers row-sharded
    (P(zero_axis)) over it; init_fn returns the FULL (row-padded) buffers
    for the caller to device_put with that sharding. Gradients arriving at
    update_fn must already be the global (psum'd) gradients.
    """
    moment_dtype = jnp.dtype(moment_dtype)

    def _spec(params):
        return _make_spec(labels, group_hparams, params)

    _pack = _pack_flat

    def _padded(rows: int) -> int:
        return _round_up(rows, zero_size) if zero_axis else rows

    def init_fn(params):
        _, entries, totals = _spec(params)
        zeros = {
            k: jnp.zeros((_padded(rows), 128), dtype=moment_dtype)
            for k, rows in totals.items()
        }
        return FusedAdamWState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v={k: jnp.array(z) for k, z in zeros.items()},
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("fused_multigroup_adamw requires params")
        treedef, entries, totals = _spec(updates)
        grad_leaves = treedef.flatten_up_to(updates)
        param_leaves = treedef.flatten_up_to(params)

        # --- global-norm clip: the norm is computed with optax's exact
        # reduction structure (per-leaf sum-squares, Python-summed in leaf
        # order) so it is bit-identical to clip_by_global_norm; the
        # elementwise (g / norm) * clip_norm commutes with packing.
        g_norm = optax.global_norm(updates)
        trigger = g_norm < clip_norm

        flat_g = _pack(grad_leaves, entries, totals)
        flat_g = {
            k: jax.lax.select(
                trigger, g, (g / g_norm.astype(g.dtype)) * clip_norm
            )
            for k, g in flat_g.items()
        }

        if zero_axis is not None:
            # ZeRO-1: this device updates only its contiguous row range of
            # each buffer. state.m/v arrive LOCAL ((padded_rows/dp, 128) —
            # shard_map split them); slice the matching grad rows.
            idx = jax.lax.axis_index(zero_axis)
            local_g = {}
            for k, g in flat_g.items():
                pad = _padded(totals[k]) - totals[k]
                if pad:
                    g = jnp.pad(g, ((0, pad), (0, 0)))
                loc = _padded(totals[k]) // zero_size
                local_g[k] = jax.lax.dynamic_slice(g, (idx * loc, 0), (loc, 128))
            work_g = local_g
        else:
            work_g = flat_g

        # --- scale_by_adam on the flat buffers (optax 0.2.6 formulas).
        # With fp32 moments the astype calls are no-ops and the arithmetic
        # is bit-identical to the per-leaf chain; with bf16 moments the
        # math runs in f32 from upcast state and stores rounded.
        count_inc = optax.safe_increment(state.count)
        m_new_f = {
            k: (1 - b1) * work_g[k] + b1 * state.m[k].astype(work_g[k].dtype)
            for k in work_g
        }
        v_new_f = {
            k: (1 - b2) * (work_g[k] ** 2) + b2 * state.v[k].astype(work_g[k].dtype)
            for k in work_g
        }
        bc1 = 1 - b1**count_inc
        bc2 = 1 - b2**count_inc
        adam = {
            k: (m_new_f[k] / bc1.astype(m_new_f[k].dtype))
            / (jnp.sqrt(v_new_f[k] / bc2.astype(v_new_f[k].dtype)) + eps)
            for k in m_new_f
        }
        m_new = {k: m.astype(moment_dtype) for k, m in m_new_f.items()}
        v_new = {k: v.astype(moment_dtype) for k, v in v_new_f.items()}

        if zero_axis is not None:
            # reassemble the full adam term for the per-leaf apply (exact:
            # concatenation of disjoint row ranges)
            adam = {
                k: jax.lax.all_gather(a, zero_axis, axis=0, tiled=True)
                for k, a in adam.items()
            }

        # --- per leaf: slice the adam term back out and finish with
        # add_decayed_weights + scale(-lr); XLA fuses this 3-op chain into
        # the caller's apply-updates add.
        out_leaves = []
        for (key, row, shape, _dt), p in zip(entries, param_leaves):
            if key is None:
                out_leaves.append(jnp.zeros_like(p))
                continue
            lab = key.split(":", 1)[0]
            lr, wd = group_hparams[lab]
            size = int(np.prod(shape or (1,)))
            rows = _leaf_rows(shape)
            seg = jax.lax.slice(adam[key], (row, 0), (row + rows, 128))
            seg = seg.reshape(rows * 128)[:size].reshape(shape)
            if wd:
                seg = seg + wd * p
            out_leaves.append(-lr * seg)
        new_updates = jax.tree_util.tree_unflatten(treedef, out_leaves)
        return new_updates, FusedAdamWState(count=count_inc, m=m_new, v=v_new)

    return optax.GradientTransformation(init_fn, update_fn)
