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

Constraint: flat buffers cannot carry per-leaf NamedShardings, so this path
is for replicated-parameter training (dp via pjit or shard_map). The trainer
falls back to the per-leaf optax chain when tp > 1 shards parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

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
) -> optax.GradientTransformation:
    """One GradientTransformation equivalent to
    chain(clip_by_global_norm(clip_norm), multi_transform({g: adamw(lr_g,
    weight_decay=wd_g)}, labels)).

    `labels`: pytree congruent with params mapping each leaf to a group name
    (a key of `group_hparams`) or "frozen" (updates forced to zero, no state).
    `group_hparams`: group -> (learning_rate, weight_decay).
    """

    def _spec(params):
        return _make_spec(labels, group_hparams, params)

    _pack = _pack_flat

    def init_fn(params):
        _, entries, totals = _spec(params)
        dtypes = {}
        for key, _row, _shape, dt in entries:
            if key is not None:
                dtypes[key] = dt
        zeros = {
            k: jnp.zeros((rows, 128), dtype=dtypes[k]) for k, rows in totals.items()
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

        # --- scale_by_adam on the flat buffers (optax 0.2.6 formulas)
        count_inc = optax.safe_increment(state.count)
        m_new = {
            k: (1 - b1) * flat_g[k] + b1 * state.m[k] for k in flat_g
        }
        v_new = {
            k: (1 - b2) * (flat_g[k] ** 2) + b2 * state.v[k] for k in flat_g
        }
        bc1 = 1 - b1**count_inc
        bc2 = 1 - b2**count_inc
        adam = {
            k: (m_new[k] / bc1.astype(m_new[k].dtype))
            / (jnp.sqrt(v_new[k] / bc2.astype(v_new[k].dtype)) + eps)
            for k in m_new
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
