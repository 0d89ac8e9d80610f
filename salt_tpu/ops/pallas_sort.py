"""Pallas TPU kernel: descending bitonic sort-with-payload for the
Lovász hinge loss.

Why: the Lovász loss sorts per-image error vectors ([B, 32768] for the
production 2-class 128x128 case). The jnp bitonic network
(ops/bitonic.py) already beat ``lax.sort_key_val`` 14.7 vs 47.5 ms at
bs128 — but XLA still materializes the [B, P] arrays in HBM between
compare-exchange stages, so the 120-stage network is HBM-bound
(~16 GB of traffic). This kernel keeps each row tile resident in VMEM
for the whole network: HBM traffic drops to one read + one write.

The compare-exchange uses lane rolls instead of reshapes (Mosaic
reshapes on the minor dimension are restricted): for stage distance j,
the partner of lane i is i^j, i.e. the value j lanes to the right for
(i & j) == 0 and j lanes to the left otherwise; both are one
``pltpu.roll`` away. Equal keys never swap, so the permutation is
stable per-pair and payloads follow keys exactly — results are
bit-identical to ops/bitonic.py (asserted in tests/test_pallas_sort.py).

The payload carries ``labels*2^20 | iota`` packed in int32 so a single
custom-VJP residual both recovers gt_sorted and gives the permutation
for the backward scatter (the sort's VJP is the inverse permutation).

Reference counterpart: the torch Lovász sorts with
``torch.sort(errors, descending=True)`` per image
(/root/reference/common_blocks/lovasz_losses.py:103-105).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _stage_table(length: int) -> np.ndarray:
    """All (k_exp, j_exp) compare-exchange stages of the bitonic network
    for the given power-of-two length, as an [S, 2] int32 table."""
    n = length.bit_length() - 1
    return np.array([(k_exp, j_exp)
                     for k_exp in range(1, n + 1)
                     for j_exp in range(k_exp - 1, -1, -1)], np.int32)


def _sort_kernel(stages_ref, keys_ref, payload_ref, keys_out, payload_out,
                 *, length, n_stages):
    """One grid step sorts a [R, P] row tile fully in VMEM.

    The stage loop is a fori_loop over the SMEM stage table (an unrolled
    network blew the Mosaic VMEM stack: 120 stages x live temporaries =
    34.8 MB at R=8). Rolls use dynamic shifts; the swap predicate is
    built from int comparisons + logical ops only — Mosaic cannot lower
    selects between i1 operands (i8->i1 trunci is unsupported)."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.int32, keys_ref.shape, 1)

    def body(s, carry):
        keys, payload = carry
        k_exp = stages_ref[s, 0]
        j_exp = stages_ref[s, 1]
        j = jnp.int32(1) << j_exp
        is_low = (lane & j) == 0
        # pltpu.roll needs non-negative shifts: left-roll by j is a
        # right-roll by length - j
        pk = jnp.where(is_low, pltpu.roll(keys, length - j, 1),
                       pltpu.roll(keys, j, 1))
        # descending block ((i & 2^k_exp) == 0): the low lane keeps the
        # max; take_max = (bit k_exp of i) == (bit j_exp of i)
        take_max = (((lane >> k_exp) ^ (lane >> j_exp)) & 1) == 0
        partner_wins = jnp.logical_or(
            jnp.logical_and(take_max, pk > keys),
            jnp.logical_and(jnp.logical_not(take_max), pk < keys))
        keys = jnp.where(partner_wins, pk, keys)
        pv = jnp.where(is_low, pltpu.roll(payload, length - j, 1),
                       pltpu.roll(payload, j, 1))
        payload = jnp.where(partner_wins, pv, payload)
        return keys, payload

    keys, payload = jax.lax.fori_loop(
        0, n_stages, body, (keys_ref[...], payload_ref[...]))
    keys_out[...] = keys
    payload_out[...] = payload


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "interpret"))
def sort_desc_pallas(keys: jax.Array, payload: jax.Array,
                     rows_per_tile: int = 8, interpret: bool = False):
    """Descending sort of ``keys`` [B, P] along the last axis (P a power
    of two, multiple of 128), carrying int32 ``payload``. Mosaic
    requires the sublane block dimension divisible by 8, so batches are
    processed in 8-row tiles (short batches pad up)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b0, p = keys.shape
    assert p & (p - 1) == 0 and p % 128 == 0, p
    r = rows_per_tile
    pad = (-b0) % r
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.zeros((pad, p), keys.dtype)], axis=0)
        payload = jnp.concatenate(
            [payload, jnp.zeros((pad, p), payload.dtype)], axis=0)
    b = b0 + pad
    stages = jnp.asarray(_stage_table(p))
    kernel = functools.partial(_sort_kernel, length=p,
                               n_stages=stages.shape[0])
    spec = pl.BlockSpec((r, p), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ks, ps = pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((b, p), keys.dtype),
                   jax.ShapeDtypeStruct((b, p), jnp.int32)),
        interpret=interpret,
    )(stages, keys, payload.astype(jnp.int32))
    return ks[:b0], ps[:b0]


@jax.custom_vjp
def sort_desc_with_labels(errors: jax.Array, labels: jax.Array):
    """Differentiable descending sort of ``errors`` [B, P] carrying the
    binary ``labels`` along; gradient flows through errors only (the
    VJP applies the inverse permutation)."""
    es, ls, _ = _sort_fwd_impl(errors, labels)
    return es, ls


def _interpret() -> bool:
    """Interpreter-mode escape hatch so the CPU test suite can validate
    the kernel without Mosaic (set SALT_TPU_PALLAS_INTERPRET=1)."""
    import os
    return bool(os.environ.get("SALT_TPU_PALLAS_INTERPRET"))


def _sort_fwd_impl(errors, labels):
    b, p = errors.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    packed = (labels.astype(jnp.int32) << 20) | iota
    errors_sorted, packed_sorted = sort_desc_pallas(
        errors.astype(jnp.float32), packed, interpret=_interpret())
    labels_sorted = (packed_sorted >> 20).astype(jnp.float32)
    perm = packed_sorted & ((1 << 20) - 1)
    return errors_sorted, labels_sorted, perm


def _sort_fwd(errors, labels):
    es, ls, perm = _sort_fwd_impl(errors, labels)
    return (es, ls), perm


def _sort_bwd(perm, cotangents):
    g_es, _ = cotangents
    b, p = g_es.shape
    # scatter g back through the permutation: d_errors[perm[i]] = g[i]
    g_err = jnp.zeros_like(g_es)
    g_err = jax.vmap(lambda g, pr, z: z.at[pr].set(g))(
        g_es, perm, g_err)
    return g_err, None


sort_desc_with_labels.defvjp(_sort_fwd, _sort_bwd)


def lovasz_hinge_flat_pallas(logits: jax.Array, labels: jax.Array,
                             size_weighted: bool = False) -> jax.Array:
    """Lovász hinge over flat [B, P] logits using the VMEM-resident
    bitonic kernel. Value-identical to lovasz_hinge_flat_bitonic
    (same network, same tie handling); per-row losses are returned
    batched [B]."""
    from salt_tpu.losses.lovasz import lovasz_grad, weigh_errors_with_size
    labels = labels.astype(jnp.float32)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits.astype(jnp.float32) * signs
    if size_weighted:
        errors = jax.vmap(weigh_errors_with_size)(labels, errors)
    errors_sorted, gt_sorted = sort_desc_with_labels(errors, labels)
    grad = jax.vmap(lovasz_grad)(jax.lax.stop_gradient(gt_sorted))
    return jnp.sum(jax.nn.elu(errors_sorted)
                   * jax.lax.stop_gradient(grad), axis=-1)
