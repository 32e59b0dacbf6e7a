"""Encoder self-attention as a Pallas TPU kernel.

Whisper's encoder attends over T=1500 frames with dh=64 heads. The XLA
einsum path materializes the [B, H, T, T] logits AND the softmax weights
in HBM (~14 GB each way at B=128) — measured ~22% MXU on the attention
matmuls. This kernel keeps each query block's logits/weights resident in
VMEM: per grid step it computes one [BQ, Tp] logit block, softmaxes it,
and contracts with V, so HBM only ever sees Q, K, V and the output.

dh=64 half-fills the MXU's 128 lanes (the known reason the library flash
kernel loses here — measured 2-4× slower than the einsum at B=32/128);
~50% MXU on the matmuls still beats the einsum path's 22% plus its
logits round-trips. Grid order (bh, tq-block) keeps K/V for a (batch,
head) pair cached in VMEM across its query blocks — Pallas skips the
re-DMA when the block index map repeats.

Scaling parity: whisper scales q and k by dh**-0.25 each (models/
whisper.attention); here the whole dh**-0.5 folds into q. Numerics match
the einsum path to bf16 tolerance (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512  # query rows per grid step (sweep: 512 beats 128/256 at B=32/128)


def _kernel(q_ref, k_ref, v_ref, out_ref, *, t_valid: int, dh: int,
            heads_per_block: int):
    # Blocks carry 128//dh heads side by side on the lane axis (dh ≤ 128
    # heads group to the minimum 128-lane block): q [1, BQ, 128],
    # k/v [1, Tp, 128]. Each head attends independently via static lane
    # slices.
    for h in range(heads_per_block):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [BQ, Tp]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_valid, s, -jnp.inf)      # hide padded keys
        p = jax.nn.softmax(s, axis=-1).astype(v_ref.dtype)
        out_ref[0, :, sl] = jnp.dot(
            p, v_ref[0][:, sl],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def supports_shape(n_head: int, dh: int) -> bool:
    """The kernel groups 128//dh heads per 128-lane block: dh must divide
    128 and the head count must split into whole groups."""
    return 128 % dh == 0 and n_head % (128 // dh) == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def encoder_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             n_head: int,
                             interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B, T, D] → [B, T, D]; full (unmasked) attention over T.

    Head groups (128//dh heads) are selected by the BLOCK INDEX MAP on the
    feature axis — no [B,H,T,dh] transpose ever materializes in HBM (at
    B=128 those transposes cost more than the kernel saved). Requires
    supports_shape(n_head, dh).

    Differentiable: the custom VJP recomputes the backward pass through
    the plain einsum attention (models/whisper.attention) — raw
    pallas_call has no transpose rule, which would break train/finetune's
    value_and_grad through whisper_encode."""
    return _forward(q, k, v, n_head, interpret)


def _forward(q, k, v, n_head, interpret):
    B, T, D = q.shape
    dh = D // n_head
    if not supports_shape(n_head, dh):
        raise ValueError(f"unsupported head shape: {n_head} heads of {dh}")
    hpb = 128 // dh
    Tp = pl.cdiv(T, BQ) * BQ

    def padt(x):
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    qh = padt(q * jnp.asarray(dh ** -0.5, q.dtype))
    kh, vh = padt(k), padt(v)

    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=T, dh=dh, heads_per_block=hpb),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
        grid=(B, n_head // hpb, Tp // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, 128), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 128), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 128), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, 128), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kh, vh)

    return out[:, :T, :]


def _ref_attention(q, k, v, n_head):
    from clearconverse_tpu.models.whisper import attention
    return attention(q, k, v, None, n_head)


def _fwd(q, k, v, n_head, interpret):
    return _forward(q, k, v, n_head, interpret), (q, k, v)


def _bwd(n_head, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _ref_attention(q_, k_, v_, n_head),
                     q, k, v)
    return vjp(g)


encoder_attention_pallas.defvjp(_fwd, _bwd)
