"""Sharded Whisper fine-tuning: teacher-forced cross-entropy over a
(data, model) mesh.

Data parallelism shards the segment batch; tensor parallelism shards
attention heads / MLP hidden (parallel/sharding.py). Gradients reduce via
the psums XLA inserts from the sharding annotations — no hand-written
collectives. ``jax.checkpoint`` wraps the per-block remat boundary to trade
FLOPs for HBM on long mel inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from clearconverse_tpu.models.whisper import (
    WhisperDims, decoder_forward, init_kv_cache, precompute_cross_kv,
    whisper_encode)
from clearconverse_tpu.parallel.mesh import DATA_AXIS
from clearconverse_tpu.parallel.sharding import whisper_param_spec


@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def whisper_loss_sums(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                      dims: WhisperDims, compute_dtype=jnp.bfloat16,
                      remat: bool = False):
    """Teacher-forced CE in UNNORMALIZED form: (sum_nll, (n_tokens,
    n_correct)). The sums compose exactly across microbatches — the global
    mean loss is Σsum_nll/Σn_tokens and its gradient is Σgrad(sum_nll)/
    Σn_tokens, which is what gradient accumulation needs (averaging
    per-microbatch MEAN losses is only correct when every microbatch has
    the same mask count).

    ``remat=True`` wraps the whole forward in ``jax.checkpoint``:
    activations are recomputed in the backward pass instead of stored,
    trading ~1/3 more FLOPs for the encoder/decoder activation memory —
    the standard lever for long mel inputs or bigger per-device batches."""
    mel, tokens = batch["mel"], batch["tokens"]
    targets, mask = batch["targets"], batch["loss_mask"]
    B, L = tokens.shape

    def forward(params, mel, tokens):
        audio = whisper_encode(params, mel, dims, compute_dtype)
        cross_kv = precompute_cross_kv(params, audio)
        self_kv = init_kv_cache(dims, B, L, compute_dtype)
        pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        k = jnp.arange(L)[None, None, None, :]
        q = jnp.arange(L)[None, None, :, None]
        causal = jnp.where(k <= q, 0.0, -1e9).astype(jnp.float32)
        logits, _ = decoder_forward(params, tokens, pos, jnp.int32(0),
                                    self_kv, cross_kv, causal, None, dims,
                                    compute_dtype)
        return logits

    if remat:
        forward = jax.checkpoint(forward)
    logits = forward(params, mel, tokens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    sum_nll = jnp.sum(nll * mask)
    n_tok = jnp.sum(mask)
    n_correct = jnp.sum((jnp.argmax(logits, -1) == targets) * mask)
    return sum_nll, (n_tok, n_correct)


def whisper_loss(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                 dims: WhisperDims, compute_dtype=jnp.bfloat16,
                 remat: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """Teacher-forced CE. batch: mel [B,M,T], tokens [B,L] (decoder input,
    starts with SOT sequence), targets [B,L], loss_mask [B,L] float."""
    sum_nll, (n_tok, n_correct) = whisper_loss_sums(params, batch, dims,
                                                    compute_dtype, remat)
    denom = jnp.maximum(n_tok, 1.0)
    loss = sum_nll / denom
    return loss, {"loss": loss, "accuracy": n_correct / denom}


def default_optimizer(lr: float = 1e-5, weight_decay: float = 0.01,
                      clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(clip),
                       optax.adamw(lr, weight_decay=weight_decay))


def init_train_state(params: Dict[str, Any],
                     optimizer: Optional[optax.GradientTransformation] = None) -> TrainState:
    optimizer = optimizer or default_optimizer()
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(dims: WhisperDims,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    mesh=None,
                    compute_dtype=jnp.bfloat16,
                    remat: bool = False,
                    accum_steps: int = 1) -> Callable:
    """Build a jitted train step. With a mesh, params follow the tensor-
    parallel spec and the batch shards over the data axis; single-device
    otherwise.

    ``remat`` recomputes forward activations in the backward pass
    (jax.checkpoint) — ~1/3 more FLOPs for ~the activation memory back.
    ``accum_steps`` > 1 splits the batch into that many microbatches and
    accumulates UNNORMALIZED gradient sums over a lax.scan before one
    optimizer update — numerically IDENTICAL to the full-batch gradient
    (sums divide by the global token count at the end), at 1/accum_steps
    the peak activation memory. The leading batch dim must divide evenly."""
    optimizer = optimizer or default_optimizer()
    grad_sums = jax.value_and_grad(whisper_loss_sums, has_aux=True)

    def full_step(params, opt_state, batch, step_no):
        (loss, metrics), grads = jax.value_and_grad(
            whisper_loss, has_aux=True)(params, batch, dims, compute_dtype,
                                        remat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step_no + 1, metrics

    def accum_step(params, opt_state, batch, step_no):
        b = batch["tokens"].shape[0]
        if b % accum_steps:
            raise ValueError(f"batch {b} not divisible by "
                             f"accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape(accum_steps, b // accum_steps, *x.shape[1:]),
            batch)
        if mesh is not None:
            # The scanned leading (accum) axis can't stay sharded; without
            # re-pinning the microbatch row axis to ``data`` GSPMD may
            # replicate each microbatch — silently spending the memory the
            # accumulation was meant to save.
            micro = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(None, DATA_AXIS,
                                             *([None] * (x.ndim - 2))))),
                micro)

        def body(carry, mb):
            g_acc, s_acc, n_acc, c_acc = carry
            (s, (n, c)), g = grad_sums(params, mb, dims, compute_dtype,
                                       remat)
            return (jax.tree.map(jnp.add, g_acc, g),
                    s_acc + s, n_acc + n, c_acc + c), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (g, s, n, c), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
            micro)
        denom = jnp.maximum(n, 1.0)
        grads = jax.tree.map(lambda x: x / denom, g)
        metrics = {"loss": s / denom, "accuracy": c / denom}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step_no + 1, metrics

    step = accum_step if accum_steps > 1 else full_step

    if mesh is None:
        return jax.jit(step)

    # Mesh path: annotate inputs; XLA propagates and inserts collectives.
    def sharded_step(params, opt_state, batch, step_no):
        pspec = whisper_param_spec(params)
        params = jax.lax.with_sharding_constraint(
            params, jax.tree.map(lambda s: NamedSharding(mesh, s), pspec,
                                 is_leaf=lambda x: isinstance(x, P)))
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))),
            batch)
        return step(params, opt_state, batch, step_no)

    return jax.jit(sharded_step)
