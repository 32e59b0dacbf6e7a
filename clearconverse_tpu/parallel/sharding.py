"""Sharding rules (PartitionSpec pytrees) for the model zoo.

Megatron-style tensor parallel over the ``model`` axis: column-shard the
q/k/v and fc1 projections (heads / hidden split), row-shard the out/fc2
projections so each block needs exactly one psum, which XLA inserts from
these annotations. Embedding tables and layernorms are replicated (they are
small at whisper-small scale); the batch axis shards over ``data``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from clearconverse_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _ln_spec():
    return {"g": P(), "b": P()}


def _attn_spec():
    return {
        "q": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        "k": {"w": P(None, MODEL_AXIS)},
        "v": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        "out": {"w": P(MODEL_AXIS, None), "b": P()},
    }


def _block_spec(cross: bool):
    spec = {
        "attn_ln": _ln_spec(),
        "attn": _attn_spec(),
        "mlp_ln": _ln_spec(),
        "mlp": {"fc1": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
                "fc2": {"w": P(MODEL_AXIS, None), "b": P()}},
    }
    if cross:
        spec["cross_ln"] = _ln_spec()
        spec["cross"] = _attn_spec()
    return spec


def whisper_param_spec(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree with the same structure as the whisper params."""
    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos": P(),
            "blocks": [_block_spec(False) for _ in params["encoder"]["blocks"]],
            "ln_post": _ln_spec(),
        },
        "decoder": {
            "tok": P(),
            "pos": P(),
            "blocks": [_block_spec(True) for _ in params["decoder"]["blocks"]],
            "ln": _ln_spec(),
        },
    }


def replicated_spec(tree: Any) -> Any:
    return jax.tree.map(lambda _: P(), tree)


def batch_spec(ndim: int) -> P:
    """Leading-axis data parallelism."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def shard_params(params: Dict[str, Any], mesh, spec=None) -> Dict[str, Any]:
    """Place a param pytree onto the mesh per ``spec`` (default: whisper)."""
    spec = spec if spec is not None else whisper_param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, spec,
        is_leaf=lambda x: isinstance(x, P))
