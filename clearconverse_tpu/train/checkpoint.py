"""Checkpointing and reference-format export.

Two layers:
  * Orbax for native training checkpoints (params + opt state + step) —
    the framework's own resume path (the reference has no mid-run resume at
    all, SURVEY.md §5.4; task-level completed.txt markers are handled by
    serve/tasks.py).
  * Exporters that write our param pytrees back into the reference's
    fine-tune overlay formats, so weights trained here drop into either the
    reference (back/api.py:671-692 whisper-ft loader) or our own
    ModelBundle loaders:
      - whisper → ``whisper-ft/model.safetensors`` (openai naming)
      - whisper → openai ``{size}.pt`` layout (dims + model_state_dict)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from clearconverse_tpu.models.whisper import WhisperDims


# ----------------------------------------------------------------- orbax

def save_checkpoint(path: str, params: Dict[str, Any],
                    opt_state: Any = None, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": np.asarray(step)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


# ------------------------------------------------------------ whisper export

def whisper_to_openai_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our pytree → openai-whisper state-dict naming (exact inverse of
    models/convert._convert_openai; round-trip tested)."""
    sd: Dict[str, np.ndarray] = {}

    def put(key: str, val) -> None:
        sd[key] = np.asarray(val)

    def lin(prefix: str, p: Dict[str, Any]) -> None:
        put(f"{prefix}.weight", np.asarray(p["w"]).T)
        if "b" in p:
            put(f"{prefix}.bias", p["b"])

    def ln(prefix: str, p: Dict[str, Any]) -> None:
        put(f"{prefix}.weight", p["g"])
        put(f"{prefix}.bias", p["b"])

    enc = params["encoder"]
    put("encoder.conv1.weight", np.asarray(enc["conv1"]["w"]).transpose(2, 1, 0))
    put("encoder.conv1.bias", enc["conv1"]["b"])
    put("encoder.conv2.weight", np.asarray(enc["conv2"]["w"]).transpose(2, 1, 0))
    put("encoder.conv2.bias", enc["conv2"]["b"])
    put("encoder.positional_embedding", enc["pos"])
    for i, blk in enumerate(enc["blocks"]):
        pre = f"encoder.blocks.{i}"
        ln(f"{pre}.attn_ln", blk["attn_ln"])
        lin(f"{pre}.attn.query", blk["attn"]["q"])
        lin(f"{pre}.attn.key", blk["attn"]["k"])
        lin(f"{pre}.attn.value", blk["attn"]["v"])
        lin(f"{pre}.attn.out", blk["attn"]["out"])
        ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        lin(f"{pre}.mlp.0", blk["mlp"]["fc1"])
        lin(f"{pre}.mlp.2", blk["mlp"]["fc2"])
    ln("encoder.ln_post", enc["ln_post"])

    dec = params["decoder"]
    put("decoder.token_embedding.weight", dec["tok"])
    put("decoder.positional_embedding", dec["pos"])
    for i, blk in enumerate(dec["blocks"]):
        pre = f"decoder.blocks.{i}"
        ln(f"{pre}.attn_ln", blk["attn_ln"])
        lin(f"{pre}.attn.query", blk["attn"]["q"])
        lin(f"{pre}.attn.key", blk["attn"]["k"])
        lin(f"{pre}.attn.value", blk["attn"]["v"])
        lin(f"{pre}.attn.out", blk["attn"]["out"])
        ln(f"{pre}.cross_attn_ln", blk["cross_ln"])
        lin(f"{pre}.cross_attn.query", blk["cross"]["q"])
        lin(f"{pre}.cross_attn.key", blk["cross"]["k"])
        lin(f"{pre}.cross_attn.value", blk["cross"]["v"])
        lin(f"{pre}.cross_attn.out", blk["cross"]["out"])
        ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        lin(f"{pre}.mlp.0", blk["mlp"]["fc1"])
        lin(f"{pre}.mlp.2", blk["mlp"]["fc2"])
    ln("decoder.ln", dec["ln"])
    return sd


def export_whisper_ft(params: Dict[str, Any], model_dir: str) -> str:
    """Write the reference's whisper-ft overlay: safetensors with openai
    naming at ``{model_dir}/whisper-ft/model.safetensors``."""
    from safetensors.numpy import save_file

    out_dir = os.path.join(model_dir, "whisper-ft")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "model.safetensors")
    sd = {k: np.ascontiguousarray(v, dtype=np.float32)
          for k, v in whisper_to_openai_state_dict(params).items()}
    save_file(sd, path)
    return path


def export_whisper_pt(params: Dict[str, Any], dims: WhisperDims,
                      path: str) -> str:
    """Write an openai-whisper ``.pt`` (dims + model_state_dict) loadable by
    our load_whisper and by openai-whisper itself."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32).copy())
          for k, v in whisper_to_openai_state_dict(params).items()}
    payload = {
        "dims": {
            "n_mels": dims.n_mels, "n_vocab": dims.n_vocab,
            "n_audio_ctx": dims.n_audio_ctx,
            "n_audio_state": dims.n_audio_state,
            "n_audio_head": dims.n_audio_head,
            "n_audio_layer": dims.n_audio_layer,
            "n_text_ctx": dims.n_text_ctx, "n_text_state": dims.n_text_state,
            "n_text_head": dims.n_text_head, "n_text_layer": dims.n_text_layer,
        },
        "model_state_dict": sd,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(payload, path)
    return path
