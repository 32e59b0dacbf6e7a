"""ECAPA-TDNN speaker embedder in functional JAX.

Fills the role of the reference's embedding model (pyannote ``Inference
("pyannote/embedding", window="whole")``, back/api.py:770-774, used for
speaker profiles back/api.py:893-959 and window matching back/api.py:961-
1050): waveform → fixed-size L2-comparable speaker embedding.

Architecture: ECAPA-TDNN (Desplanques et al. 2020), the speechbrain
``spkrec-ecapa-voxceleb`` layout so those checkpoints convert directly:
fbank frontend → Conv1d(k=5) → 3× SE-Res2Net blocks (dilations 2,3,4,
scale 8) → multi-layer feature aggregation → attentive statistics pooling
with global context → linear to 192-d.

All convs are `[B, T, C]` NHC so XLA maps them onto the MXU; batch entries
carry frame-validity masks so padded segments pool correctly (the reference
processes one segment at a time and needs no masks; we batch hundreds).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

@dataclasses.dataclass(frozen=True)
class EcapaDims:
    n_mels: int = 80
    channels: int = 512
    mfa_channels: int = 1536     # multi-layer aggregation width
    attention_channels: int = 128
    embedding_dim: int = 192
    res2net_scale: int = 8
    dilations: tuple = (2, 3, 4)


def _sb_dft_matrices(n_fft: int = 400):
    """Hamming-windowed real-DFT projection matrices [n_fft, n_freq] —
    speechbrain STFT semantics (torch.hamming_window is PERIODIC:
    0.54 - 0.46 cos(2*pi*n/N)), unlike whisper's Hann in audio/mel.py."""
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * n[:, None] * k[None, :] / n_fft
    window = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / n_fft)
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def _sb_mel_filterbank(n_mels: int = 80, n_fft: int = 400,
                       sr: int = 16000, f_min: float = 0.0,
                       f_max: float = 8000.0) -> np.ndarray:
    """[n_freq, n_mels] speechbrain Filterbank (triangular, freeze=True):
    HTK mel spacing (2595*log10(1+f/700)), and — a speechbrain quirk —
    SYMMETRIC triangles whose half-width is each center's LEFT gap
    (band = hz[i+1]-hz[i]), with no area normalization. Distinct from both
    librosa/whisper (slaney scale + enorm, audio/mel.mel_filterbank) and
    Kaldi (asymmetric HTK triangles)."""
    mel = np.linspace(2595.0 * np.log10(1 + f_min / 700),
                      2595.0 * np.log10(1 + f_max / 700), n_mels + 2)
    hz = 700.0 * (10.0 ** (mel / 2595.0) - 1)
    f_central = hz[1:-1]                         # [n_mels]
    band = (hz[1:] - hz[:-1])[:-1]               # left gap of each center
    all_freqs = np.linspace(0, sr // 2, n_fft // 2 + 1)
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    tri = np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0))
    return tri.T.astype(np.float32)              # [n_freq, n_mels]


def fbank(audio: jnp.ndarray, n_mels: int = 80,
          frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T] 16 kHz waveform → [B, 1 + T//160, n_mels] log-mel filterbank
    with speechbrain ``Fbank`` + ``InputNormalization(sentence)`` semantics
    (the exact frontend spkrec-ecapa-voxceleb was trained on): 25 ms
    periodic-Hamming frames over CONSTANT (zero) center padding, power
    spectrum, HTK-mel symmetric triangles, 10*log10 with amin=1e-10 and a
    per-utterance top_db=80 floor, then per-utterance mean subtraction.

    ``frame_mask`` [B, frames] restricts the per-utterance max (for the
    top_db floor) and mean normalization to valid frames of padded rows."""
    if audio.ndim == 1:
        audio = audio[None]
    # torch.stft(center=True, pad_mode="constant"): zero-pad n_fft//2 each
    # side, frames = 1 + T//hop (speechbrain keeps the final frame; whisper
    # drops it).
    x = jnp.pad(audio, ((0, 0), (200, 200)))
    n_frames = 1 + audio.shape[-1] // 160
    idx = (jnp.arange(n_frames) * 160)[:, None] + jnp.arange(400)[None, :]
    frames = x[:, idx]
    cos_m, sin_m = _sb_dft_matrices(400)
    # precision=HIGHEST: f32-parity matmuls must not run as bf16 passes on
    # TPU (same pin as the identical DFT einsums in audio/mel.py).
    re = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_m),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_m),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im
    m = jnp.einsum("bfk,km->bfm", power,
                   jnp.asarray(_sb_mel_filterbank(n_mels=n_mels)),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    logm = 10.0 * jnp.log10(jnp.maximum(m, 1e-10))
    # speechbrain Filterbank._amplitude_to_DB: floor at (utterance max
    # over valid frames and mels) - top_db, with top_db = 80.
    if frame_mask is None:
        utt_max = jnp.max(logm, axis=(1, 2), keepdims=True)
    else:
        utt_max = jnp.max(
            jnp.where(frame_mask[..., None] > 0, logm, -jnp.inf),
            axis=(1, 2), keepdims=True)
    logm = jnp.maximum(logm, utt_max - 80.0)
    # Per-utterance mean normalization (speechbrain InputNormalization,
    # norm_type="sentence", std_norm=False).
    if frame_mask is None:
        return logm - jnp.mean(logm, axis=1, keepdims=True)
    w = frame_mask[..., None]
    denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    return logm - jnp.sum(logm * w, axis=1, keepdims=True) / denom


# ------------------------------------------------------------------ init

def _conv_init(key, k, cin, cout):
    return {"w": jax.random.normal(key, (k, cin, cout)) * (k * cin) ** -0.5,
            "b": jnp.zeros((cout,))}


def _bn_init(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_ecapa_params(key: jax.Array, dims: EcapaDims = EcapaDims()) -> Dict[str, Any]:
    C, S = dims.channels, dims.res2net_scale
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {
        "conv1": _conv_init(next(keys), 5, dims.n_mels, C),
        "bn1": _bn_init(C),
        "blocks": [],
        "mfa": _conv_init(next(keys), 1, 3 * C, dims.mfa_channels),
        "mfa_bn": _bn_init(dims.mfa_channels),
        "asp": {
            "conv1": _conv_init(next(keys), 1, 3 * dims.mfa_channels,
                                dims.attention_channels),
            "bn1": _bn_init(dims.attention_channels),
            "conv2": _conv_init(next(keys), 1, dims.attention_channels,
                                dims.mfa_channels),
        },
        "asp_bn": _bn_init(2 * dims.mfa_channels),
        "fc": _conv_init(next(keys), 1, 2 * dims.mfa_channels, dims.embedding_dim),
    }
    width = C // S
    for d in dims.dilations:
        blk = {
            "conv_in": _conv_init(next(keys), 1, C, C), "bn_in": _bn_init(C),
            "res2": [_conv_init(next(keys), 3, width, width) for _ in range(S - 1)],
            "res2_bn": [_bn_init(width) for _ in range(S - 1)],
            "conv_out": _conv_init(next(keys), 1, C, C), "bn_out": _bn_init(C),
            "se": {"fc1": _conv_init(next(keys), 1, C, dims.attention_channels),
                   "fc2": _conv_init(next(keys), 1, dims.attention_channels, C)},
        }
        p["blocks"].append(blk)
    return p


# ------------------------------------------------------------------ ops

def _conv(x, p, dilation=1):
    k = p["w"].shape[0]
    pad = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"]


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["g"] + p["b"]


def _tdnn(x, conv_p, bn_p, dilation=1):
    """speechbrain TDNNBlock semantics: conv → ReLU → BatchNorm (in that
    order — norm LAST, ECAPA_TDNN.py TDNNBlock.forward)."""
    return _bn(jax.nn.relu(_conv(x, conv_p, dilation)), bn_p)


def _masked_mean_std(x, mask, eps=1e-12):
    """x [B,T,C], mask [B,T] → (mean, std) over valid frames."""
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(x * m, axis=1) / denom
    var = jnp.sum((x - mean[:, None, :]) ** 2 * m, axis=1) / denom
    # speechbrain _compute_statistics: sqrt(clamp(var, eps)).
    return mean, jnp.sqrt(jnp.maximum(var, eps))


def _se_block(x, p, mask):
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    s = jnp.sum(x * m, axis=1, keepdims=True) / denom
    s = jax.nn.relu(_conv(s, p["fc1"]))
    s = jax.nn.sigmoid(_conv(s, p["fc2"]))
    return x * s


def _res2_block(x, blk, mask, dilation):
    S = len(blk["res2"]) + 1
    y = _tdnn(x, blk["conv_in"], blk["bn_in"])
    chunks = jnp.split(y, S, axis=-1)
    outs = [chunks[0]]
    prev = None
    for i in range(1, S):
        h = chunks[i] if prev is None else chunks[i] + prev
        h = _tdnn(h, blk["res2"][i - 1], blk["res2_bn"][i - 1], dilation)
        outs.append(h)
        prev = h
    y = jnp.concatenate(outs, axis=-1)
    y = _tdnn(y, blk["conv_out"], blk["bn_out"])
    y = _se_block(y, blk["se"], mask)
    return x + y


def ecapa_embed(params: Dict[str, Any], audio: jnp.ndarray,
                lengths: Optional[jnp.ndarray] = None,
                dims: EcapaDims = EcapaDims()) -> jnp.ndarray:
    """[B, T] waveform (+ per-row valid sample counts) → [B, 192] embeddings.

    The frame mask derives from ``lengths`` so one padded batch replaces the
    reference's per-segment embedding loop (back/api.py:928-946).
    """
    B = audio.shape[0] if audio.ndim > 1 else 1
    T = audio.shape[-1]
    F = 1 + T // 160          # torch.stft center=True frame count
    if lengths is None:
        mask = jnp.ones((B, F), jnp.float32)
    else:
        # speechbrain passes RELATIVE lengths; valid frames scale with the
        # row's share of the padded width (InputNormalization's
        # round(lengths * n_frames)).
        valid_frames = (lengths * F + T // 2) // T
        mask = (jnp.arange(F)[None, :] < valid_frames[:, None]).astype(jnp.float32)
    feats = fbank(audio, dims.n_mels, frame_mask=mask)     # [B, F, mels]
    feats = feats * mask[..., None]

    x = _tdnn(feats, params["conv1"], params["bn1"])
    x = x * mask[..., None]  # keep padding inert through the conv stack
    feats_out: List[jnp.ndarray] = []
    for blk, dilation in zip(params["blocks"], dims.dilations):
        x = _res2_block(x, blk, mask, dilation) * mask[..., None]
        feats_out.append(x)
    x = _tdnn(jnp.concatenate(feats_out, axis=-1), params["mfa"],
              params["mfa_bn"])

    # Attentive statistics pooling with global context (speechbrain ASP:
    # TDNNBlock → tanh → conv for the attention scores).
    mean, std = _masked_mean_std(x, mask)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean[:, None, :], x.shape),
         jnp.broadcast_to(std[:, None, :], x.shape)], axis=-1)
    attn = _conv(jnp.tanh(_tdnn(ctx, params["asp"]["conv1"],
                                params["asp"]["bn1"])),
                 params["asp"]["conv2"])
    attn = jnp.where(mask[..., None] > 0, attn, -1e9)
    attn = jax.nn.softmax(attn, axis=1)
    amean = jnp.sum(attn * x, axis=1)
    astd = jnp.sqrt(jnp.maximum(jnp.sum(attn * x * x, axis=1) - amean ** 2, 1e-12))
    pooled = jnp.concatenate([amean, astd], axis=-1)[:, None, :]
    pooled = _bn(pooled, params["asp_bn"])
    emb = _conv(pooled, params["fc"])[:, 0, :]
    return emb


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine similarity (reference back/api.py:878-879)."""
    na = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    nb = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(na * nb, axis=-1)


def convert_speechbrain_ecapa(sd: Dict[str, Any],
                              dims: EcapaDims = EcapaDims()) -> Dict[str, Any]:
    """speechbrain spkrec-ecapa-voxceleb ``embedding_model.ckpt`` state dict →
    our pytree. Torch Conv1d weights [out,in,k] → [k,in,out]; BatchNorm runs
    in inference mode with stored running stats."""
    def conv(prefix):
        return {"w": np.asarray(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
                "b": np.asarray(sd.get(f"{prefix}.bias",
                                       np.zeros(sd[f"{prefix}.weight"].shape[0])))}

    def bn(prefix):
        return {"g": np.asarray(sd[f"{prefix}.weight"]),
                "b": np.asarray(sd[f"{prefix}.bias"]),
                "mean": np.asarray(sd[f"{prefix}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.running_var"])}

    p = {
        "conv1": conv("blocks.0.conv.conv"),
        "bn1": bn("blocks.0.norm.norm"),
        "blocks": [],
        "mfa": conv("mfa.conv.conv"),
        "mfa_bn": bn("mfa.norm.norm"),
        "asp": {"conv1": conv("asp.tdnn.conv.conv"),
                "bn1": bn("asp.tdnn.norm.norm"),
                "conv2": conv("asp.conv.conv")},
        "asp_bn": bn("asp_bn.norm"),
        # ECAPA_TDNN.fc is a single speechbrain Conv1d wrapper (inner torch
        # conv at ".conv"), NOT a TDNNBlock — so one ".conv", unlike
        # mfa/asp.tdnn above which nest TDNNBlock.conv -> Conv1d.conv.
        "fc": conv("fc.conv"),
    }
    for bi in range(1, 4):
        pre = f"blocks.{bi}"
        # res2net width comes from the CHECKPOINT (key count), not the dims
        # arg — a non-default-scale checkpoint converts correctly and
        # infer_ecapa_dims recovers its scale afterwards.
        n_res2 = 0
        while f"{pre}.res2net_block.blocks.{n_res2}.conv.conv.weight" in sd:
            n_res2 += 1
        blk = {
            "conv_in": conv(f"{pre}.tdnn1.conv.conv"),
            "bn_in": bn(f"{pre}.tdnn1.norm.norm"),
            "res2": [conv(f"{pre}.res2net_block.blocks.{i}.conv.conv")
                     for i in range(n_res2)],
            "res2_bn": [bn(f"{pre}.res2net_block.blocks.{i}.norm.norm")
                        for i in range(n_res2)],
            "conv_out": conv(f"{pre}.tdnn2.conv.conv"),
            "bn_out": bn(f"{pre}.tdnn2.norm.norm"),
            # SEBlock.conv1/conv2 are speechbrain Conv1d wrappers too:
            # the torch weights live one level down at ".conv".
            "se": {"fc1": conv(f"{pre}.se_block.conv1.conv"),
                   "fc2": conv(f"{pre}.se_block.conv2.conv")},
        }
        p["blocks"].append(blk)
    return p


def ecapa_to_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our pytree → speechbrain ``embedding_model.ckpt`` naming (exact
    inverse of convert_speechbrain_ecapa; numpy values — savers tensorize).
    Used by the cold-start tests and eval/dress_rehearsal to synthesize
    real-format checkpoints (reference consumer: back/api.py:722-737)."""
    sd: Dict[str, np.ndarray] = {}

    def conv(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(p["w"]).transpose(2, 1, 0))
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def bn(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["g"])
        sd[f"{prefix}.bias"] = np.asarray(p["b"])
        sd[f"{prefix}.running_mean"] = np.asarray(p["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(p["var"])

    conv("blocks.0.conv.conv", params["conv1"])
    bn("blocks.0.norm.norm", params["bn1"])
    for bi, blk in enumerate(params["blocks"], start=1):
        pre = f"blocks.{bi}"
        conv(f"{pre}.tdnn1.conv.conv", blk["conv_in"])
        bn(f"{pre}.tdnn1.norm.norm", blk["bn_in"])
        for i, (c, b) in enumerate(zip(blk["res2"], blk["res2_bn"])):
            conv(f"{pre}.res2net_block.blocks.{i}.conv.conv", c)
            bn(f"{pre}.res2net_block.blocks.{i}.norm.norm", b)
        conv(f"{pre}.tdnn2.conv.conv", blk["conv_out"])
        bn(f"{pre}.tdnn2.norm.norm", blk["bn_out"])
        conv(f"{pre}.se_block.conv1.conv", blk["se"]["fc1"])
        conv(f"{pre}.se_block.conv2.conv", blk["se"]["fc2"])
    conv("mfa.conv.conv", params["mfa"])
    bn("mfa.norm.norm", params["mfa_bn"])
    conv("asp.tdnn.conv.conv", params["asp"]["conv1"])
    bn("asp.tdnn.norm.norm", params["asp"]["bn1"])
    conv("asp.conv.conv", params["asp"]["conv2"])
    bn("asp_bn.norm", params["asp_bn"])
    conv("fc.conv", params["fc"])
    return sd


def infer_ecapa_dims(params: Dict[str, Any],
                     fallback: EcapaDims = EcapaDims()) -> EcapaDims:
    """Dims recoverable from a converted pytree's shapes; stride/dilation
    constants (absent from weight shapes) come from ``fallback``. For the
    production speechbrain checkpoint this returns exactly EcapaDims()."""
    import dataclasses
    return dataclasses.replace(
        fallback,
        n_mels=int(np.shape(params["conv1"]["w"])[1]),
        channels=int(np.shape(params["conv1"]["w"])[2]),
        mfa_channels=int(np.shape(params["mfa"]["w"])[2]),
        attention_channels=int(np.shape(params["asp"]["conv1"]["w"])[2]),
        embedding_dim=int(np.shape(params["fc"]["w"])[2]),
        res2net_scale=len(params["blocks"][0]["res2"]) + 1,
    )
