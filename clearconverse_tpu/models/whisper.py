"""Whisper encoder-decoder in functional JAX.

Architecture parity target: openai-whisper's ``model.py`` as consumed by the
reference (back/api.py:657-703 loads ``small.en`` + optional fine-tuned
overlay; back/api.py:1282-1296 transcribes). Everything here is shape-static
and jit-friendly; decoding lives in models/decoding.py.

Param pytree layout mirrors the openai checkpoint state dict (see
models/convert.py), with linear weights stored ``[in, out]``:

  encoder: conv1/conv2 {w,b}, pos [ctx,d], blocks[i] {attn_ln, attn{q,k,v,out},
           mlp_ln, mlp{fc1,fc2}}, ln_post
  decoder: tok [vocab,d], pos [ctx,d], blocks[i] {attn_ln, attn, cross_ln,
           cross, mlp_ln, mlp}, ln

TPU notes: matmuls run in ``compute_dtype`` (bf16 by default) with f32
accumulation (``preferred_element_type``); layernorm and softmax stay f32.
Attention uses whisper's (d_head)^-0.25 scaling on both q and k.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    """Model hyperparameters (openai ModelDimensions)."""

    n_mels: int = 80
    n_vocab: int = 51864
    n_audio_ctx: int = 1500
    n_audio_state: int = 768
    n_audio_head: int = 12
    n_audio_layer: int = 12
    n_text_ctx: int = 448
    n_text_state: int = 768
    n_text_head: int = 12
    n_text_layer: int = 12

    @property
    def head_dim(self) -> int:
        return self.n_text_state // self.n_text_head


# Published whisper model sizes. English-only (.en) models use the 51864
# vocab; multilingual use 51865 (tiny..medium) — large is not in the
# reference's menu (back/api.py:131 defaults small.en).
# name → (state, heads, encoder layers, decoder layers); the full
# openai-whisper family (the reference defaults to small.en, api.py:131,
# but whisper_model_size is a free Config field).
_SIZES = {
    "tiny": (384, 6, 4, 4), "base": (512, 8, 6, 6),
    "small": (768, 12, 12, 12), "medium": (1024, 16, 24, 24),
    "large": (1280, 20, 32, 32), "large-v1": (1280, 20, 32, 32),
    "large-v2": (1280, 20, 32, 32), "large-v3": (1280, 20, 32, 32),
    "turbo": (1280, 20, 32, 4), "large-v3-turbo": (1280, 20, 32, 4),
}
# large-v3 family: 128-bin mel frontend and one extra vocab entry.
_V3 = ("large-v3", "turbo", "large-v3-turbo")


def model_dims(name: str) -> WhisperDims:
    english = name.endswith(".en")
    size = name[:-3] if english else name
    if size not in _SIZES:
        raise ValueError(f"unknown whisper model {name!r}")
    d, h, enc_l, dec_l = _SIZES[size]
    if english:
        n_vocab = 51864
    else:
        n_vocab = 51866 if size in _V3 else 51865
    return WhisperDims(
        n_mels=128 if size in _V3 else 80,
        n_vocab=n_vocab,
        n_audio_state=d, n_audio_head=h, n_audio_layer=enc_l,
        n_text_state=d, n_text_head=h, n_text_layer=dec_l,
    )


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """openai whisper's fixed encoder positional table."""
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# ------------------------------------------------------------------ init

def _linear(key, n_in, n_out, bias=True, scale=None):
    scale = scale if scale is not None else n_in ** -0.5
    p = {"w": jax.random.normal(key, (n_in, n_out), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((n_out,), jnp.float32)
    return p


def _ln(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _block(key, d, cross: bool):
    ks = jax.random.split(key, 8)
    p = {
        "attn_ln": _ln(d),
        "attn": {"q": _linear(ks[0], d, d), "k": _linear(ks[1], d, d, bias=False),
                 "v": _linear(ks[2], d, d), "out": _linear(ks[3], d, d)},
        "mlp_ln": _ln(d),
        "mlp": {"fc1": _linear(ks[4], d, 4 * d), "fc2": _linear(ks[5], 4 * d, d)},
    }
    if cross:
        p["cross_ln"] = _ln(d)
        p["cross"] = {"q": _linear(ks[6], d, d), "k": _linear(ks[7], d, d, bias=False),
                      "v": _linear(ks[6], d, d), "out": _linear(ks[7], d, d)}
    return p


def init_whisper_params(key: jax.Array, dims: WhisperDims) -> Dict[str, Any]:
    ke, kd = jax.random.split(key)
    d = dims.n_audio_state
    enc_keys = jax.random.split(ke, dims.n_audio_layer + 2)
    dec_keys = jax.random.split(kd, dims.n_text_layer + 2)
    encoder = {
        "conv1": {"w": jax.random.normal(enc_keys[0], (3, dims.n_mels, d)) * (3 * dims.n_mels) ** -0.5,
                  "b": jnp.zeros((d,))},
        "conv2": {"w": jax.random.normal(enc_keys[1], (3, d, d)) * (3 * d) ** -0.5,
                  "b": jnp.zeros((d,))},
        "pos": jnp.asarray(sinusoids(dims.n_audio_ctx, d)),
        "blocks": [_block(enc_keys[i + 2], d, cross=False) for i in range(dims.n_audio_layer)],
        "ln_post": _ln(d),
    }
    dt = dims.n_text_state
    decoder = {
        "tok": jax.random.normal(dec_keys[0], (dims.n_vocab, dt)) * dt ** -0.5,
        "pos": jax.random.normal(dec_keys[1], (dims.n_text_ctx, dt)) * dt ** -0.5,
        "blocks": [_block(dec_keys[i + 2], dt, cross=True) for i in range(dims.n_text_layer)],
        "ln": _ln(dt),
    }
    return {"encoder": encoder, "decoder": decoder}


# ------------------------------------------------------------------ ops

def layer_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return out.astype(x.dtype)


def dense(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if "wq" in p:  # int8 per-channel quantized leaf (ops/quantize.py)
        from clearconverse_tpu.ops.quantize import dense_quantized
        return dense_quantized(x, p)
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              bias: Optional[jnp.ndarray], n_head: int) -> jnp.ndarray:
    """q:[B,Tq,D] k,v:[B,Tk,D] bias:[B,1,Tq,Tk] additive (f32) → [B,Tq,D].

    Whisper scaling: q and k each scaled by head_dim**-0.25.
    """
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * jnp.asarray(scale, q.dtype)
    kh = _split_heads(k, n_head) * jnp.asarray(scale, k.dtype)
    vh = _split_heads(v, n_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh, preferred_element_type=jnp.float32)
    return out.reshape(q.shape).astype(q.dtype)


def _mlp(x, p):
    return dense(jax.nn.gelu(dense(x, p["fc1"]), approximate=False), p["fc2"])


def _flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     n_head: int) -> jnp.ndarray:
    """Encoder self-attention via the Pallas TPU flash kernel (blockwise
    online softmax, no materialized [B, H, T, T]). MEASURED SLOWER than the
    naive einsum at whisper's shapes on v5e (B=32, T=1500, dh=64: 479 ms vs
    240 ms bf16) — dh=64 underfills the kernel's lanes — so the auto-path is
    disabled; kept for larger-head models and future tuning."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, T, D = q.shape
    dh = D // n_head
    Tp = ((T + 511) // 512) * 512

    def heads(x):
        x = x.reshape(B, T, n_head, dh).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    seg = jnp.broadcast_to((jnp.arange(Tp) < T).astype(jnp.int32)[None],
                           (B, Tp))
    out = flash_attention(heads(q), heads(k), heads(v),
                          segment_ids=SegmentIds(seg, seg),
                          sm_scale=dh ** -0.5)
    return out[:, :, :T, :].transpose(0, 2, 1, 3).reshape(B, T, D)


def _use_flash(T: int, enabled: bool = False) -> bool:
    # Disabled by default: see _flash_attention docstring (measured slower
    # for whisper's dh=64 on v5e; naive einsum wins — re-confirmed at
    # B=128: 469 ms einsum vs 1851 ms flash for the full encoder).
    if not enabled or T < 512:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False


def _use_pallas_attn(T: int, B: int, n_head: int, dh: int,
                     enabled: bool = True) -> bool:
    # First-party Pallas encoder-attention kernel
    # (ops/pallas/encoder_attention.py): keeps the [T, T] logits in VMEM
    # instead of round-tripping them through HBM. Measured full-encoder
    # (small.en, T=1500, bf16): B=32 243→149 ms (-39%); B=64 ~tied;
    # B=128 469→499 ms — XLA's fused einsum wins at large B, so the
    # kernel serves the engine's small decode batches only. Differentiable
    # (custom VJP through the einsum), so the finetune path may take it.
    if not enabled or T < 256 or B > 48:
        return False
    from clearconverse_tpu.ops.pallas.encoder_attention import supports_shape
    if not supports_shape(n_head, dh):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# ------------------------------------------------------------------ encoder

def whisper_encode(params: Dict[str, Any], mel: jnp.ndarray, dims: WhisperDims,
                   compute_dtype: jnp.dtype = jnp.float32,
                   pallas_attn_enabled: bool = True) -> jnp.ndarray:
    """[B, n_mels, T_frames] log-mel → [B, T_frames//2, d] audio features.

    ``pallas_attn_enabled=False`` (TPUConfig.pallas_encoder_attn) forces the
    plain einsum attention in every batch regime — the Pallas kernel only
    runs at B<=48, so without the opt-out the same audio could see slightly
    different encoder numerics depending on batch composition (ADVICE r2)."""
    enc = params["encoder"]
    x = jnp.transpose(mel, (0, 2, 1)).astype(compute_dtype)  # [B, T, mels]
    x = jax.nn.gelu(_conv1d(x, enc["conv1"], stride=1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"], stride=2), approximate=False)
    x = x + enc["pos"][: x.shape[1]].astype(compute_dtype)
    flash = _use_flash(x.shape[1])
    pallas_attn = _use_pallas_attn(
        x.shape[1], x.shape[0], dims.n_audio_head,
        dims.n_audio_state // dims.n_audio_head,
        enabled=pallas_attn_enabled)
    for blk in enc["blocks"]:
        h = layer_norm(x, blk["attn_ln"])
        qkv = blk["attn"]
        q, k, v = dense(h, qkv["q"]), dense(h, qkv["k"]), dense(h, qkv["v"])
        if flash:
            h = _flash_attention(q, k, v, dims.n_audio_head)
        elif pallas_attn:
            from clearconverse_tpu.ops.pallas.encoder_attention import (
                encoder_attention_pallas)
            h = encoder_attention_pallas(q, k, v, dims.n_audio_head)
        else:
            h = attention(q, k, v, None, dims.n_audio_head)
        x = x + dense(h, qkv["out"])
        x = x + _mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])
    return layer_norm(x, enc["ln_post"])


def _conv1d(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride: int) -> jnp.ndarray:
    """[B,T,Cin] with kernel [k,Cin,Cout], SAME padding (k=3, pad 1)."""
    # No preferred_element_type: its AD transpose mixes dtypes under bf16
    # (cotangent f32 vs kernel bf16). TPU convs accumulate f32 regardless.
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return (y + p["b"]).astype(x.dtype)


# ------------------------------------------------------------------ decoder

def stack_decoder(params: Dict[str, Any]) -> Dict[str, Any]:
    """Stack the decoder block list into one pytree of [L, ...] leaves so
    decoder_forward can ``lax.scan`` over layers — collapsing the per-step
    instruction count ~12× (the decode loop on this platform is per-op
    overhead-bound, not FLOP/HBM-bound; measured). Pure data movement; the
    unstacked tree is untouched."""
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dec["blocks"]
    if isinstance(blocks, dict):   # already stacked
        return params
    dec["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    out["decoder"] = dec
    return out


def precompute_cross_kv(params: Dict[str, Any], audio: jnp.ndarray,
                        bits: int = 16,
                        n_head: Optional[int] = None) -> List[Dict[str, jnp.ndarray]]:
    """Per-layer cross-attention K/V from encoder output (computed once per
    segment, re-read EVERY decode step — measured as the decode loop's HBM
    bottleneck on v5e). ``bits`` ∈ {16, 8, 4} stores K/V quantized per
    channel, cutting the per-step stream 2×/4×.

    ``n_head`` set → the head-major decode layout: K as [B, H, dh, T] and
    V as [B, H, T, dh]. The default [B, T, D] layout makes XLA re-transpose
    the full K/V every decode step (measured on v5e: 13.4 ms/step bf16,
    6.8 ms/step int8 at B=32/T=1500); head-major streams at near-peak HBM
    (2.7 ms bf16, 1.7 ms int8). Legacy layout kept for full-sequence
    consumers (train/finetune.py, models/alignment.py)."""
    blocks = params["decoder"]["blocks"]
    if isinstance(blocks, dict):   # stacked decoder: one einsum for all layers
        cw = blocks["cross"]
        k = jnp.einsum("btd,ldo->lbto", audio, cw["k"]["w"].astype(audio.dtype),
                       preferred_element_type=jnp.float32).astype(audio.dtype)
        v = jnp.einsum("btd,ldo->lbto", audio, cw["v"]["w"].astype(audio.dtype),
                       preferred_element_type=jnp.float32).astype(audio.dtype)
        v = v + cw["v"]["b"][:, None, None, :].astype(audio.dtype)
        if n_head is not None:
            return _to_head_major(k, v, n_head, bits)
        if bits in (4, 8):
            return {"k8": _quant_kv(k, bits), "v8": _quant_kv(v, bits)}
        return {"k": k, "v": v}
    out = []
    for blk in blocks:
        if n_head is not None:
            out.append(_head_major_kv_direct(audio, blk["cross"], n_head,
                                             bits))
            continue
        k = dense(audio, blk["cross"]["k"])
        v = dense(audio, blk["cross"]["v"])
        if bits in (4, 8):
            out.append({"k8": _quant_kv(k, bits), "v8": _quant_kv(v, bits)})
        else:
            out.append({"k": k, "v": v})
    return out


def _head_major_kv_direct(audio: jnp.ndarray, cross: Dict[str, Any],
                          n_head: int, bits: int) -> Dict[str, jnp.ndarray]:
    """Project K/V straight into the head-major decode layout: the einsum
    emits [B,H,dh,T] / [B,H,T,dh] directly instead of dense() → transpose
    (164 ms → 93 ms for the 12-layer int8 precompute at B=128 — the
    intermediate [B,T,D] round-trips were half the cost). int8-quantized
    projection leaves ({"wq","scale"}, ops/quantize.py) keep the dense()
    dispatch + transpose path."""
    if "w" not in cross["k"] or "w" not in cross["v"]:
        k = dense(audio, cross["k"])
        v = dense(audio, cross["v"])
        return _to_head_major(k, v, n_head, bits)
    D = audio.shape[-1]
    dh = D // n_head
    wk = cross["k"]["w"].reshape(D, n_head, dh)
    kt = jnp.einsum("btd,dhc->bhct", audio, wk.astype(audio.dtype),
                    preferred_element_type=jnp.float32)
    if "b" in cross["k"]:
        kt = kt + cross["k"]["b"].reshape(n_head, dh)[None, :, :, None]
    wv = cross["v"]["w"].reshape(D, n_head, dh)
    vt = jnp.einsum("btd,dhc->bhtc", audio, wv.astype(audio.dtype),
                    preferred_element_type=jnp.float32)
    if "b" in cross["v"]:
        vt = vt + cross["v"]["b"].reshape(n_head, dh)[None, :, None, :]
    kt = kt.astype(audio.dtype)
    vt = vt.astype(audio.dtype)
    if bits in (4, 8):
        return {"k8t": _quant_kv(kt, bits, axis=-1),
                "v8t": _quant_kv(vt, bits, axis=-2)}
    return {"kt": kt, "vt": vt}


def _to_head_major(k: jnp.ndarray, v: jnp.ndarray, n_head: int,
                   bits: int) -> Dict[str, jnp.ndarray]:
    """[..., T, D] K/V → head-major decode layout (K [..., H, dh, T],
    V [..., H, T, dh]), optionally quantized per-d-channel over T — the
    same scale semantics as the legacy layout."""
    *lead, T, D = k.shape
    dh = D // n_head
    nd = k.ndim
    perm_in = tuple(range(nd - 2)) + (nd - 1, nd, nd - 2)   # [..,H,dh,T]
    kt = jnp.transpose(k.reshape(*lead, T, n_head, dh), perm_in)
    perm_v = tuple(range(nd - 2)) + (nd - 1, nd - 2, nd)    # [..,H,T,dh]
    vt = jnp.transpose(v.reshape(*lead, T, n_head, dh), perm_v)
    if bits in (4, 8):
        return {"k8t": _quant_kv(kt, bits, axis=-1),
                "v8t": _quant_kv(vt, bits, axis=-2)}
    return {"kt": kt, "vt": vt}


def _quant_kv(x: jnp.ndarray, bits: int = 8, axis: int = -2) -> Dict[str, jnp.ndarray]:
    """int8/int4 values + per-channel scales (amax over ``axis`` — the T
    axis: -2 for [..., T, D] layouts, -1 for head-major K [..., dh, T])."""
    qmax = 127.0 if bits == 8 else 7.0
    dtype = jnp.int8 if bits == 8 else jnp.int4
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -qmax, qmax)
    return {"q": q.astype(dtype), "scale": scale.astype(jnp.float32)}


def _dequant_kv(p: Dict[str, jnp.ndarray], dtype) -> jnp.ndarray:
    return (p["q"].astype(dtype) * p["scale"].astype(dtype))


def _cross_attention_head_major(q: jnp.ndarray, ckv: Dict[str, Any],
                                n_head: int, mask: Optional[jnp.ndarray],
                                cdt) -> jnp.ndarray:
    """Cross-attention against head-major K/V (see precompute_cross_kv).

    The whole dh**-0.5 scaling — and, when quantized, K's per-channel
    dequant scale — folds into the tiny q tensor, so the K/V HBM stream is
    consumed by the einsums directly with no per-step transpose or
    dequantized materialization (the decode loop's measured bottleneck).

    Replica-grouped decode (DecodeOptions.replicas > 1): when q carries
    R = B_q // B_kv sampling replicas per source row (replica rows
    CONSECUTIVE per row, np.repeat order), the replicas fold into the
    query axis — cross-attention has no structure across queries — so the
    K/V stream is read ONCE per source row per step instead of once per
    replica. Cross-KV streaming is the decode loop's HBM bottleneck, so
    best_of=5 sampling (the reference's default decode config,
    back/api.py:1294 → whisper DecodingOptions(best_of=5)) pays ~1/5 the
    dominant stream vs tiling rows on the host."""
    B, Tq, Dm = q.shape
    dh = Dm // n_head
    kv_b = (ckv["k8t"]["q"] if "k8t" in ckv else ckv["kt"]).shape[0]
    rep = B // kv_b
    if rep > 1:
        assert mask is None, "grouped cross-attention takes no mask"
        # [B, Tq, D] -> [B_kv, R*Tq, H, dh]: the (R, Tq) axes are adjacent
        # in row-major order, so one reshape folds replicas into queries.
        qh = jnp.transpose(q.reshape(kv_b, rep * Tq, n_head, dh),
                           (0, 2, 1, 3))
    else:
        qh = jnp.transpose(q.reshape(B, Tq, n_head, dh), (0, 2, 1, 3))
    if "k8t" in ckv:
        kscale = jnp.swapaxes(ckv["k8t"]["scale"], -1, -2)   # [B,H,1,dh]
        qs = (qh.astype(jnp.float32) * kscale * dh ** -0.5).astype(cdt)
        kt = ckv["k8t"]["q"].astype(cdt)
        vt = ckv["v8t"]["q"].astype(cdt)
        vscale = ckv["v8t"]["scale"]                          # [B,H,1,dh]
    else:
        qs = qh * jnp.asarray(dh ** -0.5, qh.dtype)
        kt = ckv["kt"].astype(cdt)
        vt = ckv["vt"].astype(cdt)
        vscale = None
    logits = jnp.einsum("bhqd,bhdt->bhqt", qs, kt,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(cdt)
    out = jnp.einsum("bhqt,bhtd->bhqd", w, vt,
                     preferred_element_type=jnp.float32)
    if vscale is not None:
        out = out * vscale
    return jnp.transpose(out.astype(cdt), (0, 2, 1, 3)).reshape(B, Tq, Dm)


def init_kv_cache(dims: WhisperDims, batch: int, max_len: int,
                  dtype: jnp.dtype = jnp.float32, stacked: bool = False,
                  bits: int = 16):
    """Self-attention KV cache, head-major decode layout: K [B,H,dh,M],
    V [B,H,M,dh] per layer (leading L axis when ``stacked``). Same
    rationale as the cross-KV layout (precompute_cross_kv): the decode
    loop re-reads the whole cache every step, and the row-major [B,M,D]
    layout makes XLA re-transpose it per step.

    ``bits=8`` stores int8 values with per-position f32 scales (amax over
    the dh axis per cache slot) — halving the per-step cache stream. The
    per-position scale is EXACT to fold: K's scale multiplies the logits
    column after the dh contraction; V's scale folds into the attention
    weights before the V matmul."""
    H, dh = dims.n_text_head, dims.n_text_state // dims.n_text_head
    lead = (dims.n_text_layer,) if stacked else ()
    if bits not in (8, 16):
        raise ValueError(f"self-KV cache width must be 16 or 8, got {bits}")
    if bits == 8:
        cell = {"kq": jnp.zeros(lead + (batch, H, dh, max_len), jnp.int8),
                "ks": jnp.zeros(lead + (batch, H, 1, max_len), jnp.float32),
                "vq": jnp.zeros(lead + (batch, H, max_len, dh), jnp.int8),
                "vs": jnp.zeros(lead + (batch, H, max_len, 1), jnp.float32)}
        return cell if stacked else [dict(cell) for _ in range(dims.n_text_layer)]
    kt = jnp.zeros(lead + (batch, H, dh, max_len), dtype)
    vt = jnp.zeros(lead + (batch, H, max_len, dh), dtype)
    if stacked:
        return {"kt": kt, "vt": vt}
    return [{"kt": kt, "vt": vt} for _ in range(dims.n_text_layer)]


def decoder_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,            # [B, T] token ids
    positions: jnp.ndarray,         # [B, T] absolute positions (pos-embed rows)
    cache_index: jnp.ndarray,       # scalar: write offset into the KV cache
    self_kv: List[Dict[str, jnp.ndarray]],   # running cache (init_kv_cache)
    cross_kv: List[Dict[str, jnp.ndarray]],  # [B, audio_ctx, d]
    self_mask: jnp.ndarray,         # [B, 1, T, max_len] additive f32
    cross_mask: Optional[jnp.ndarray],  # [B, 1, 1, audio_ctx] or None
    dims: WhisperDims,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, List[Dict[str, jnp.ndarray]]]:
    """One decoder pass over T tokens (prefill: T=prompt len; step: T=1).

    Returns (logits [B, T, vocab] f32, updated self_kv). The cache is written
    at ``cache_index``; ``self_mask`` must hide future/invalid cache slots.
    """
    dec = params["decoder"]
    x = dec["tok"][tokens].astype(compute_dtype) + dec["pos"][positions].astype(compute_dtype)

    H = dims.n_text_head
    dh = dims.n_text_state // H

    def layer(x, blk, skv, ckv):
        h = layer_norm(x, blk["attn_ln"])
        q = dense(h, blk["attn"]["q"])
        k_new = dense(h, blk["attn"]["k"])
        v_new = dense(h, blk["attn"]["v"])
        if "kt" in skv or "kq" in skv:
            # Head-major cache (init_kv_cache): the per-step K/V stream is
            # consumed by the einsums directly — no per-step transpose of
            # the full cache (the same measured win as head-major cross-KV).
            B_, T_, D_ = q.shape
            kn = jnp.transpose(k_new.reshape(B_, T_, H, dh), (0, 2, 3, 1))
            vn = jnp.transpose(v_new.reshape(B_, T_, H, dh), (0, 2, 1, 3))
            qh = jnp.transpose(q.reshape(B_, T_, H, dh), (0, 2, 1, 3))
            qh = qh * jnp.asarray(dh ** -0.5, qh.dtype)
            if "kq" in skv:
                # int8 cache: per-position scales (amax over dh) are exact
                # to fold — K's into the logits columns after the dh
                # contraction, V's into the attention weights.
                # clip matches _quant_kv: without it a non-finite sample
                # (NaN/inf audio upstream) makes the f32->int8 cast
                # undefined instead of saturating.
                ks_n = jnp.max(jnp.abs(kn.astype(jnp.float32)), axis=2,
                               keepdims=True) / 127.0
                kq_n = jnp.clip(jnp.round(kn.astype(jnp.float32)
                                          / jnp.maximum(ks_n, 1e-12)),
                                -127, 127).astype(jnp.int8)
                vs_n = jnp.max(jnp.abs(vn.astype(jnp.float32)), axis=3,
                               keepdims=True) / 127.0
                vq_n = jnp.clip(jnp.round(vn.astype(jnp.float32)
                                          / jnp.maximum(vs_n, 1e-12)),
                                -127, 127).astype(jnp.int8)
                kq = jax.lax.dynamic_update_slice(
                    skv["kq"], kq_n, (0, 0, 0, cache_index))
                ks = jax.lax.dynamic_update_slice(
                    skv["ks"], ks_n, (0, 0, 0, cache_index))
                vq = jax.lax.dynamic_update_slice(
                    skv["vq"], vq_n, (0, 0, cache_index, 0))
                vs = jax.lax.dynamic_update_slice(
                    skv["vs"], vs_n, (0, 0, cache_index, 0))
                logits = jnp.einsum("bhqd,bhdm->bhqm", qh,
                                    kq.astype(compute_dtype),
                                    preferred_element_type=jnp.float32)
                logits = logits * ks + self_mask
                w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                w = (w * jnp.swapaxes(vs, -1, -2)).astype(compute_dtype)
                o = jnp.einsum("bhqm,bhmd->bhqd", w,
                               vq.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
                new_skv = {"kq": kq, "ks": ks, "vq": vq, "vs": vs}
            else:
                k_all = jax.lax.dynamic_update_slice(
                    skv["kt"], kn.astype(skv["kt"].dtype),
                    (0, 0, 0, cache_index))
                v_all = jax.lax.dynamic_update_slice(
                    skv["vt"], vn.astype(skv["vt"].dtype),
                    (0, 0, cache_index, 0))
                logits = jnp.einsum("bhqd,bhdm->bhqm", qh,
                                    k_all.astype(compute_dtype),
                                    preferred_element_type=jnp.float32)
                logits = logits + self_mask
                w = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(compute_dtype)
                o = jnp.einsum("bhqm,bhmd->bhqd", w,
                               v_all.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
                new_skv = {"kt": k_all, "vt": v_all}
            h = jnp.transpose(o.astype(compute_dtype),
                              (0, 2, 1, 3)).reshape(B_, T_, D_)
        else:
            raise ValueError("self-KV cache must come from init_kv_cache "
                             "(head-major {'kt','vt'} or int8 layout)")
        x = x + dense(h, blk["attn"]["out"])

        h = layer_norm(x, blk["cross_ln"])
        if "kt" in ckv or "k8t" in ckv:
            h = _cross_attention_head_major(
                dense(h, blk["cross"]["q"]), ckv, dims.n_text_head,
                cross_mask, compute_dtype)
        else:
            if "k8" in ckv:
                ck = _dequant_kv(ckv["k8"], compute_dtype)
                cv = _dequant_kv(ckv["v8"], compute_dtype)
            else:
                ck = ckv["k"].astype(compute_dtype)
                cv = ckv["v"].astype(compute_dtype)
            h = attention(dense(h, blk["cross"]["q"]), ck, cv,
                          cross_mask, dims.n_text_head)
        x = x + dense(h, blk["cross"]["out"])
        x = x + _mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])
        return x, new_skv

    if isinstance(dec["blocks"], dict):
        # Stacked decoder (stack_decoder): scan over layers — ~12× fewer
        # instructions per decode step (the loop is per-op-overhead-bound on
        # this platform, measured).
        def body(carry, sliced):
            blk, skv, ckv = sliced
            return layer(carry, blk, skv, ckv)

        x, new_kv = jax.lax.scan(body, x, (dec["blocks"], self_kv, cross_kv))
    else:
        new_kv = []
        for blk, skv, ckv in zip(dec["blocks"], self_kv, cross_kv):
            x, kv = layer(x, blk, skv, ckv)
            new_kv.append(kv)

    x = layer_norm(x, dec["ln"])
    # Logits in compute_dtype with f32 accumulation: halves the per-step
    # token-table read in bf16 mode (159 MB f32 otherwise); argmax margins
    # dwarf bf16 noise. f32 mode is unchanged.
    logits = jnp.dot(x.astype(compute_dtype),
                     dec["tok"].T.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return logits, new_kv
