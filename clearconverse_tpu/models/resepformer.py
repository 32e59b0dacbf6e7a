"""RE-SepFormer two-source separation in functional JAX.

Fills the role of the reference's speechbrain ``resepformer-wsj02mix``
separator (back/api.py:705-764 load incl. fine-tuned
encoder/masknet/decoder ckpt triplet; back/api.py:1077 ``separate_batch``
on each overlap subsegment).

Architecture (RE-SepFormer, Della Libera et al.: the resource-efficient
SepFormer variant): learned conv encoder → 50%-overlap chunking → repeats of
{intra-chunk transformer, inter-chunk transformer over per-chunk summary
(mean) tokens} → per-source ReLU masks → transposed-conv decoder with
overlap-add. The inter-chunk stage attending over chunk summaries instead of
full frames is what distinguishes RE-SepFormer from SepFormer and keeps the
attention cost O(S²) per chunk row instead of O((S·K)²).

TPU notes: chunking is a reshape (static shapes); intra attention batches as
[B·S, K, d] and inter as [B, S, d] — both MXU-friendly. Overlap-add in the
decoder is a strided transposed conv, not a scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SepformerDims:
    enc_channels: int = 256      # encoder filters (N)
    enc_kernel: int = 16         # encoder kernel (L), stride L/2
    d_model: int = 256
    n_heads: int = 8
    ff_mult: int = 4
    chunk_size: int = 250        # K
    n_repeats: int = 2           # RE-SepFormer uses fewer repeats than SepFormer
    n_intra_layers: int = 4
    n_inter_layers: int = 4
    n_sources: int = 2

    @property
    def enc_stride(self) -> int:
        return self.enc_kernel // 2


# ------------------------------------------------------------------ init

def _lin(key, n_in, n_out):
    return {"w": jax.random.normal(key, (n_in, n_out)) * n_in ** -0.5,
            "b": jnp.zeros((n_out,))}


def _ln(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _tf_layer(key, d, heads, ff_mult):
    ks = jax.random.split(key, 6)
    return {
        "ln1": _ln(d),
        "attn": {"qkv": _lin(ks[0], d, 3 * d), "out": _lin(ks[1], d, d)},
        "ln2": _ln(d),
        "ff": {"fc1": _lin(ks[2], d, ff_mult * d), "fc2": _lin(ks[3], ff_mult * d, d)},
    }


def init_sepformer_params(key: jax.Array,
                          dims: SepformerDims = SepformerDims()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    d = dims.d_model
    p: Dict[str, Any] = {
        "encoder": {"w": jax.random.normal(next(keys),
                    (dims.enc_kernel, 1, dims.enc_channels))
                    * dims.enc_kernel ** -0.5},
        "bottleneck": {"ln": _ln(dims.enc_channels),
                       "proj": _lin(next(keys), dims.enc_channels, d)},
        "repeats": [],
        "mask_out": {"prelu_a": jnp.asarray(0.25),
                     "proj": _lin(next(keys), d, dims.n_sources * dims.enc_channels)},
        "decoder": {"w": jax.random.normal(next(keys),
                    (dims.enc_kernel, dims.enc_channels, 1))
                    * dims.enc_channels ** -0.5},
    }
    for _ in range(dims.n_repeats):
        p["repeats"].append({
            "intra": [_tf_layer(next(keys), d, dims.n_heads, dims.ff_mult)
                      for _ in range(dims.n_intra_layers)],
            "intra_ln": _ln(d),
            "inter": [_tf_layer(next(keys), d, dims.n_heads, dims.ff_mult)
                      for _ in range(dims.n_inter_layers)],
            "inter_ln": _ln(d),
        })
    return p


# ------------------------------------------------------------------ ops

def _layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _mha(x, p, n_heads):
    B, T, D = x.shape
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = D // n_heads
    q = q.reshape(B, T, n_heads, dh) * dh ** -0.5
    k = k.reshape(B, T, n_heads, dh)
    v = v.reshape(B, T, n_heads, dh)
    w = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                  preferred_element_type=jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(x.dtype), v,
                   preferred_element_type=jnp.float32).reshape(B, T, D)
    return o.astype(x.dtype) @ p["out"]["w"] + p["out"]["b"]


def _tf_forward(x, layers, n_heads):
    for lyr in layers:
        x = x + _mha(_layer_norm(x, lyr["ln1"]), lyr["attn"], n_heads)
        h = _layer_norm(x, lyr["ln2"])
        x = x + jax.nn.relu(h @ lyr["ff"]["fc1"]["w"] + lyr["ff"]["fc1"]["b"]) \
            @ lyr["ff"]["fc2"]["w"] + lyr["ff"]["fc2"]["b"]
    return x


def _positional(T, d, dtype):
    pos = np.arange(T)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / np.power(10000.0, 2 * i / d)
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    return jnp.asarray(pe, dtype)


def _chunk(x: jnp.ndarray, K: int) -> Tuple[jnp.ndarray, int]:
    """[B, T, D] → [B, S, K, D] with 50% overlap (hop K//2), zero-padded."""
    B, T, D = x.shape
    hop = K // 2
    n_chunks = max(1, -(-(max(T - K, 0)) // hop) + 1)
    total = (n_chunks - 1) * hop + K
    x = jnp.pad(x, ((0, 0), (0, total - T), (0, 0)))
    idx = (jnp.arange(n_chunks) * hop)[:, None] + jnp.arange(K)[None, :]
    return x[:, idx], T


def _unchunk(x: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B, S, K, D] 50%-overlap chunks → [B, T, D] by coverage-weighted
    overlap-add (interior /2, edges /1 — uniform gain everywhere).

    Deliberate deviation from speechbrain's ``_over_add`` (which front-pads
    K//2 zeros so EVERY position is covered twice, then sums = uniform 2×):
    our chunking has no front pad, so averaging by coverage is the scheme
    that keeps gain uniform. This matters only for importing a
    speechbrain-TRAINED masknet — which convert_speechbrain_sepformer
    refuses loudly rather than part-loading — not for weights trained or
    exported within this framework."""
    B, S, K, D = x.shape
    hop = K // 2
    total = (S - 1) * hop + K
    idx = ((jnp.arange(S) * hop)[:, None] + jnp.arange(K)[None, :]).reshape(-1)
    out = jnp.zeros((B, total, D), x.dtype)
    out = out.at[:, idx].add(x.reshape(B, S * K, D))
    # Interior positions are covered by exactly 2 chunks.
    weight = jnp.zeros((total,), x.dtype).at[idx].add(1.0)
    return (out / jnp.maximum(weight, 1.0)[None, :, None])[:, :T]


# ------------------------------------------------------------------ model

def sepformer_separate(params: Dict[str, Any], mix: jnp.ndarray,
                       dims: SepformerDims = SepformerDims()) -> jnp.ndarray:
    """[B, T] mixture → [B, T, n_sources] separated waveforms
    (speechbrain ``separate_batch`` contract, back/api.py:1077)."""
    if mix.ndim == 1:
        mix = mix[None]
    B, T = mix.shape

    # Encoder: [B, T', N]
    h = jax.lax.conv_general_dilated(
        mix[:, :, None], params["encoder"]["w"].astype(mix.dtype),
        window_strides=(dims.enc_stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    h = jax.nn.relu(h)
    Tp = h.shape[1]

    x = _layer_norm(h, params["bottleneck"]["ln"])
    x = x @ params["bottleneck"]["proj"]["w"] + params["bottleneck"]["proj"]["b"]

    chunks, _ = _chunk(x, dims.chunk_size)           # [B,S,K,d]
    Bc, S, K, d = chunks.shape
    pe_k = _positional(K, d, chunks.dtype)
    pe_s = _positional(S, d, chunks.dtype)

    for rep in params["repeats"]:
        # Intra-chunk: [B*S, K, d]
        flat = chunks.reshape(B * S, K, d) + pe_k[None]
        flat = _tf_forward(flat, rep["intra"], dims.n_heads)
        chunks = chunks + _layer_norm(flat.reshape(B, S, K, d), rep["intra_ln"])
        # Inter-chunk over per-chunk summary tokens (RE-SepFormer memory).
        summary = jnp.mean(chunks, axis=2) + pe_s[None]          # [B,S,d]
        summary = _tf_forward(summary, rep["inter"], dims.n_heads)
        chunks = chunks + _layer_norm(summary, rep["inter_ln"])[:, :, None, :]

    x = _unchunk(chunks, Tp)                          # [B,T',d]
    a = params["mask_out"]["prelu_a"]
    x = jnp.where(x >= 0, x, a * x)                   # PReLU
    masks = x @ params["mask_out"]["proj"]["w"] + params["mask_out"]["proj"]["b"]
    masks = jax.nn.relu(masks).reshape(B, Tp, dims.n_sources, dims.enc_channels)

    # Decoder per source: transposed conv overlap-add back to waveform.
    outs = []
    for s in range(dims.n_sources):
        masked = h * masks[:, :, s, :]
        y = jax.lax.conv_transpose(
            masked, params["decoder"]["w"].astype(mix.dtype),
            strides=(dims.enc_stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"))[:, :, 0]
        outs.append(y[:, :T])
    out = jnp.stack(outs, axis=-1)
    pad = T - out.shape[1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
    return out


def convert_speechbrain_sepformer(encoder_sd: Dict[str, Any],
                                  masknet_sd: Dict[str, Any],
                                  decoder_sd: Dict[str, Any],
                                  dims: SepformerDims = SepformerDims()) -> Dict[str, Any]:
    """speechbrain ckpt triplet (the reference's resepformer-ft layout,
    back/api.py:727-746) → our pytree. Encoder/decoder convert exactly;
    masknet layers map by module order (golden-test against recorded
    activations when checkpoint assets are present)."""
    def np_(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = init_sepformer_params(jax.random.PRNGKey(0), dims)
    if "conv1d.weight" in encoder_sd:
        params["encoder"]["w"] = np_(encoder_sd["conv1d.weight"]).transpose(2, 1, 0)
    if "conv_tr.weight" in decoder_sd:  # torch ConvTranspose1d [in, out, k]
        # torch's ConvTranspose1d is the GRADIENT-style transposed conv:
        # out[t] = sum_k in[(t-k)/s] * w[k]. jax.lax.conv_transpose (with
        # transpose_kernel=False) is an lhs-dilated plain conv:
        # out[t] = sum_k in[(t+k-K+1)/s] * w[k] — equal only with the
        # kernel FLIPPED along the spatial axis (caught by the full-graph
        # torch golden, tests/test_speaker_golden.py).
        params["decoder"]["w"] = np.ascontiguousarray(
            np_(decoder_sd["conv_tr.weight"]).transpose(2, 0, 1)[::-1])
    # Masknet: exact import for this framework's canonical triplet naming
    # (sepformer_to_state_dicts); other formats keep init values until a
    # reference checkpoint is available to pin speechbrain's exact names.
    if "bottleneck.proj.weight" in masknet_sd:
        params = _import_masknet(params, masknet_sd, np_)
    else:
        # LOUD, not silent: a real speechbrain masknet state dict reaching
        # this branch would otherwise run separation on random-init masknet
        # weights with real encoder/decoder around it — garbage output with
        # no trace (the reference's load_state_dict(strict=False) part-load
        # is equally silent, but it falls back onto DOWNLOADED base weights;
        # we have none). Re-export trained weights through
        # train/checkpoint.py (sepformer_to_state_dicts) to import them.
        import logging
        logging.getLogger(__name__).warning(
            "resepformer masknet state dict uses unrecognized naming "
            "(first keys: %s); masknet stays at random init — only "
            "encoder/decoder were imported. Export checkpoints via "
            "sepformer_to_state_dicts for a full import.",
            sorted(masknet_sd)[:3])
    return params


def _lin_in(sd, pre, np_):
    p = {"w": np_(sd[f"{pre}.weight"]).T}
    if f"{pre}.bias" in sd:
        p["b"] = np_(sd[f"{pre}.bias"])
    return p


def _ln_in(sd, pre, np_):
    return {"g": np_(sd[f"{pre}.weight"]), "b": np_(sd[f"{pre}.bias"])}


def _import_masknet(params, sd, np_):
    mn = params
    mn["bottleneck"] = {"ln": _ln_in(sd, "bottleneck.norm", np_),
                        "proj": _lin_in(sd, "bottleneck.proj", np_)}

    def tf_layer(pre):
        return {
            "ln1": _ln_in(sd, f"{pre}.ln1", np_),
            "attn": {"qkv": _lin_in(sd, f"{pre}.attn.qkv", np_),
                     "out": _lin_in(sd, f"{pre}.attn.out", np_)},
            "ln2": _ln_in(sd, f"{pre}.ln2", np_),
            "ff": {"fc1": _lin_in(sd, f"{pre}.ff.fc1", np_),
                   "fc2": _lin_in(sd, f"{pre}.ff.fc2", np_)},
        }

    repeats = []
    r = 0
    while f"repeats.{r}.intra_norm.weight" in sd:
        intra, inter = [], []
        i = 0
        while f"repeats.{r}.intra.{i}.ln1.weight" in sd:
            intra.append(tf_layer(f"repeats.{r}.intra.{i}"))
            i += 1
        i = 0
        while f"repeats.{r}.inter.{i}.ln1.weight" in sd:
            inter.append(tf_layer(f"repeats.{r}.inter.{i}"))
            i += 1
        repeats.append({
            "intra": intra,
            "intra_ln": _ln_in(sd, f"repeats.{r}.intra_norm", np_),
            "inter": inter,
            "inter_ln": _ln_in(sd, f"repeats.{r}.inter_norm", np_),
        })
        r += 1
    mn["repeats"] = repeats
    mn["mask_out"] = {"prelu_a": np_(sd["mask.prelu.weight"]).reshape(()),
                      "proj": _lin_in(sd, "mask.proj", np_)}
    return mn


def infer_sepformer_dims(params: Dict[str, Any],
                         fallback: SepformerDims = SepformerDims()
                         ) -> SepformerDims:
    """Dims recoverable from a converted pytree's shapes; the head count and
    chunk size (absent from weight shapes) come from ``fallback``. Returns
    exactly SepformerDims() for the reference's RE-SepFormer triplet."""
    import dataclasses
    enc_w = params["encoder"]["w"]
    enc_channels = int(np.shape(enc_w)[2])
    d_model = int(np.shape(params["bottleneck"]["proj"]["w"])[1])
    rep = params["repeats"][0]
    return dataclasses.replace(
        fallback,
        enc_channels=enc_channels,
        enc_kernel=int(np.shape(enc_w)[0]),
        d_model=d_model,
        ff_mult=int(np.shape(rep["intra"][0]["ff"]["fc1"]["w"])[1]) // d_model,
        n_repeats=len(params["repeats"]),
        n_intra_layers=len(rep["intra"]),
        n_inter_layers=len(rep["inter"]),
        n_sources=int(np.shape(params["mask_out"]["proj"]["w"])[1])
        // enc_channels,
    )


def sepformer_to_state_dicts(params: Dict[str, Any]):
    """Export our params as the ckpt triplet (encoder, masknet, decoder)
    state dicts in this framework's canonical naming — the reference's
    resepformer-ft layout (back/api.py:727-746), round-trippable through
    convert_speechbrain_sepformer."""
    def t(x):
        return np.asarray(x)

    encoder_sd = {"conv1d.weight": t(params["encoder"]["w"]).transpose(2, 1, 0)}
    # ours [k, in, out] (spatially flipped, see convert_speechbrain_sepformer)
    # -> torch ConvTranspose1d [in, out, k]
    decoder_sd = {"conv_tr.weight": np.ascontiguousarray(
        t(params["decoder"]["w"])[::-1].transpose(1, 2, 0))}

    sd: Dict[str, np.ndarray] = {}

    def put_lin(pre, p):
        sd[f"{pre}.weight"] = t(p["w"]).T
        if "b" in p:
            sd[f"{pre}.bias"] = t(p["b"])

    def put_ln(pre, p):
        sd[f"{pre}.weight"] = t(p["g"])
        sd[f"{pre}.bias"] = t(p["b"])

    put_ln("bottleneck.norm", params["bottleneck"]["ln"])
    put_lin("bottleneck.proj", params["bottleneck"]["proj"])
    for r, rep in enumerate(params["repeats"]):
        for kind in ("intra", "inter"):
            for i, lyr in enumerate(rep[kind]):
                pre = f"repeats.{r}.{kind}.{i}"
                put_ln(f"{pre}.ln1", lyr["ln1"])
                put_lin(f"{pre}.attn.qkv", lyr["attn"]["qkv"])
                put_lin(f"{pre}.attn.out", lyr["attn"]["out"])
                put_ln(f"{pre}.ln2", lyr["ln2"])
                put_lin(f"{pre}.ff.fc1", lyr["ff"]["fc1"])
                put_lin(f"{pre}.ff.fc2", lyr["ff"]["fc2"])
            put_ln(f"repeats.{r}.{kind}_norm", rep[f"{kind}_ln"])
    sd["mask.prelu.weight"] = t(params["mask_out"]["prelu_a"]).reshape(1)
    put_lin("mask.proj", params["mask_out"]["proj"])
    return encoder_sd, sd, decoder_sd
