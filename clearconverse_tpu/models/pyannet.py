"""PyanNet speaker segmentation / VAD in functional JAX.

Fills the role of the reference's pyannote pipelines (VAD at
back/api.py:776-781, segmentation inside speaker-diarization-3.1 at
back/api.py:783-792): waveform chunk → per-frame speaker-activity scores.

Architecture follows pyannote's PyanNet: learnable SincNet band-pass
frontend (stride 10, two 3× poolings after each of three conv stages →
frame hop 270 samples ≈ 16.9 ms) → stacked bidirectional LSTM → linear
stack → classifier. Output is either per-speaker sigmoid multilabel or
powerset log-probabilities (segmentation-3.0 style, 7 classes for ≤3
speakers ≤2 simultaneous) — ``powerset_to_multilabel`` converts.

The LSTMs run as ``lax.scan`` over frames — sequential but tiny (128 wide),
while all convs/matmuls batch onto the MXU. Long files are processed as a
batch of overlapping chunks in ONE device call (pipeline/diarize.py), not
pyannote's Python sliding-window loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PyannetDims:
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 2
    linear_dims: Tuple[int, ...] = (128, 128)
    n_classes: int = 7           # powerset(3 speakers, ≤2 simultaneous)
    powerset: bool = True
    sample_rate: int = 16000

    @property
    def frame_hop(self) -> int:
        return self.sinc_stride * self.pool ** 3

    @property
    def frame_hop_seconds(self) -> float:
        return self.frame_hop / self.sample_rate


# Powerset class → speaker members for (3 speakers, ≤2 simultaneous).
POWERSET_CLASSES: List[Tuple[int, ...]] = [
    (), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2)]


def init_pyannet_params(key: jax.Array, dims: PyannetDims = PyannetDims()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 32))

    def lin(n_in, n_out):
        k = next(keys)
        return {"w": jax.random.normal(k, (n_in, n_out)) * n_in ** -0.5,
                "b": jnp.zeros((n_out,))}

    def lstm(n_in, hidden):
        k1, k2 = jax.random.split(next(keys))
        s = (n_in + hidden) ** -0.5
        return {"w_ih": jax.random.normal(k1, (n_in, 4 * hidden)) * s,
                "w_hh": jax.random.normal(k2, (hidden, 4 * hidden)) * s,
                "b": jnp.zeros((4 * hidden,))}

    # ParamSincFB init (asteroid_filterbanks.param_sinc_fb): HTK-mel-spaced
    # band edges over [30 Hz, sr/2 - 100 Hz], HALF as many parameter rows
    # as output channels — each band emits a cos/sin filter pair.
    cutoff = dims.sinc_filters // 2
    mel = np.linspace(2595.0 * np.log10(1 + 30.0 / 700),
                      2595.0 * np.log10(1 + (dims.sample_rate / 2 - 100.0) / 700),
                      cutoff + 1)
    hz = 700.0 * (10.0 ** (mel / 2595.0) - 1)
    low_hz = hz[:-1].astype(np.float32)
    band_hz = np.diff(hz).astype(np.float32)

    p: Dict[str, Any] = {
        "sincnet": {
            "wav_norm": {"g": jnp.ones((1,)), "b": jnp.zeros((1,))},
            "low_hz": jnp.asarray(low_hz),
            "band_hz": jnp.asarray(band_hz),
            "norm0": {"g": jnp.ones((dims.sinc_filters,)), "b": jnp.zeros((dims.sinc_filters,))},
            "conv1": {"w": jax.random.normal(next(keys),
                      (dims.conv_kernel, dims.sinc_filters, dims.conv_channels))
                      * (dims.conv_kernel * dims.sinc_filters) ** -0.5,
                      "b": jnp.zeros((dims.conv_channels,))},
            "norm1": {"g": jnp.ones((dims.conv_channels,)), "b": jnp.zeros((dims.conv_channels,))},
            "conv2": {"w": jax.random.normal(next(keys),
                      (dims.conv_kernel, dims.conv_channels, dims.conv_channels))
                      * (dims.conv_kernel * dims.conv_channels) ** -0.5,
                      "b": jnp.zeros((dims.conv_channels,))},
            "norm2": {"g": jnp.ones((dims.conv_channels,)), "b": jnp.zeros((dims.conv_channels,))},
        },
        "lstm": [],
        "linear": [],
    }
    n_in = dims.conv_channels
    for _ in range(dims.lstm_layers):
        p["lstm"].append({"fwd": lstm(n_in, dims.lstm_hidden),
                          "bwd": lstm(n_in, dims.lstm_hidden)})
        n_in = 2 * dims.lstm_hidden
    for ld in dims.linear_dims:
        p["linear"].append(lin(n_in, ld))
        n_in = ld
    p["classifier"] = lin(n_in, dims.n_classes)
    return p


# ------------------------------------------------------------------ sincnet

def sinc_filters(low_hz: jnp.ndarray, band_hz: jnp.ndarray, kernel: int,
                 sr: int, min_low_hz: float = 50.0,
                 min_band_hz: float = 50.0) -> jnp.ndarray:
    """Learnable analytic band-pass bank [kernel, 1, 2*nb] — asteroid
    ``ParamSincFB`` semantics (what pyannote 3.x wraps in its SincNet:
    ``Encoder(ParamSincFB(80, 251, stride=10))``): ``low_hz``/``band_hz``
    hold nb = n_filters//2 band parameters; each band emits a cos-phase and
    a sin-phase filter, INTERLEAVED (cos0, sin0, cos1, sin1, ...) exactly
    like ``torch.stack([cos, sin], dim=1).view(-1, 1, K)`` so converted
    checkpoint channel order matches the downstream trained convs."""
    low = min_low_hz + jnp.abs(low_hz)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz), min_low_hz, sr / 2)
    band = (high - low)[None, :]                                # [1, nb]

    n = (kernel - 1) // 2
    t = (jnp.arange(-n, 0, dtype=jnp.float32) / sr)[:, None]   # left half
    # np.hamming(kernel)[:n] — SYMMETRIC window (denominator kernel-1).
    window = 0.54 - 0.46 * jnp.cos(
        2 * jnp.pi * jnp.arange(kernel, dtype=jnp.float32)
        / (kernel - 1))[:n, None]
    two_pi_t = 2 * jnp.pi * t
    ft_low = low[None, :] * two_pi_t                            # [n, nb]
    ft_high = high[None, :] * two_pi_t
    # cos filters: even-symmetric band-pass (the classic SincNet shape).
    cos_left = (jnp.sin(ft_high) - jnp.sin(ft_low)) / (two_pi_t / 2) * window
    cos_filt = jnp.concatenate(
        [cos_left, 2 * band, cos_left[::-1]], axis=0) / (2 * band)
    # sin filters: odd-symmetric quadrature mates (center 0, right negated).
    sin_left = (jnp.cos(ft_low) - jnp.cos(ft_high)) / (two_pi_t / 2) * window
    sin_filt = jnp.concatenate(
        [sin_left, jnp.zeros_like(band), -sin_left[::-1]], axis=0) / (2 * band)
    filt = jnp.stack([cos_filt, sin_filt], axis=-1)             # [K, nb, 2]
    filt = filt.reshape(kernel, -1)                             # interleave
    return filt[:, None, :]   # [kernel, in=1, out=2*nb]


def _instance_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
                   mask: Optional[jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    """[B,T,C] per-(instance,channel) normalization over valid frames."""
    if mask is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
    else:
        m = mask[..., None]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=1, keepdims=True) / denom
        var = jnp.sum((x - mean) ** 2 * m, axis=1, keepdims=True) / denom
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _pool_max(x: jnp.ndarray, k: int) -> jnp.ndarray:
    T = (x.shape[1] // k) * k
    x = x[:, :T].reshape(x.shape[0], T // k, k, x.shape[2])
    return jnp.max(x, axis=2)


def sincnet_forward(p: Dict[str, Any], audio: jnp.ndarray,
                    dims: PyannetDims) -> jnp.ndarray:
    """[B, T] waveform → [B, frames, conv_channels]."""
    x = audio[:, :, None]                                   # [B,T,1]
    x = _instance_norm(x, p["wav_norm"], None)
    filt = sinc_filters(p["low_hz"], p["band_hz"], dims.sinc_kernel,
                        dims.sample_rate)
    x = jax.lax.conv_general_dilated(
        x, filt.astype(x.dtype), window_strides=(dims.sinc_stride,),
        padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    x = jnp.abs(x)
    x = jax.nn.leaky_relu(_instance_norm(_pool_max(x, dims.pool), p["norm0"], None))
    for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
        x = jax.lax.conv_general_dilated(
            x, p[conv]["w"].astype(x.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC")) + p[conv]["b"]
        x = jax.nn.leaky_relu(_instance_norm(_pool_max(x, dims.pool), p[norm], None))
    return x


# ------------------------------------------------------------------ lstm

def lstm_forward(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
                 reverse: bool = False) -> jnp.ndarray:
    """Single-direction LSTM over [B, T, D] → [B, T, H] via lax.scan.
    Gate order i, f, g, o (torch layout for direct weight conversion)."""
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    xs = jnp.swapaxes(x, 0, 1)                              # [T,B,D]
    if reverse:
        xs = xs[::-1]
    x_proj = jnp.einsum("tbd,dh->tbh", xs, p["w_ih"],
                        preferred_element_type=jnp.float32) + p["b"]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, x_proj)
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)


def bilstm_forward(layer: Dict[str, Dict[str, jnp.ndarray]],
                   x: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional layer as ONE scan: the backward direction rides along
    as a time-reversed second 'direction' axis, halving the number of
    sequential scans (the BiLSTM is the diarizer's wall-clock bottleneck on
    TPU — scans serialize). Exactly equals fwd‖bwd lstm_forward (tested)."""
    B, T, _ = x.shape
    H = layer["fwd"]["w_hh"].shape[0]
    w_hh = jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])  # [2,H,4H]

    xs = jnp.swapaxes(x, 0, 1)                         # [T,B,D]
    xs2 = jnp.stack([xs, xs[::-1]])                    # [2,T,B,D]
    proj = jnp.stack([
        jnp.einsum("tbd,dh->tbh", xs, layer["fwd"]["w_ih"],
                   preferred_element_type=jnp.float32) + layer["fwd"]["b"],
        jnp.einsum("tbd,dh->tbh", xs[::-1], layer["bwd"]["w_ih"],
                   preferred_element_type=jnp.float32) + layer["bwd"]["b"],
    ])                                                 # [2,T,B,4H]
    proj = jnp.swapaxes(proj, 0, 1)                    # [T,2,B,4H]

    def step(carry, xp):
        h, c = carry                                   # [2,B,H]
        gates = xp + jnp.einsum("dbh,dhg->dbg", h, w_hh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((2, B, H), x.dtype), jnp.zeros((2, B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, proj)             # [T,2,B,H]
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)                 # [B,T,H]
    bwd = jnp.swapaxes(hs[::-1, 1], 0, 1)
    return jnp.concatenate([fwd, bwd], axis=-1)


def pyannet_forward(params: Dict[str, Any], audio: jnp.ndarray,
                    dims: PyannetDims = PyannetDims()) -> jnp.ndarray:
    """[B, T] waveform → [B, frames, n_classes] scores.

    Powerset mode → log-probabilities; multilabel mode → sigmoid probs.
    """
    x = sincnet_forward(params["sincnet"], audio, dims)
    for layer in params["lstm"]:
        x = bilstm_forward(layer, x)
    for lin in params["linear"]:
        x = jax.nn.leaky_relu(x @ lin["w"] + lin["b"])
    x = x @ params["classifier"]["w"] + params["classifier"]["b"]
    if dims.powerset:
        return jax.nn.log_softmax(x, axis=-1)
    return jax.nn.sigmoid(x)


def powerset_to_multilabel(log_probs: jnp.ndarray, n_speakers: int = 3) -> jnp.ndarray:
    """[B, F, 7] powerset log-probs → [B, F, n_speakers] activity probs."""
    probs = jnp.exp(log_probs)
    cols = []
    for spk in range(n_speakers):
        members = [i for i, cls in enumerate(POWERSET_CLASSES) if spk in cls]
        cols.append(jnp.sum(probs[..., members], axis=-1))
    return jnp.stack(cols, axis=-1)


def convert_pyannote_pyannet(sd: Dict[str, Any],
                             dims: PyannetDims = PyannetDims()) -> Dict[str, Any]:
    """pyannote PyanNet lightning state dict → our pytree (keys like
    ``sincnet.conv1d.0.filterbank.low_hz_``, ``lstm.weight_ih_l0``,
    ``linear.0.weight``, ``classifier.weight``).

    pyannote 3.x builds ``conv1d[0] = Encoder(ParamSincFB(...))`` (asteroid
    filterbanks), whose parameters live one level down at ``.filterbank.``;
    the bare spelling is accepted too for older exports."""
    def np_(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def sinc_param(name):
        nested = f"sincnet.conv1d.0.filterbank.{name}"
        return np_(nested if nested in sd else f"sincnet.conv1d.0.{name}")

    p: Dict[str, Any] = {
        "sincnet": {
            "wav_norm": {"g": np_("sincnet.wav_norm1d.weight"),
                         "b": np_("sincnet.wav_norm1d.bias")},
            "low_hz": sinc_param("low_hz_").reshape(-1),
            "band_hz": sinc_param("band_hz_").reshape(-1),
            "norm0": {"g": np_("sincnet.norm1d.0.weight"),
                      "b": np_("sincnet.norm1d.0.bias")},
            "conv1": {"w": np_("sincnet.conv1d.1.weight").transpose(2, 1, 0),
                      "b": np_("sincnet.conv1d.1.bias")},
            "norm1": {"g": np_("sincnet.norm1d.1.weight"),
                      "b": np_("sincnet.norm1d.1.bias")},
            "conv2": {"w": np_("sincnet.conv1d.2.weight").transpose(2, 1, 0),
                      "b": np_("sincnet.conv1d.2.bias")},
            "norm2": {"g": np_("sincnet.norm1d.2.weight"),
                      "b": np_("sincnet.norm1d.2.bias")},
        },
        "lstm": [],
        "linear": [],
    }
    li = 0
    while f"lstm.weight_ih_l{li}" in sd:
        def one(suffix):
            return {
                "w_ih": np_(f"lstm.weight_ih_l{li}{suffix}").T,
                "w_hh": np_(f"lstm.weight_hh_l{li}{suffix}").T,
                "b": np_(f"lstm.bias_ih_l{li}{suffix}") + np_(f"lstm.bias_hh_l{li}{suffix}"),
            }
        p["lstm"].append({"fwd": one(""), "bwd": one("_reverse")})
        li += 1
    i = 0
    while f"linear.{i}.weight" in sd:
        p["linear"].append({"w": np_(f"linear.{i}.weight").T,
                            "b": np_(f"linear.{i}.bias")})
        i += 1
    p["classifier"] = {"w": np_("classifier.weight").T, "b": np_("classifier.bias")}
    return p


def pyannet_to_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our pytree → pyannote PyanNet lightning state-dict naming (exact
    inverse of convert_pyannote_pyannet; numpy values — savers tensorize).
    The converter sums bias_ih+bias_hh, so the inverse puts the whole bias
    in bias_ih. Band parameters take the real pyannote 3.x nesting
    (``Encoder(ParamSincFB)`` at ``.filterbank.``, [n//2, 1] rows). Used by
    the cold-start tests and eval/dress_rehearsal (reference consumer:
    back/api.py:739-750)."""
    sn = params["sincnet"]

    def a(v):
        return np.ascontiguousarray(np.asarray(v))

    sd: Dict[str, np.ndarray] = {
        "sincnet.wav_norm1d.weight": a(sn["wav_norm"]["g"]),
        "sincnet.wav_norm1d.bias": a(sn["wav_norm"]["b"]),
        "sincnet.conv1d.0.filterbank.low_hz_":
            a(np.asarray(sn["low_hz"]).reshape(-1, 1)),
        "sincnet.conv1d.0.filterbank.band_hz_":
            a(np.asarray(sn["band_hz"]).reshape(-1, 1)),
        "sincnet.norm1d.0.weight": a(sn["norm0"]["g"]),
        "sincnet.norm1d.0.bias": a(sn["norm0"]["b"]),
        "sincnet.conv1d.1.weight": a(np.asarray(sn["conv1"]["w"]).transpose(2, 1, 0)),
        "sincnet.conv1d.1.bias": a(sn["conv1"]["b"]),
        "sincnet.norm1d.1.weight": a(sn["norm1"]["g"]),
        "sincnet.norm1d.1.bias": a(sn["norm1"]["b"]),
        "sincnet.conv1d.2.weight": a(np.asarray(sn["conv2"]["w"]).transpose(2, 1, 0)),
        "sincnet.conv1d.2.bias": a(sn["conv2"]["b"]),
        "sincnet.norm1d.2.weight": a(sn["norm2"]["g"]),
        "sincnet.norm1d.2.bias": a(sn["norm2"]["b"]),
        "classifier.weight": a(np.asarray(params["classifier"]["w"]).T),
        "classifier.bias": a(params["classifier"]["b"]),
    }
    for li, layer in enumerate(params["lstm"]):
        for suffix, half in (("", "fwd"), ("_reverse", "bwd")):
            sd[f"lstm.weight_ih_l{li}{suffix}"] = a(np.asarray(layer[half]["w_ih"]).T)
            sd[f"lstm.weight_hh_l{li}{suffix}"] = a(np.asarray(layer[half]["w_hh"]).T)
            sd[f"lstm.bias_ih_l{li}{suffix}"] = a(layer[half]["b"])
            sd[f"lstm.bias_hh_l{li}{suffix}"] = np.zeros_like(
                np.asarray(layer[half]["b"]))
    for i, lin in enumerate(params["linear"]):
        sd[f"linear.{i}.weight"] = a(np.asarray(lin["w"]).T)
        sd[f"linear.{i}.bias"] = a(lin["b"])
    return sd


def infer_pyannet_dims(params: Dict[str, Any],
                       fallback: PyannetDims = PyannetDims()) -> PyannetDims:
    """Dims recoverable from a converted pytree's shapes; the sinc kernel/
    stride and pool constants (absent from weight shapes — the sinc conv is
    parametric) come from ``fallback``. Returns exactly PyannetDims() for
    the production pyannote segmentation checkpoint."""
    import dataclasses
    import numpy as np
    sn = params["sincnet"]
    return dataclasses.replace(
        fallback,
        # Each ParamSincFB band parameter row emits a cos/sin filter PAIR.
        sinc_filters=2 * int(np.shape(sn["low_hz"])[0]),
        conv_kernel=int(np.shape(sn["conv1"]["w"])[0]),
        conv_channels=int(np.shape(sn["conv1"]["w"])[2]),
        lstm_hidden=int(np.shape(params["lstm"][0]["fwd"]["w_hh"])[0]),
        lstm_layers=len(params["lstm"]),
        linear_dims=tuple(int(np.shape(lin["w"])[1])
                          for lin in params["linear"]),
        n_classes=int(np.shape(params["classifier"]["w"])[1]),
    )
