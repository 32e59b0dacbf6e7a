"""Golden tests for the speaker-model stacks against hand-built torch
references (VERDICT r1 #5): SincNet band-pass conv stack, SE-Res2Net blocks,
attentive-stats pooling, and the sepformer transformer layer all verify
against independent torch implementations through the weight converters —
a transposition/indexing bug in any converter or forward fails here.

The torch references re-implement speechbrain/pyannote module semantics
(ECAPA_TDNN.py TDNNBlock = conv→ReLU→BatchNorm with norm LAST; pyannote
SincNet = conv→abs(first)→pool→instancenorm→leaky) directly with
torch.nn.functional, since those packages aren't vendored in this image.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from clearconverse_tpu.models.ecapa import (  # noqa: E402
    EcapaDims, convert_speechbrain_ecapa, ecapa_embed, fbank)
from clearconverse_tpu.models.pyannet import (  # noqa: E402
    PyannetDims, convert_pyannote_pyannet, pyannet_forward)
from clearconverse_tpu.models.resepformer import (  # noqa: E402
    SepformerDims, _tf_forward, init_sepformer_params)

# --------------------------------------------------------------------- ECAPA

DIMS = EcapaDims(n_mels=24, channels=32, mfa_channels=48,
                 attention_channels=16, embedding_dim=16, res2net_scale=4)


def _t(shape, g, scale=0.3):
    return torch.tensor(g.standard_normal(shape).astype(np.float32)) * scale


def _bn_stats(c, g):
    return {"weight": _t((c,), g, 1.0).abs() + 0.5,
            "bias": _t((c,), g, 0.2),
            "running_mean": _t((c,), g, 0.1),
            "running_var": _t((c,), g, 0.2).abs() + 0.8}


def _make_ecapa_sd(g):
    """speechbrain-keyed state dict for the tiny config, random weights."""
    C, S, A, M = DIMS.channels, DIMS.res2net_scale, DIMS.attention_channels, DIMS.mfa_channels
    w = C // S
    sd = {}

    def conv(pre, cout, cin, k, bias=True):
        sd[f"{pre}.weight"] = _t((cout, cin, k), g)
        if bias:
            sd[f"{pre}.bias"] = _t((cout,), g, 0.1)

    def bn(pre, c):
        for k, v in _bn_stats(c, g).items():
            sd[f"{pre}.{k}"] = v

    conv("blocks.0.conv.conv", C, DIMS.n_mels, 5)
    bn("blocks.0.norm.norm", C)
    for bi in range(1, 4):
        p = f"blocks.{bi}"
        conv(f"{p}.tdnn1.conv.conv", C, C, 1)
        bn(f"{p}.tdnn1.norm.norm", C)
        for i in range(S - 1):
            conv(f"{p}.res2net_block.blocks.{i}.conv.conv", w, w, 3)
            bn(f"{p}.res2net_block.blocks.{i}.norm.norm", w)
        conv(f"{p}.tdnn2.conv.conv", C, C, 1)
        bn(f"{p}.tdnn2.norm.norm", C)
        conv(f"{p}.se_block.conv1.conv", A, C, 1)
        conv(f"{p}.se_block.conv2.conv", C, A, 1)
    conv("mfa.conv.conv", M, 3 * C, 1)
    bn("mfa.norm.norm", M)
    conv("asp.tdnn.conv.conv", A, 3 * M, 1)
    bn("asp.tdnn.norm.norm", A)
    conv("asp.conv.conv", M, A, 1)
    bn("asp_bn.norm", 2 * M)
    conv("fc.conv", DIMS.embedding_dim, 2 * M, 1)
    return sd


def _torch_tdnn(x, sd, cpre, npre, dilation=1):
    w = sd[f"{cpre}.weight"]
    pad = dilation * (w.shape[-1] - 1) // 2
    y = F.conv1d(x, w, sd.get(f"{cpre}.bias"), padding=pad, dilation=dilation)
    y = F.relu(y)
    return F.batch_norm(y, sd[f"{npre}.running_mean"],
                        sd[f"{npre}.running_var"], sd[f"{npre}.weight"],
                        sd[f"{npre}.bias"], training=False, eps=1e-5)


def _torch_ecapa(feats, sd):
    """speechbrain ECAPA forward (full-length rows, no padding mask):
    feats [B, n_mels, T] → [B, emb]."""
    x = _torch_tdnn(feats, sd, "blocks.0.conv.conv", "blocks.0.norm.norm")
    outs = []
    for bi, dil in zip((1, 2, 3), DIMS.dilations):
        p = f"blocks.{bi}"
        res = x
        y = _torch_tdnn(x, sd, f"{p}.tdnn1.conv.conv", f"{p}.tdnn1.norm.norm")
        chunks = torch.chunk(y, DIMS.res2net_scale, dim=1)
        ys = [chunks[0]]
        prev = None
        for i in range(1, DIMS.res2net_scale):
            h = chunks[i] if prev is None else chunks[i] + prev
            h = _torch_tdnn(h, sd, f"{p}.res2net_block.blocks.{i-1}.conv.conv",
                            f"{p}.res2net_block.blocks.{i-1}.norm.norm", dil)
            ys.append(h)
            prev = h
        y = torch.cat(ys, dim=1)
        y = _torch_tdnn(y, sd, f"{p}.tdnn2.conv.conv", f"{p}.tdnn2.norm.norm")
        s = y.mean(dim=2, keepdim=True)
        s = F.relu(F.conv1d(s, sd[f"{p}.se_block.conv1.conv.weight"],
                            sd[f"{p}.se_block.conv1.conv.bias"]))
        s = torch.sigmoid(F.conv1d(s, sd[f"{p}.se_block.conv2.conv.weight"],
                                   sd[f"{p}.se_block.conv2.conv.bias"]))
        x = res + y * s
        outs.append(x)
    x = _torch_tdnn(torch.cat(outs, dim=1), sd, "mfa.conv.conv",
                    "mfa.norm.norm")
    mean = x.mean(dim=2, keepdim=True)
    std = ((x - mean) ** 2).mean(dim=2, keepdim=True).clamp(1e-12).sqrt()
    ctx = torch.cat([x, mean.expand_as(x), std.expand_as(x)], dim=1)
    a = _torch_tdnn(ctx, sd, "asp.tdnn.conv.conv", "asp.tdnn.norm.norm")
    a = F.conv1d(torch.tanh(a), sd["asp.conv.conv.weight"],
                 sd["asp.conv.conv.bias"])
    a = torch.softmax(a, dim=2)
    amean = (a * x).sum(dim=2)
    astd = ((a * x * x).sum(dim=2) - amean ** 2).clamp(1e-12).sqrt()
    pooled = torch.cat([amean, astd], dim=1)[:, :, None]
    pooled = F.batch_norm(pooled, sd["asp_bn.norm.running_mean"],
                          sd["asp_bn.norm.running_var"],
                          sd["asp_bn.norm.weight"], sd["asp_bn.norm.bias"],
                          training=False, eps=1e-5)
    return F.conv1d(pooled, sd["fc.conv.weight"],
                    sd["fc.conv.bias"])[:, :, 0]


def test_ecapa_full_graph_matches_torch():
    """Converted speechbrain weights through ecapa_embed == the torch
    reference: SE-Res2Net blocks, MFA, attentive-stats pooling, fc."""
    g = np.random.default_rng(0)
    sd = _make_ecapa_sd(g)
    params = convert_speechbrain_ecapa({k: v.numpy() for k, v in sd.items()},
                                       DIMS)
    audio = g.standard_normal((2, 16000)).astype(np.float32) * 0.1

    ours = np.asarray(ecapa_embed(jax.tree.map(jnp.asarray, params),
                                  jnp.asarray(audio), dims=DIMS))
    feats = np.asarray(fbank(jnp.asarray(audio), DIMS.n_mels))   # [B,T,C]
    with torch.no_grad():
        want = _torch_ecapa(torch.tensor(feats).transpose(1, 2), sd).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-4)


# ------------------------------------------------------------------- PyanNet

PN = PyannetDims(sinc_filters=8, sinc_kernel=51, sinc_stride=10,
                 conv_channels=10, conv_kernel=5, pool=3, lstm_hidden=8,
                 lstm_layers=2, linear_dims=(12,), n_classes=7)


def _torch_sinc_filters(low_hz, band_hz, kernel, sr,
                        min_low=50.0, min_band=50.0):
    """Independent torch port of asteroid ParamSincFB.filters(): each band
    parameter row emits a cos-phase and a sin-phase filter; pairs interleave
    (stack(dim=1).view) and the window is the SYMMETRIC np.hamming half."""
    low = min_low + low_hz.abs()
    high = (low + min_band + band_hz.abs()).clamp(min_low, sr / 2)
    band = high - low
    n = (kernel - 1) // 2
    t = torch.arange(-n, 0, dtype=torch.float32) / sr
    window = (0.54 - 0.46 * torch.cos(
        2 * math.pi * torch.arange(kernel, dtype=torch.float32)
        / (kernel - 1)))[:n]
    tpt = 2 * math.pi * t
    cos_left = ((torch.sin(high[:, None] * tpt[None]) -
                 torch.sin(low[:, None] * tpt[None]))
                / (tpt[None] / 2)) * window[None]
    cos_f = torch.cat([cos_left, 2 * band[:, None], cos_left.flip(-1)],
                      dim=1) / (2 * band[:, None])
    sin_left = ((torch.cos(low[:, None] * tpt[None]) -
                 torch.cos(high[:, None] * tpt[None]))
                / (tpt[None] / 2)) * window[None]
    sin_f = torch.cat([sin_left, torch.zeros_like(band[:, None]),
                       -sin_left.flip(-1)], dim=1) / (2 * band[:, None])
    return torch.stack([cos_f, sin_f], dim=1).reshape(-1, kernel)  # [2nb, K]


def _make_pyannet_sd(g):
    sd = {
        "sincnet.wav_norm1d.weight": _t((1,), g, 1.0).abs() + 0.5,
        "sincnet.wav_norm1d.bias": _t((1,), g, 0.2),
        # Real pyannote 3.x nesting: Encoder(ParamSincFB) stores the band
        # parameters at .filterbank., HALF as many rows as output channels.
        "sincnet.conv1d.0.filterbank.low_hz_": torch.tensor(
            np.linspace(40, 3000, PN.sinc_filters // 2)
            .astype(np.float32))[:, None],
        "sincnet.conv1d.0.filterbank.band_hz_": torch.tensor(
            np.linspace(60, 400, PN.sinc_filters // 2)
            .astype(np.float32))[:, None],
    }
    for i, (cin, cout, k) in enumerate([
            (PN.sinc_filters, PN.sinc_filters, 0),      # norm0 only
            (PN.sinc_filters, PN.conv_channels, PN.conv_kernel),
            (PN.conv_channels, PN.conv_channels, PN.conv_kernel)]):
        if k:
            sd[f"sincnet.conv1d.{i}.weight"] = _t((cout, cin, k), g)
            sd[f"sincnet.conv1d.{i}.bias"] = _t((cout,), g, 0.1)
        sd[f"sincnet.norm1d.{i}.weight"] = _t((cout,), g, 1.0).abs() + 0.5
        sd[f"sincnet.norm1d.{i}.bias"] = _t((cout,), g, 0.2)

    torch.manual_seed(3)
    lstm = torch.nn.LSTM(PN.conv_channels, PN.lstm_hidden,
                         num_layers=PN.lstm_layers, bidirectional=True,
                         batch_first=True)
    for k, v in lstm.state_dict().items():
        sd[f"lstm.{k}"] = v
    sd["linear.0.weight"] = _t((PN.linear_dims[0], 2 * PN.lstm_hidden), g)
    sd["linear.0.bias"] = _t((PN.linear_dims[0],), g, 0.1)
    sd["classifier.weight"] = _t((PN.n_classes, PN.linear_dims[0]), g)
    sd["classifier.bias"] = _t((PN.n_classes,), g, 0.1)
    return sd, lstm


def _torch_pyannet(wave, sd, lstm):
    """pyannote PyanNet forward: SincNet stack → BiLSTM → linear(leaky) →
    classifier → log_softmax. wave [B, T]."""
    x = wave[:, None, :]
    x = F.instance_norm(x, weight=sd["sincnet.wav_norm1d.weight"],
                        bias=sd["sincnet.wav_norm1d.bias"], eps=1e-5)
    filt = _torch_sinc_filters(
        sd["sincnet.conv1d.0.filterbank.low_hz_"].reshape(-1),
        sd["sincnet.conv1d.0.filterbank.band_hz_"].reshape(-1),
        PN.sinc_kernel, PN.sample_rate)
    x = F.conv1d(x, filt[:, None, :], stride=PN.sinc_stride)
    x = torch.abs(x)
    x = F.max_pool1d(x, PN.pool)
    x = F.instance_norm(x, weight=sd["sincnet.norm1d.0.weight"],
                        bias=sd["sincnet.norm1d.0.bias"], eps=1e-5)
    x = F.leaky_relu(x)
    for i in (1, 2):
        x = F.conv1d(x, sd[f"sincnet.conv1d.{i}.weight"],
                     sd[f"sincnet.conv1d.{i}.bias"])
        x = F.max_pool1d(x, PN.pool)
        x = F.instance_norm(x, weight=sd[f"sincnet.norm1d.{i}.weight"],
                            bias=sd[f"sincnet.norm1d.{i}.bias"], eps=1e-5)
        x = F.leaky_relu(x)
    x = x.transpose(1, 2)                 # [B, frames, C]
    x, _ = lstm(x)
    x = F.leaky_relu(x @ sd["linear.0.weight"].T + sd["linear.0.bias"])
    x = x @ sd["classifier.weight"].T + sd["classifier.bias"]
    return F.log_softmax(x, dim=-1)


def test_pyannet_full_graph_matches_torch():
    """Converted pyannote-keyed weights through pyannet_forward == the torch
    reference: SincNet band-pass conv, pooling/instance-norm stack, BiLSTM,
    linear head."""
    g = np.random.default_rng(1)
    sd, lstm = _make_pyannet_sd(g)
    params = convert_pyannote_pyannet(sd, PN)
    wave = g.standard_normal((2, 16000)).astype(np.float32) * 0.2

    ours = np.asarray(pyannet_forward(jax.tree.map(jnp.asarray, params),
                                      jnp.asarray(wave), PN))
    with torch.no_grad():
        want = _torch_pyannet(torch.tensor(wave), sd, lstm).numpy()
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


# ----------------------------------------------------------------- SepFormer

def test_sepformer_transformer_layer_matches_torch_mha():
    """One intra/inter transformer layer (pre-LN, fused qkv) == torch
    nn.MultiheadAttention + functional FF with mapped weights."""
    d, heads, B, T = 16, 4, 2, 9
    dims = SepformerDims(enc_channels=16, d_model=d, n_heads=heads,
                         chunk_size=8, n_repeats=1, n_intra_layers=1,
                         n_inter_layers=1)
    params = init_sepformer_params(jax.random.PRNGKey(5), dims)
    lyr = params["repeats"][0]["intra"][0]
    # Make LN affine params non-trivial.
    g = np.random.default_rng(2)
    for ln in ("ln1", "ln2"):
        lyr[ln] = {"g": jnp.asarray(g.uniform(0.5, 1.5, d).astype(np.float32)),
                   "b": jnp.asarray(g.standard_normal(d).astype(np.float32) * 0.1)}

    x = g.standard_normal((B, T, d)).astype(np.float32)
    ours = np.asarray(_tf_forward(jnp.asarray(x), [lyr], heads))

    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(
            np.asarray(lyr["attn"]["qkv"]["w"]).T))
        mha.in_proj_bias.copy_(torch.tensor(np.asarray(lyr["attn"]["qkv"]["b"])))
        mha.out_proj.weight.copy_(torch.tensor(
            np.asarray(lyr["attn"]["out"]["w"]).T))
        mha.out_proj.bias.copy_(torch.tensor(np.asarray(lyr["attn"]["out"]["b"])))

        xt = torch.tensor(x)
        h = F.layer_norm(xt, (d,), torch.tensor(np.asarray(lyr["ln1"]["g"])),
                         torch.tensor(np.asarray(lyr["ln1"]["b"])), eps=1e-5)
        attn_out, _ = mha(h, h, h, need_weights=False)
        xt = xt + attn_out
        h = F.layer_norm(xt, (d,), torch.tensor(np.asarray(lyr["ln2"]["g"])),
                         torch.tensor(np.asarray(lyr["ln2"]["b"])), eps=1e-5)
        h = F.relu(h @ torch.tensor(np.asarray(lyr["ff"]["fc1"]["w"]))
                   + torch.tensor(np.asarray(lyr["ff"]["fc1"]["b"])))
        xt = xt + h @ torch.tensor(np.asarray(lyr["ff"]["fc2"]["w"])) \
            + torch.tensor(np.asarray(lyr["ff"]["fc2"]["b"]))
    np.testing.assert_allclose(ours, xt.numpy(), rtol=1e-4, atol=1e-5)


def _make_sepformer_sds(g, dims):
    """Random ckpt triplet in the converter's torch-layout key naming
    (encoder Conv1d [out,1,k]; masknet Linears [out,in] / LayerNorms;
    decoder ConvTranspose1d [in,out,k]) — the resepformer-ft format
    consumed at back/api.py:727-746."""
    N, L, d, ff = dims.enc_channels, dims.enc_kernel, dims.d_model, dims.ff_mult
    enc_sd = {"conv1d.weight": _t((N, 1, L), g)}
    dec_sd = {"conv_tr.weight": _t((N, 1, L), g)}
    sd = {}

    def lin(pre, n_out, n_in):
        sd[f"{pre}.weight"] = _t((n_out, n_in), g)
        sd[f"{pre}.bias"] = _t((n_out,), g, 0.1)

    def ln(pre, n):
        sd[f"{pre}.weight"] = _t((n,), g, 1.0).abs() + 0.5
        sd[f"{pre}.bias"] = _t((n,), g, 0.1)

    ln("bottleneck.norm", N)
    lin("bottleneck.proj", d, N)
    for r in range(dims.n_repeats):
        for kind, n_layers in (("intra", dims.n_intra_layers),
                               ("inter", dims.n_inter_layers)):
            for i in range(n_layers):
                pre = f"repeats.{r}.{kind}.{i}"
                ln(f"{pre}.ln1", d)
                lin(f"{pre}.attn.qkv", 3 * d, d)
                lin(f"{pre}.attn.out", d, d)
                ln(f"{pre}.ln2", d)
                lin(f"{pre}.ff.fc1", ff * d, d)
                lin(f"{pre}.ff.fc2", d, ff * d)
            ln(f"repeats.{r}.{kind}_norm", d)
    sd["mask.prelu.weight"] = _t((1,), g, 0.25).abs()
    lin("mask.proj", dims.n_sources * N, d)
    return enc_sd, sd, dec_sd


def _torch_positional(T, d):
    pos = np.arange(T)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / np.power(10000.0, 2 * i / d)
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    return torch.tensor(pe.astype(np.float32))


def _torch_tf_layers(x, sd, prefix, n_layers, heads):
    """Pre-LN transformer stack consuming the state dict DIRECTLY with
    torch layout conventions (F.linear weight [out, in])."""
    d = x.shape[-1]
    dh = d // heads
    for i in range(n_layers):
        pre = f"{prefix}.{i}"
        h = F.layer_norm(x, (d,), sd[f"{pre}.ln1.weight"],
                         sd[f"{pre}.ln1.bias"], eps=1e-5)
        qkv = F.linear(h, sd[f"{pre}.attn.qkv.weight"],
                       sd[f"{pre}.attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        B, T, _ = q.shape
        q = q.reshape(B, T, heads, dh).permute(0, 2, 1, 3) * dh ** -0.5
        k = k.reshape(B, T, heads, dh).permute(0, 2, 1, 3)
        v = v.reshape(B, T, heads, dh).permute(0, 2, 1, 3)
        w = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        o = (w @ v).permute(0, 2, 1, 3).reshape(B, T, d)
        x = x + F.linear(o, sd[f"{pre}.attn.out.weight"],
                         sd[f"{pre}.attn.out.bias"])
        h = F.layer_norm(x, (d,), sd[f"{pre}.ln2.weight"],
                         sd[f"{pre}.ln2.bias"], eps=1e-5)
        h = F.relu(F.linear(h, sd[f"{pre}.ff.fc1.weight"],
                            sd[f"{pre}.ff.fc1.bias"]))
        x = x + F.linear(h, sd[f"{pre}.ff.fc2.weight"],
                         sd[f"{pre}.ff.fc2.bias"])
    return x


def _torch_sepformer(mix, enc_sd, sd, dec_sd, dims):
    """Full-graph RE-SepFormer forward (encoder → chunked dual-path masknet
    → per-source transposed-conv decoder) built straight from the ckpt
    triplet with torch.nn.functional — an independent oracle for
    convert_speechbrain_sepformer (VERDICT r2 missing #2)."""
    N, L, d, K = (dims.enc_channels, dims.enc_kernel, dims.d_model,
                  dims.chunk_size)
    stride = dims.enc_stride
    B, T = mix.shape

    h = F.relu(F.conv1d(mix[:, None, :], enc_sd["conv1d.weight"],
                        stride=stride))                    # [B, N, T']
    ht = h.transpose(1, 2)                                 # [B, T', N]
    Tp = ht.shape[1]

    x = F.layer_norm(ht, (N,), sd["bottleneck.norm.weight"],
                     sd["bottleneck.norm.bias"], eps=1e-5)
    x = F.linear(x, sd["bottleneck.proj.weight"], sd["bottleneck.proj.bias"])

    # 50%-overlap chunking, same layout as resepformer._chunk.
    hop = K // 2
    S = max(1, -(-(max(Tp - K, 0)) // hop) + 1)
    total = (S - 1) * hop + K
    x = F.pad(x, (0, 0, 0, total - Tp))
    idx = (torch.arange(S) * hop)[:, None] + torch.arange(K)[None, :]
    chunks = x[:, idx]                                     # [B, S, K, d]
    pe_k = _torch_positional(K, d)
    pe_s = _torch_positional(S, d)

    for r in range(dims.n_repeats):
        flat = chunks.reshape(B * S, K, d) + pe_k[None]
        flat = _torch_tf_layers(flat, sd, f"repeats.{r}.intra",
                                dims.n_intra_layers, dims.n_heads)
        chunks = chunks + F.layer_norm(
            flat.reshape(B, S, K, d), (d,),
            sd[f"repeats.{r}.intra_norm.weight"],
            sd[f"repeats.{r}.intra_norm.bias"], eps=1e-5)
        summary = chunks.mean(dim=2) + pe_s[None]
        summary = _torch_tf_layers(summary, sd, f"repeats.{r}.inter",
                                   dims.n_inter_layers, dims.n_heads)
        chunks = chunks + F.layer_norm(
            summary, (d,), sd[f"repeats.{r}.inter_norm.weight"],
            sd[f"repeats.{r}.inter_norm.bias"], eps=1e-5)[:, :, None, :]

    # Overlap-add back to [B, T', d], averaging doubly-covered frames.
    out = torch.zeros((B, total, d))
    weight = torch.zeros((total,))
    flat_idx = idx.reshape(-1)
    out.index_add_(1, flat_idx, chunks.reshape(B, S * K, d))
    weight.index_add_(0, flat_idx, torch.ones(S * K))
    x = (out / weight.clamp(min=1.0)[None, :, None])[:, :Tp]

    a = sd["mask.prelu.weight"].reshape(())
    x = torch.where(x >= 0, x, a * x)
    masks = F.relu(F.linear(x, sd["mask.proj.weight"], sd["mask.proj.bias"]))
    masks = masks.reshape(B, Tp, dims.n_sources, N)

    outs = []
    for s in range(dims.n_sources):
        masked = (ht * masks[:, :, s, :]).transpose(1, 2)  # [B, N, T']
        y = F.conv_transpose1d(masked, dec_sd["conv_tr.weight"],
                               stride=stride)[:, 0, :]
        outs.append(y[:, :T])
    out = torch.stack(outs, dim=-1)
    if out.shape[1] < T:
        out = F.pad(out, (0, 0, 0, T - out.shape[1]))
    return out


def test_sepformer_full_graph_matches_torch():
    """VERDICT r2 missing #2: the WHOLE separation graph through
    convert_speechbrain_sepformer matches an independent torch forward
    built from the same ckpt triplet. Any transposed conv kernel, qkv
    mapping, or masknet projection in the converter fails here."""
    from clearconverse_tpu.models.resepformer import (
        convert_speechbrain_sepformer, sepformer_separate)

    dims = SepformerDims(enc_channels=12, enc_kernel=8, d_model=16,
                         n_heads=2, ff_mult=2, chunk_size=10, n_repeats=2,
                         n_intra_layers=2, n_inter_layers=1)
    g = np.random.default_rng(11)
    enc_sd, mask_sd, dec_sd = _make_sepformer_sds(g, dims)

    params = convert_speechbrain_sepformer(enc_sd, mask_sd, dec_sd, dims)
    mix = g.standard_normal((2, 400)).astype(np.float32) * 0.5
    ours = np.asarray(sepformer_separate(params, jnp.asarray(mix), dims))

    with torch.no_grad():
        want = _torch_sepformer(torch.tensor(mix), enc_sd, mask_sd, dec_sd,
                                dims).numpy()
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------ fbank frontend

def _torch_sb_fbank(wave: torch.Tensor, n_mels: int) -> torch.Tensor:
    """Independent torch port of speechbrain's Fbank + sentence-mean
    InputNormalization: torch.stft with a PERIODIC hamming window and
    CONSTANT center padding, power spectrum, HTK-mel symmetric triangles
    (half-width = each center's left gap, no area norm),
    10*log10(clamp(., 1e-10)) floored at utterance max - 80 dB, then
    per-utterance mean subtraction. wave [B, T] -> [B, 1 + T//160, n_mels]."""
    stft = torch.stft(wave, n_fft=400, hop_length=160, win_length=400,
                      window=torch.hamming_window(400, periodic=True),
                      center=True, pad_mode="constant", normalized=False,
                      onesided=True, return_complex=True)
    power = stft.real ** 2 + stft.imag ** 2          # [B, n_freq, frames]
    mel = np.linspace(0.0, 2595.0 * np.log10(1 + 8000.0 / 700), n_mels + 2)
    hz = 700.0 * (10.0 ** (mel / 2595.0) - 1)
    f_central, band = hz[1:-1], (hz[1:] - hz[:-1])[:-1]
    freqs = np.linspace(0, 8000, 201)
    slope = (freqs[None, :] - f_central[:, None]) / band[:, None]
    tri = np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0))
    fb = torch.tensor(tri.T.astype(np.float32))      # [n_freq, n_mels]
    m = power.transpose(1, 2) @ fb                   # [B, frames, n_mels]
    logm = 10.0 * torch.log10(torch.clamp(m, min=1e-10))
    floor = logm.amax(dim=(-2, -1), keepdim=True) - 80.0
    logm = torch.maximum(logm, floor)
    return logm - logm.mean(dim=1, keepdim=True)


def test_fbank_matches_torch_stft_reference():
    g = np.random.default_rng(4)
    wave = g.standard_normal((3, 8000)).astype(np.float32) * 0.3
    # Row 2: quiet tail exercising the top_db floor.
    wave[2, 2000:] *= 1e-6
    ours = np.asarray(fbank(jnp.asarray(wave), 24))
    with torch.no_grad():
        want = _torch_sb_fbank(torch.tensor(wave), 24).numpy()
    assert ours.shape == want.shape == (3, 51, 24)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-3)
