"""Word-level timestamps via cross-attention alignment.

The reference requests ``word_timestamps=True`` on every transcribe call
(back/api.py:1290, 1440, 1477) — openai-whisper computes them by DTW over
cross-attention weights. This module provides the same capability, batched:

  1. one teacher-forced decoder pass over the generated tokens captures
     per-layer cross-attention weights [B, heads, T_tok, T_audio]
     (a single device program — no per-token Python loop),
  2. head-averaged attention is monotonically aligned to audio frames with
     dynamic time warping on host,
  3. token times merge into word spans using the tokenizer's word pieces.

Whisper proper uses model-specific alignment heads; without those tables we
average heads of the upper half of the decoder stack, which tracks the same
signal for timing purposes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clearconverse_tpu.models.whisper import (
    WhisperDims, dense, layer_norm, precompute_cross_kv, _mlp, _split_heads,
    attention)

AUDIO_FRAME_S = 0.02   # encoder frame = 2 mel hops = 20 ms
# Teacher lengths bucket so the jitted weights program compiles once per
# (rows, bucket) instead of once per batch max token count (30 s - 18 min
# per shape over the tunnel).
_LEN_BUCKETS = (16, 32, 64, 128, 256, 448)


@partial(jax.jit, static_argnames=("dims", "compute_dtype"))
def cross_attention_weights(params: Dict[str, Any], tokens: jnp.ndarray,
                            audio: jnp.ndarray, dims: WhisperDims,
                            compute_dtype=jnp.float32) -> jnp.ndarray:
    """Teacher-forced pass → averaged cross-attention [B, T_tok, T_audio]
    from the upper half of the decoder layers. Jitted: eager dispatch cost
    ~12 layers x ~15 ops per word-timestamps call over the tunnel, where
    per-dispatch latency dominates (CLAUDE.md platform rules)."""
    dec = params["decoder"]
    B, T = tokens.shape
    x = dec["tok"][tokens].astype(compute_dtype) + \
        dec["pos"][:T][None].astype(compute_dtype)
    k_ = jnp.arange(T)[None, None, None, :]
    q_ = jnp.arange(T)[None, None, :, None]
    causal = jnp.where(k_ <= q_, 0.0, -1e9).astype(jnp.float32)
    cross_kv = precompute_cross_kv(params, audio)

    collect = []
    half = dims.n_text_layer // 2
    for li, (blk, ckv) in enumerate(zip(dec["blocks"], cross_kv)):
        h = layer_norm(x, blk["attn_ln"])
        h = attention(dense(h, blk["attn"]["q"]), dense(h, blk["attn"]["k"]),
                      dense(h, blk["attn"]["v"]), causal, dims.n_text_head)
        x = x + dense(h, blk["attn"]["out"])

        h = layer_norm(x, blk["cross_ln"])
        q = dense(h, blk["cross"]["q"])
        ck = ckv["k"].astype(compute_dtype)
        cv = ckv["v"].astype(compute_dtype)
        dh = q.shape[-1] // dims.n_text_head
        scale = dh ** -0.25
        qh = _split_heads(q, dims.n_text_head) * scale
        kh = _split_heads(ck, dims.n_text_head) * scale
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if li >= half:
            collect.append(w.mean(axis=1))          # [B, T_tok, T_audio]
        vh = _split_heads(cv, dims.n_text_head)
        o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(compute_dtype), vh,
                       preferred_element_type=jnp.float32)
        x = x + dense(o.reshape(q.shape).astype(compute_dtype),
                      blk["cross"]["out"])
        x = x + _mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])
    return jnp.mean(jnp.stack(collect), axis=0)


def dtw_path(attn: np.ndarray) -> List[Tuple[int, int]]:
    """Monotonic alignment through a [T_tok, T_audio] attention matrix
    (maximize summed attention; moves: right, down, diagonal).

    DP vectorized over anti-diagonals: the nested per-cell Python loop was
    ~150k tuple-argmax iterations per row (T_tok x 1500 frames) on the
    1-core host — the exact pattern CLAUDE.md's perf rules vectorize.
    Candidate order (diag, left, up) and argmax tie-breaking match the
    scalar formulation exactly."""
    T, F = attn.shape
    cost = np.full((T + 1, F + 1), -np.inf)
    cost[0, :] = 0.0
    back = np.zeros((T, F), np.int8)
    # Anti-diagonal d holds cells (i, j), i+j == d, in the padded cost
    # grid; every cell on a diagonal depends only on diagonals d-1, d-2.
    for d in range(2, T + F + 1):
        i0 = max(1, d - F)
        i1 = min(T, d - 1)
        if i0 > i1:
            continue
        i = np.arange(i0, i1 + 1)
        j = d - i
        diag = cost[i - 1, j - 1]
        left = cost[i, j - 1]
        up = cost[i - 1, j]
        best = np.maximum(diag, np.maximum(left, up))
        # np.argmax picks the FIRST max: diag > left > up priority.
        b = np.where(diag == best, 0, np.where(left == best, 1, 2))
        cost[i, j] = best + attn[i - 1, j - 1]
        back[i - 1, j - 1] = b
    path = []
    i, j = T - 1, F - 1
    while i >= 0 and j >= 0:
        path.append((i, j))
        b = back[i, j]
        if b == 0:
            i, j = i - 1, j - 1
        elif b == 1:
            j -= 1
        else:
            i -= 1
    return path[::-1]


def token_times(attn: np.ndarray, n_tokens: int,
                frame_s: float = AUDIO_FRAME_S) -> List[Tuple[float, float]]:
    """[T_tok, T_audio] attention → per-token (start, end) seconds."""
    path = dtw_path(attn[:n_tokens])
    starts = {}
    ends = {}
    for ti, fi in path:
        starts.setdefault(ti, fi)
        ends[ti] = fi
    return [(starts.get(t, 0) * frame_s, (ends.get(t, 0) + 1) * frame_s)
            for t in range(n_tokens)]


def word_timestamps(tokenizer, token_ids: List[int],
                    times: List[Tuple[float, float]]) -> List[Dict[str, Any]]:
    """Group token spans into words: a new word starts on a leading-space
    piece (GPT-2 BPE convention) or at the sequence start."""
    words: List[Dict[str, Any]] = []
    for tid, (t0, t1) in zip(token_ids, times):
        piece = tokenizer.decode([tid], skip_special=True)
        if not piece:
            continue
        if words and not piece.startswith(" "):
            words[-1]["word"] += piece
            words[-1]["end"] = t1
        else:
            words.append({"word": piece, "start": t0, "end": t1})
    for w in words:
        w["word"] = w["word"].strip()
    return [w for w in words if w["word"]]


def align_batch(params: Dict[str, Any], tokenizer,
                tokens: np.ndarray, lengths: np.ndarray,
                audio_features: jnp.ndarray, dims: WhisperDims,
                sot: int = -1, prefixes=None,
                eot: int = -1) -> List[List[Dict[str, Any]]]:
    """Full batched alignment: generated tokens → per-row word timestamp
    lists.

    ``prefixes`` (per-row token lists) is the conditioning openai-whisper's
    find_alignment replays: the FULL SOT sequence — [sot] for .en models,
    [sot, <|lang|>, <|transcribe|>] for multilingual — plus
    <|notimestamps|>, followed by the text tokens and ``eot``. Replaying a
    bare [sot] (the pre-fix behavior, kept as the fallback when only
    ``sot`` is given) scores cross-attention under different conditioning
    and positions than produced the tokens, shifting DTW paths on exactly
    the multilingual path. Teacher lengths pad to _LEN_BUCKETS so the
    jitted weights program compiles once per bucket."""
    B = tokens.shape[0]
    if prefixes is None:
        prefixes = [[sot]] * B
    P = max((len(p) for p in prefixes), default=1)
    max_len = int(lengths.max()) if B else 0
    pad_id = eot if eot >= 0 else (prefixes[0][0] if prefixes else 0)
    need = P + max_len + 1
    total = next((b for b in _LEN_BUCKETS if b >= need),
                 need)
    teacher = np.full((B, total), pad_id, np.int32)
    for b in range(B):
        pre = list(prefixes[b])[-P:]
        teacher[b, P - len(pre): P] = pre
        teacher[b, P : P + lengths[b]] = tokens[b, : lengths[b]]
        if eot >= 0:
            teacher[b, P + lengths[b]] = eot
    attn = np.asarray(cross_attention_weights(
        params, jnp.asarray(teacher), audio_features, dims))
    out = []
    for b in range(B):
        n = int(lengths[b])
        if n == 0:
            out.append([])
            continue
        # whisper find_alignment slices weights[len(sot_sequence):-1]: token
        # i's row is the one PREDICTING it (query input = previous token),
        # i.e. one position before the token itself, and the final row
        # (predicting eot) is aligned too so trailing audio attaches to eot
        # rather than stretching the last word (split_to_word_tokens gets
        # text_tokens + [eot]). With prefix length P (sot sequence +
        # <|notimestamps|>) that is rows [P-1, P+n]; eot's span is dropped.
        lo = max(P - 1, 0)
        times = token_times(attn[b, lo : lo + n + 1], n + 1)[:n]
        out.append(word_timestamps(tokenizer, list(tokens[b, :n]), times))
    return out
