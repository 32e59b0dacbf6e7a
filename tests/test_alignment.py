"""Word-timestamp alignment tests: DTW on synthetic attention, word
grouping, and the batched teacher-forced pass end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.models.alignment import (
    align_batch, cross_attention_weights, dtw_path, token_times,
    word_timestamps)
from clearconverse_tpu.models.tokenizer import ByteFallbackTokenizer
from clearconverse_tpu.models.whisper import (
    WhisperDims, init_whisper_params, whisper_encode)

TINY = WhisperDims(n_mels=16, n_vocab=300, n_audio_ctx=25, n_audio_state=32,
                   n_audio_head=4, n_audio_layer=2, n_text_ctx=16,
                   n_text_state=32, n_text_head=4, n_text_layer=2)


def test_dtw_diagonal_on_identity():
    attn = np.eye(6)
    path = dtw_path(attn)
    assert path[0] == (0, 0) and path[-1] == (5, 5)
    assert all(p == (i, i) for i, p in enumerate(path))


def test_dtw_monotonic_and_complete(rng):
    attn = rng.random((5, 20))
    path = dtw_path(attn)
    tis = [p[0] for p in path]
    fis = [p[1] for p in path]
    assert tis == sorted(tis) and fis == sorted(fis)
    assert set(tis) == set(range(5))  # every token visited
    assert path[-1] == (4, 19)


def test_token_times_ordered():
    # Block-diagonal attention: token i attends frames [4i, 4i+4).
    attn = np.zeros((3, 12))
    for i in range(3):
        attn[i, 4 * i : 4 * i + 4] = 1.0
    times = token_times(attn, 3, frame_s=0.02)
    assert len(times) == 3
    for (s0, e0), (s1, e1) in zip(times, times[1:]):
        assert s0 <= s1 and e0 <= e1
    assert times[0][0] == pytest.approx(0.0)
    assert times[-1][1] == pytest.approx(12 * 0.02, abs=0.03)


def test_word_grouping_bpe_convention():
    tok = ByteFallbackTokenizer()
    ids = tok.encode("hi there")  # bytes: h i ' ' t h e r e
    times = [(0.1 * i, 0.1 * i + 0.1) for i in range(len(ids))]
    words = word_timestamps(tok, ids, times)
    assert [w["word"] for w in words] == ["hi", "there"]
    assert words[0]["start"] == pytest.approx(0.0)
    assert words[1]["start"] == pytest.approx(0.2)  # leading-space byte
    assert words[1]["end"] >= words[1]["start"]


def test_align_batch_end_to_end(rng):
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(rng.standard_normal((2, 16, 50)).astype(np.float32) * 0.3)
    audio = whisper_encode(params, mel, TINY)
    tok = ByteFallbackTokenizer()
    text = b"ab cd"
    tokens = np.zeros((2, 8), np.int32)
    tokens[0, : len(text)] = list(text)
    tokens[1, :2] = [120, 121]
    lengths = np.asarray([len(text), 2])
    words = align_batch(params, tok, tokens, lengths, audio, TINY, sot=1)
    assert len(words) == 2
    assert [w["word"] for w in words[0]] == ["ab", "cd"]
    for w in words[0]:
        assert 0.0 <= w["start"] <= w["end"] <= TINY.n_audio_ctx * 0.02 + 0.1


def test_cross_attention_weights_shape(rng):
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(rng.standard_normal((1, 16, 50)).astype(np.float32))
    audio = whisper_encode(params, mel, TINY)
    toks = jnp.asarray(np.array([[1, 5, 9]], np.int32))
    w = cross_attention_weights(params, toks, audio, TINY)
    assert w.shape == (1, 3, 25)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-4)


def test_dtw_path_matches_scalar_reference():
    """The anti-diagonal-vectorized DP is path-identical to the scalar
    formulation (same candidate order and first-max tie-breaking)."""
    def scalar_dtw(attn):
        T, F = attn.shape
        cost = np.full((T + 1, F + 1), -np.inf)
        cost[0, :] = 0.0
        back = np.zeros((T, F), np.int8)
        for i in range(1, T + 1):
            for j in range(1, F + 1):
                cands = (cost[i - 1, j - 1], cost[i, j - 1], cost[i - 1, j])
                b = int(np.argmax(cands))
                cost[i, j] = cands[b] + attn[i - 1, j - 1]
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

    rng = np.random.default_rng(3)
    for _ in range(25):
        T = int(rng.integers(1, 12))
        F = int(rng.integers(1, 40))
        attn = rng.random((T, F)).astype(np.float64)
        if rng.random() < 0.3:          # exercise tie-breaking
            attn = np.round(attn, 1)
        assert dtw_path(attn) == scalar_dtw(attn)


def test_align_batch_uses_predicting_rows(monkeypatch):
    """whisper's find_alignment aligns token i with the attention row that
    PREDICTS it (matrix = weights[len(sot_sequence):-1]) — the row whose
    query input is the previous token — not the row where token i is the
    input. With a diagonal attention stub (row r attends frame r), prefix
    length P=4 and 3 text tokens must therefore map to frames 3,4,5."""
    import clearconverse_tpu.models.alignment as amod

    def stub(params, tokens, audio, dims, compute_dtype=None):
        B, T = np.asarray(tokens).shape
        F = 25
        attn = np.zeros((B, T, F), np.float32)
        for r in range(T):
            attn[:, r, min(r, F - 1)] = 1.0
        return jnp.asarray(attn)

    monkeypatch.setattr(amod, "cross_attention_weights", stub)
    tok = ByteFallbackTokenizer()
    tokens = np.array([[ord("a"), ord("b"), ord("c"), 0]], np.int32)
    lengths = np.array([3])
    words = amod.align_batch({}, tok, tokens, lengths, None, TINY,
                             prefixes=[[1, 2, 3, 4]], eot=9)
    # One word "abc": starts at frame P-1 = 3, ends at frame 5 (+1 frame).
    assert [w["word"] for w in words[0]] == ["abc"]
    assert words[0][0]["start"] == pytest.approx(3 * 0.02)
    assert words[0][0]["end"] == pytest.approx(6 * 0.02)


def test_align_batch_replays_full_sot_conditioning(monkeypatch):
    """align_batch teacher rows are [prefix..., text..., eot, pad...] with
    the text rows sliced for DTW — whisper find_alignment's exact replay
    layout — and lengths pad to the compile bucket."""
    import clearconverse_tpu.models.alignment as amod

    captured = {}
    real = amod.cross_attention_weights

    def spy(params, tokens, audio, dims, compute_dtype=None):
        captured["teacher"] = np.asarray(tokens)
        return real(params, tokens, audio, dims)

    monkeypatch.setattr(amod, "cross_attention_weights", spy)
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    tok = ByteFallbackTokenizer()
    tokens = np.array([[5, 6, 7, 0]], np.int32)
    lengths = np.array([3])
    audio = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, TINY.n_audio_ctx,
                                          TINY.n_audio_state))
                        .astype(np.float32))
    out = amod.align_batch(params, tok, tokens, lengths, audio, TINY,
                           prefixes=[[1, 2, 3, 4]], eot=9)
    t = captured["teacher"]
    assert t.shape[1] == 16                     # padded to the bucket
    assert t[0, :8].tolist() == [1, 2, 3, 4, 5, 6, 7, 9]
    assert (t[0, 8:] == 9).all()                # eot padding
    assert isinstance(out[0], list)
