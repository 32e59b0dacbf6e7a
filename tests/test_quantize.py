"""Int8 decoder quantization tests: numeric error bounds, pytree structure,
and end-to-end decode with a quantized decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.models.decoding import (
    DecodeOptions, build_prompt_batch, greedy_decode)
from clearconverse_tpu.models.whisper import (
    WhisperDims, dense, init_whisper_params)
from clearconverse_tpu.ops.quantize import (
    dense_quantized, quantize_weight, quantize_whisper_decoder)

TINY = WhisperDims(n_mels=16, n_vocab=64, n_audio_ctx=25, n_audio_state=32,
                   n_audio_head=4, n_audio_layer=1, n_text_ctx=24,
                   n_text_state=32, n_text_head=4, n_text_layer=2)


def test_quantize_weight_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32) * 0.05)
    q = quantize_weight(w)
    assert q["wq"].dtype == jnp.int8
    deq = np.asarray(q["wq"], np.float32) * np.asarray(q["scale"])[None, :]
    # Per-channel symmetric: max error <= scale/2 per element.
    assert np.max(np.abs(deq - np.asarray(w)) / np.asarray(q["scale"])[None, :]) <= 0.5 + 1e-3


def test_dense_quantized_close_to_dense(rng):
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    exact = dense(x, {"w": w, "b": b})
    approx = dense_quantized(x, {**quantize_weight(w), "b": b})
    rel = np.abs(np.asarray(exact - approx)) / (np.abs(np.asarray(exact)) + 1e-2)
    assert np.median(rel) < 0.02


def test_quantize_decoder_structure():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    q = quantize_whisper_decoder(params)
    blk = q["decoder"]["blocks"][0]
    assert "wq" in blk["attn"]["q"] and "scale" in blk["attn"]["q"]
    assert "b" in blk["attn"]["q"] and "b" not in blk["attn"]["k"]
    assert "wq" in blk["mlp"]["fc2"]
    # Encoder and embeddings untouched.
    assert "w" in q["encoder"]["blocks"][0]["attn"]["q"]
    assert q["decoder"]["tok"] is params["decoder"]["tok"]
    # Original tree not mutated.
    assert "w" in params["decoder"]["blocks"][0]["attn"]["q"]


def test_greedy_decode_with_quantized_decoder(rng):
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_whisper_decoder(params)
    mel = jnp.asarray(rng.standard_normal((2, 16, 50)).astype(np.float32) * 0.3)
    opts = DecodeOptions(max_tokens=8, eot=63, suppress_blank=False)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)
    full = greedy_decode(params, mel, jnp.asarray(toks), jnp.asarray(lens),
                         TINY, opts, 1)
    quant = greedy_decode(qparams, mel, jnp.asarray(toks), jnp.asarray(lens),
                          TINY, opts, 1)
    t_full = np.asarray(full["tokens"])
    t_quant = np.asarray(quant["tokens"])
    assert t_quant.shape == t_full.shape
    # Random tiny models have near-uniform logits, so token agreement isn't
    # guaranteed — but the program must run and produce valid ids.
    assert ((t_quant >= 0) & (t_quant < 64)).all()


def test_int8_cross_kv_decode_close(rng):
    """int8 cross-KV decode stays close to the full-precision path."""
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    mel = jnp.asarray(rng.standard_normal((2, 16, 50)).astype(np.float32) * 0.3)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)
    full = greedy_decode(params, mel, jnp.asarray(toks), jnp.asarray(lens),
                         TINY, DecodeOptions(max_tokens=8, eot=63,
                                             suppress_blank=False), 1)
    q = greedy_decode(params, mel, jnp.asarray(toks), jnp.asarray(lens),
                      TINY, DecodeOptions(max_tokens=8, eot=63,
                                          suppress_blank=False,
                                          cross_kv_bits=8), 1)
    # Logprob sums should be close (random logits are near-uniform so token
    # agreement isn't guaranteed at tiny scale).
    np.testing.assert_allclose(np.asarray(full["sum_logprob"]),
                               np.asarray(q["sum_logprob"]), atol=0.5)
    q4 = greedy_decode(params, mel, jnp.asarray(toks), jnp.asarray(lens),
                       TINY, DecodeOptions(max_tokens=8, eot=63,
                                           suppress_blank=False,
                                           cross_kv_bits=4), 1)
    np.testing.assert_allclose(np.asarray(full["sum_logprob"]),
                               np.asarray(q4["sum_logprob"]), atol=0.8)
