"""Pallas kernel tests (interpreter mode on the CPU platform) against the
XLA reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from clearconverse_tpu.audio.mel import log_mel_spectrogram
from clearconverse_tpu.ops.pallas.logmel import (
    log_mel_spectrogram_pallas, mel_power_pallas)


def test_mel_power_matches_reference(rng):
    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.2)
    ours = np.asarray(mel_power_pallas(audio, interpret=True))
    assert ours.shape == (2, 100, 80)

    ref = np.asarray(log_mel_spectrogram(audio))          # [B, 80, F]
    # Invert the log path of the reference to compare raw mel power.
    ref_power = np.power(10.0, np.transpose(ref, (0, 2, 1)) * 4.0 - 4.0)
    np.testing.assert_allclose(ours, ref_power, rtol=2e-3, atol=1e-6)


def test_logmel_pallas_end_to_end(rng):
    audio = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32) * 0.2)
    ours = np.asarray(log_mel_spectrogram_pallas(audio, interpret=True))
    ref = np.asarray(log_mel_spectrogram(audio))
    assert ours.shape == ref.shape == (1, 80, 300)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_logmel_pallas_non_block_multiple(rng):
    # 2.1 s → 210 frames, not a multiple of the 256-frame block.
    audio = jnp.asarray(rng.standard_normal((1, 33600)).astype(np.float32) * 0.2)
    ours = np.asarray(log_mel_spectrogram_pallas(audio, interpret=True))
    ref = np.asarray(log_mel_spectrogram(audio))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_encoder_attention_pallas_matches_einsum(rng):
    """The Pallas encoder-attention kernel (VMEM-resident logits, head
    pairs per grid step) == models/whisper.attention, f32 and bf16,
    including a non-block-multiple T (padded keys masked)."""
    from clearconverse_tpu.models.whisper import attention
    from clearconverse_tpu.ops.pallas.encoder_attention import (
        encoder_attention_pallas)

    B, T, D, H = 2, 300, 256, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)
                           * 0.3) for _ in range(3))
    ref = np.asarray(attention(q, k, v, None, H))
    ours = np.asarray(encoder_attention_pallas(q, k, v, H, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    refb = np.asarray(attention(qb, kb, vb, None, H)).astype(np.float32)
    oursb = np.asarray(encoder_attention_pallas(
        qb, kb, vb, H, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(oursb, refb, atol=2e-3)


def test_encoder_attention_pallas_grad_matches_einsum(rng):
    """The kernel's custom VJP (einsum-recompute backward) matches
    jax.grad through the plain attention — the finetune path
    differentiates whisper_encode."""
    from clearconverse_tpu.models.whisper import attention
    from clearconverse_tpu.ops.pallas.encoder_attention import (
        encoder_attention_pallas)

    import jax

    B, T, D, H = 1, 300, 256, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)
                           * 0.3) for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, None, H) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(encoder_attention_pallas(q, k, v, H, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
