"""Multi-chip inference in the serving path (VERDICT r1 #2): TPUConfig's
data_axis/model_axis build a real mesh inside ModelBundle, batched programs
shard over it, and outputs are identical to the single-device configuration
(on the virtual 8-device CPU platform from conftest)."""

import numpy as np
import pytest

import jax

from clearconverse_tpu.config import Config, TPUConfig, tpu_config_from_env
from clearconverse_tpu.models.tokenizer import ByteFallbackTokenizer
from clearconverse_tpu.models.whisper import WhisperDims, init_whisper_params
from clearconverse_tpu.pipeline.bundle import ModelBundle

DIMS = WhisperDims(n_mels=80, n_vocab=51864, n_audio_ctx=1500,
                   n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                   n_text_ctx=448, n_text_state=64, n_text_head=2,
                   n_text_layer=1)


def _tiny_bundle(tpu: TPUConfig) -> ModelBundle:
    from clearconverse_tpu.models.ecapa import EcapaDims, init_ecapa_params
    from clearconverse_tpu.models.pyannet import PyannetDims, init_pyannet_params
    from clearconverse_tpu.models.resepformer import (
        SepformerDims, init_sepformer_params)
    b = ModelBundle(Config(), tpu)
    b._whisper = (init_whisper_params(jax.random.PRNGKey(0), DIMS), DIMS,
                  ByteFallbackTokenizer(english=True))
    ecapa_dims = EcapaDims(n_mels=24, channels=32, mfa_channels=48,
                           attention_channels=16, embedding_dim=16,
                           res2net_scale=4)
    b._ecapa = init_ecapa_params(jax.random.PRNGKey(1), ecapa_dims)
    b._ecapa_dims = ecapa_dims
    sep_dims = SepformerDims(enc_channels=16, d_model=16, n_heads=2,
                             chunk_size=20, n_repeats=1, n_intra_layers=1,
                             n_inter_layers=1)
    b._sepformer = init_sepformer_params(jax.random.PRNGKey(2), sep_dims)
    b._sepformer_dims = sep_dims
    pn_dims = PyannetDims(sinc_filters=8, conv_channels=8, lstm_hidden=8,
                          lstm_layers=1, linear_dims=(8,))
    b._pyannet = init_pyannet_params(jax.random.PRNGKey(3), pn_dims)
    b._pyannet_dims = pn_dims
    b._loaded = True
    return b


@pytest.fixture(scope="module")
def bundles():
    single = _tiny_bundle(TPUConfig(max_decode_tokens=8,
                                    compute_dtype="float32"))
    meshed = _tiny_bundle(TPUConfig(max_decode_tokens=8,
                                    compute_dtype="float32",
                                    data_axis=4, model_axis=2))
    return single, meshed


def test_mesh_built_from_tpu_config(bundles):
    single, meshed = bundles
    assert single.mesh is None
    assert meshed.mesh is not None
    assert meshed.mesh.shape == {"data": 4, "model": 2}


def test_transcribe_batch_mesh_equals_single(bundles, rng):
    single, meshed = bundles
    audio = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    t_single = single.transcribe_batch(audio, ["", "ctx", ""], temperature=0.0)
    t_meshed = meshed.transcribe_batch(audio, ["", "ctx", ""], temperature=0.0)
    assert t_single == t_meshed


def test_embed_and_separate_mesh_equals_single(bundles, rng):
    single, meshed = bundles
    audio = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    lens = np.asarray([8000, 4000])
    np.testing.assert_allclose(single.embed_batch(audio, lens),
                               meshed.embed_batch(audio, lens),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(single.separate_batch(audio),
                               meshed.separate_batch(audio),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(single.segment_frames(audio),
                               meshed.segment_frames(audio),
                               rtol=1e-4, atol=1e-5)


def test_engine_wavefront_mesh_equals_single(bundles, rng):
    """The engine's transcribe path (context-chained wavefront) produces
    identical text through the 4x2 mesh and the single device."""
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    single, meshed = bundles
    clips = [rng.standard_normal(12000).astype(np.float32) * 0.1,
             rng.standard_normal(8000).astype(np.float32) * 0.1]

    def run(bundle):
        eng = TranscriptionEngine(Config(temperature=0.0), bundle.tpu,
                                  models=bundle)
        items = [
            dict(audio=clips[0], prompt="", depends_on=None,
                 start=0.0, end=0.75, speaker="SPEAKER_A"),
            dict(audio=clips[1], prompt=None, depends_on=0,
                 start=0.8, end=1.3, speaker="SPEAKER_A"),
        ]
        eng._transcribe_wavefront(items, 16000)
        return [it["text"] for it in items]

    assert run(single) == run(meshed)


def test_tpu_config_from_env():
    env = {"CC_TPU_DATA_AXIS": "4", "CC_TPU_MODEL_AXIS": "2",
           "CC_TPU_BEST_OF": "3", "CC_TPU_PAD_FULL_WINDOW": "0"}
    t = tpu_config_from_env(env)
    assert (t.data_axis, t.model_axis, t.best_of) == (4, 2, 3)
    assert t.pad_to_full_window is False
    d = tpu_config_from_env({})
    assert (d.data_axis, d.model_axis) == (1, 1)


def test_pallas_encoder_attn_opt_out():
    """TPUConfig.pallas_encoder_attn threads an off switch through
    whisper_encode so parity-sensitive runs can pin the einsum attention in
    every batch regime (ADVICE r2)."""
    from clearconverse_tpu.models.whisper import _use_pallas_attn

    assert tpu_config_from_env({"CC_TPU_PALLAS_ENC": "0"}).pallas_encoder_attn is False
    assert tpu_config_from_env({}).pallas_encoder_attn is True
    # enabled=False wins even in the kernel's native regime.
    assert _use_pallas_attn(1500, 32, 12, 64, enabled=False) is False


def test_language_env_override():
    assert tpu_config_from_env({"CC_TPU_LANGUAGE": "de"}).language == "de"
    assert tpu_config_from_env({"CC_TPU_LANGUAGE": "auto"}).language is None
    assert tpu_config_from_env({}).language == "en"


@pytest.mark.parametrize("da,ma", [(8, 1), (2, 4), (1, 8)])
def test_transcribe_batch_other_mesh_shapes(da, ma, rng):
    """Sharding generality: pure data-parallel (8x1), model-heavy (2x4),
    and pure tensor-parallel (1x8) meshes all produce the single-device
    decode exactly — XLA inserts different collectives for each layout."""
    single = _tiny_bundle(TPUConfig(max_decode_tokens=8,
                                    compute_dtype="float32"))
    meshed = _tiny_bundle(TPUConfig(max_decode_tokens=8,
                                    compute_dtype="float32",
                                    data_axis=da, model_axis=ma))
    assert meshed.mesh.shape == {"data": da, "model": ma}
    audio = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    t_single = single.transcribe_batch(audio, ["", "ctx", ""],
                                       temperature=0.0)
    t_meshed = meshed.transcribe_batch(audio, ["", "ctx", ""],
                                       temperature=0.0)
    assert t_single == t_meshed
