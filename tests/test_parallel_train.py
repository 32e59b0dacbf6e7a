"""Mesh/sharding/training tests on the virtual 8-device CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.models.whisper import WhisperDims, init_whisper_params
from clearconverse_tpu.parallel.mesh import build_mesh
from clearconverse_tpu.parallel.sharding import shard_params, whisper_param_spec
from clearconverse_tpu.train.finetune import (
    default_optimizer, init_train_state, make_train_step, whisper_loss)

TINY = WhisperDims(n_mels=16, n_vocab=64, n_audio_ctx=16, n_audio_state=32,
                   n_audio_head=4, n_audio_layer=1, n_text_ctx=16,
                   n_text_state=32, n_text_head=4, n_text_layer=1)


def _batch(b=8, L=6):
    rng = np.random.default_rng(0)
    return {
        "mel": jnp.asarray(rng.standard_normal((b, 16, 32)).astype(np.float32)),
        "tokens": jnp.asarray(rng.integers(0, 64, (b, L)).astype(np.int32)),
        "targets": jnp.asarray(rng.integers(0, 64, (b, L)).astype(np.int32)),
        "loss_mask": jnp.ones((b, L), jnp.float32),
    }


def test_mesh_shapes():
    m = build_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m = build_mesh(model=2)  # data absorbs the rest
    assert m.shape["data"] * 2 == len(jax.devices())
    with pytest.raises(ValueError):
        build_mesh(data=3, model=3)


def test_param_spec_matches_structure():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    spec = whisper_param_spec(params)
    # Same tree structure (specs are leaves).
    from jax.sharding import PartitionSpec as P
    jax.tree.map(lambda a, b: None, params, spec,
                 is_leaf=lambda x: isinstance(x, P))


def test_train_step_single_device_learns():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    opt = default_optimizer(lr=1e-3)
    state = init_train_state(params, opt)
    step = make_train_step(TINY, opt, compute_dtype=jnp.float32)
    batch = _batch()
    p, o, s, m0 = step(state.params, state.opt_state, batch, state.step)
    for _ in range(10):
        p, o, s, m = step(p, o, batch, s)
    assert float(m["loss"]) < float(m0["loss"])  # overfits a fixed batch
    assert int(s) == 11


def test_train_step_sharded_matches_unsharded():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    opt = default_optimizer(lr=1e-3)
    batch = _batch()

    ref_step = make_train_step(TINY, opt, compute_dtype=jnp.float32)
    state = init_train_state(params, opt)
    _, _, _, m_ref = ref_step(state.params, state.opt_state, batch, state.step)

    mesh = build_mesh(data=4, model=2)
    with mesh:
        sp = shard_params(params, mesh)
        st = init_train_state(sp, opt)
        sh_step = make_train_step(TINY, opt, mesh=mesh, compute_dtype=jnp.float32)
        _, _, _, m_sh = sh_step(st.params, st.opt_state, batch, st.step)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)


def test_loss_mask_zeroes_padding():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    b = _batch()
    l_full, _ = whisper_loss(params, b, TINY, jnp.float32)
    b2 = dict(b)
    b2["loss_mask"] = b["loss_mask"].at[:, 3:].set(0.0)
    # Corrupt masked-out targets: loss must not change.
    b3 = dict(b2)
    b3["targets"] = b2["targets"].at[:, 3:].set(0)
    l_a, _ = whisper_loss(params, b2, TINY, jnp.float32)
    l_b, _ = whisper_loss(params, b3, TINY, jnp.float32)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)


def test_graft_dryrun_multichip():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "_graft", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_inference_matches_single_device():
    """Data-parallel greedy decode over the mesh == single-device decode."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from clearconverse_tpu.models.decoding import (
        DecodeOptions, build_prompt_batch, greedy_decode)

    dims = WhisperDims(n_mels=16, n_vocab=64, n_audio_ctx=16, n_audio_state=32,
                       n_audio_head=4, n_audio_layer=1, n_text_ctx=16,
                       n_text_state=32, n_text_head=4, n_text_layer=1)
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32) * 0.3)
    opts = DecodeOptions(max_tokens=6, eot=63, suppress_blank=False)
    toks, lens = build_prompt_batch([[1]] * 8, 1, pad_id=0)

    single = greedy_decode(params, mel, jnp.asarray(toks), jnp.asarray(lens),
                           dims, opts, 1)

    mesh = build_mesh(data=4, model=2)
    with mesh:
        sp = shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data", None, None)))
        toks_s = jax.device_put(jnp.asarray(toks), data_sh)
        lens_s = jax.device_put(jnp.asarray(lens), data_sh)
        sharded = greedy_decode(sp, mel_s, toks_s, lens_s, dims, opts, 1)
    np.testing.assert_array_equal(np.asarray(single["tokens"]),
                                  np.asarray(sharded["tokens"]))


def test_accum_step_matches_full_batch_exactly():
    """Gradient accumulation is EXACT (unnormalized sums divide by the
    global token count), including with UNEVEN loss masks across
    microbatches — where averaging per-microbatch mean losses would be
    wrong. Plain SGD for the param comparison: Adam's g/(sqrt(v)+eps)
    amplifies float-sum reassociation noise (~3e-8 on gradients) into
    lr-scale param differences wherever g ~ 0, which would test the
    optimizer's conditioning, not the accumulation math."""
    import optax

    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    opt = optax.sgd(1e-2)
    batch = _batch()
    # Uneven masks: microbatch 0 keeps everything, microbatch 1 masks most.
    mask = np.ones((8, 6), np.float32)
    mask[4:, 2:] = 0.0
    batch = dict(batch, loss_mask=jnp.asarray(mask))
    state = init_train_state(params, opt)

    full = make_train_step(TINY, opt, compute_dtype=jnp.float32)
    acc = make_train_step(TINY, opt, compute_dtype=jnp.float32,
                          accum_steps=2)
    p1, _, _, m1 = full(state.params, state.opt_state, batch, state.step)
    p2, _, _, m2 = acc(state.params, state.opt_state, batch, state.step)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    assert float(m1["accuracy"]) == pytest.approx(float(m2["accuracy"]),
                                                  rel=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), p1, p2)


def test_accum_rejects_indivisible_batch():
    opt = default_optimizer()
    step = make_train_step(TINY, opt, compute_dtype=jnp.float32,
                           accum_steps=3)
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    state = init_train_state(params, opt)
    with pytest.raises(ValueError, match="not divisible"):
        step(state.params, state.opt_state, _batch(b=8), state.step)


def test_remat_step_matches_plain():
    """jax.checkpoint changes memory, not math: remat and plain steps
    produce the same loss and updated params. SGD for the same
    conditioning reason as the accumulation test above."""
    import optax

    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    opt = optax.sgd(1e-2)
    batch = _batch()
    state = init_train_state(params, opt)
    plain = make_train_step(TINY, opt, compute_dtype=jnp.float32)
    remat = make_train_step(TINY, opt, compute_dtype=jnp.float32,
                            remat=True)
    p1, _, _, m1 = plain(state.params, state.opt_state, batch, state.step)
    p2, _, _, m2 = remat(state.params, state.opt_state, batch, state.step)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), p1, p2)


def test_accum_on_mesh_matches_full_batch():
    """mesh + gradient accumulation: microbatch rows re-pin to the data
    axis inside the scan, and the numerics still equal the full-batch
    sharded step."""
    import optax

    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    opt = optax.sgd(1e-2)
    batch = _batch()
    state = init_train_state(params, opt)
    mesh = build_mesh(data=4, model=2)
    with mesh:
        full = make_train_step(TINY, opt, mesh=mesh,
                               compute_dtype=jnp.float32)
        acc = make_train_step(TINY, opt, mesh=mesh,
                              compute_dtype=jnp.float32, accum_steps=2)
        p1, _, _, m1 = full(state.params, state.opt_state, batch,
                            state.step)
        p2, _, _, m2 = acc(state.params, state.opt_state, batch,
                           state.step)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), p1, p2)
