"""Whisper parity tests: our functional-JAX model vs HuggingFace's torch
implementation (same architecture family as the reference's openai-whisper,
back/api.py:657-703) on a tiny randomly-initialized config. Exercises the
HF-naming branch of models/convert.py end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.models.whisper import WhisperDims, whisper_encode, model_dims
from clearconverse_tpu.models.convert import convert_whisper_state_dict
from clearconverse_tpu.models.decoding import (
    DecodeOptions, build_prompt_batch, greedy_decode)
from clearconverse_tpu.models import decoding as dec
from clearconverse_tpu.models.whisper import (
    decoder_forward, init_kv_cache, precompute_cross_kv)

torch = pytest.importorskip("torch")
from transformers import WhisperConfig, WhisperForConditionalGeneration  # noqa: E402

VOCAB = 151
DIMS = WhisperDims(n_mels=16, n_vocab=VOCAB, n_audio_ctx=75, n_audio_state=32,
                   n_audio_head=4, n_audio_layer=2, n_text_ctx=48,
                   n_text_state=32, n_text_head=4, n_text_layer=2)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=VOCAB, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=75, max_target_positions=48,
        activation_function="gelu",
        pad_token_id=0, bos_token_id=1, eos_token_id=VOCAB - 1,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None,
    )
    m = WhisperForConditionalGeneration(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(hf_model):
    return jax.tree.map(jnp.asarray,
                        convert_whisper_state_dict(hf_model.state_dict()))


@pytest.fixture(scope="module")
def mel(hf_model):
    rng = np.random.default_rng(1)
    return rng.standard_normal((2, 16, 150)).astype(np.float32) * 0.5


def test_encoder_matches_hf(hf_model, params, mel):
    with torch.no_grad():
        ref = hf_model.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper_encode(params, jnp.asarray(mel), DIMS))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_logits_match_hf(hf_model, params, mel):
    toks = np.array([[5, 9, 23, 44], [7, 3, 2, 100]], np.int32)
    with torch.no_grad():
        ref = hf_model(input_features=torch.tensor(mel),
                       decoder_input_ids=torch.tensor(toks, dtype=torch.long)
                       ).logits.numpy()

    audio = whisper_encode(params, jnp.asarray(mel), DIMS)
    cross_kv = precompute_cross_kv(params, audio)
    B, T = toks.shape
    kv = init_kv_cache(DIMS, B, T)
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    k = jnp.arange(T)[None, None, None, :]
    q = jnp.arange(T)[None, None, :, None]
    mask = jnp.where(k <= q, 0.0, -1e9).astype(jnp.float32)
    logits, _ = decoder_forward(params, jnp.asarray(toks), pos, jnp.int32(0),
                                kv, cross_kv, mask, None, DIMS)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def _torch_greedy(hf_model, mel, sot, steps):
    ids = torch.full((mel.shape[0], 1), sot, dtype=torch.long)
    with torch.no_grad():
        for _ in range(steps):
            logits = hf_model(input_features=torch.tensor(mel),
                              decoder_input_ids=ids).logits
            nxt = logits[:, -1, :].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
    return ids[:, 1:].numpy()


def test_greedy_decode_matches_torch_loop(hf_model, params, mel):
    sot, steps = 1, 8
    ref = _torch_greedy(hf_model, mel, sot, steps)

    opts = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False)
    toks, lens = build_prompt_batch([[sot], [sot]], 1, pad_id=0)
    out = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, opts, 1)
    ours = np.asarray(out["tokens"])
    for b in range(2):
        for t in range(steps):
            assert ours[b, t] == ref[b, t]
            if ref[b, t] == VOCAB - 1:
                break


def test_batched_padded_prompts_equal_unbatched(hf_model, params, mel):
    """Left-padding + position offsets must not change per-row results."""
    opts = DecodeOptions(max_tokens=6, eot=VOCAB - 1, suppress_blank=False)
    prompts = [[4, 17, 2, 9, 1], [1]]
    toks, lens = build_prompt_batch(prompts, 5, pad_id=0)
    out_b = np.asarray(greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                                     jnp.asarray(lens), DIMS, opts, 5)["tokens"])
    for i, p in enumerate(prompts):
        ti, li = build_prompt_batch([p], len(p), pad_id=0)
        out_i = np.asarray(greedy_decode(params, jnp.asarray(mel[i:i + 1]),
                                         jnp.asarray(ti), jnp.asarray(li),
                                         DIMS, opts, len(p))["tokens"])
        np.testing.assert_array_equal(out_b[i], out_i[0])


def test_replica_grouped_decode_equals_tiled(hf_model, params, mel):
    """DecodeOptions.replicas (whisper best_of): mel carries UNIQUE rows,
    prompts/outputs carry rows × replicas, and every replica group shares
    one encoder forward + cross-KV stream. At temperature 0 the replicas
    must reproduce the ungrouped decode of the same rows exactly."""
    import dataclasses
    steps, rep = 6, 3
    base = DecodeOptions(max_tokens=steps, eot=VOCAB - 1,
                         suppress_blank=False)
    prompts = [[4, 17, 1], [1]]
    toks, lens = build_prompt_batch(prompts, 3, pad_id=0)
    ref = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, base, 3)
    grouped = dataclasses.replace(base, replicas=rep)
    out = greedy_decode(params, jnp.asarray(mel),
                        jnp.asarray(np.repeat(toks, rep, axis=0)),
                        jnp.asarray(np.repeat(lens, rep, axis=0)),
                        DIMS, grouped, 3)
    got = np.asarray(out["tokens"]).reshape(2, rep, steps)
    slp = np.asarray(out["sum_logprob"]).reshape(2, rep)
    nsp = np.asarray(out["no_speech_prob"]).reshape(2, rep)
    for r in range(rep):
        np.testing.assert_array_equal(got[:, r], np.asarray(ref["tokens"]))
        np.testing.assert_allclose(slp[:, r], np.asarray(ref["sum_logprob"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            nsp[:, r], np.asarray(ref["no_speech_prob"]), atol=1e-6)


def test_replica_shape_mismatch_raises(hf_model, params, mel):
    """prompt rows must equal mel rows × replicas — a silent row mismatch
    would pair prompts with the wrong audio."""
    import dataclasses
    opts = dataclasses.replace(
        DecodeOptions(max_tokens=4, eot=VOCAB - 1, suppress_blank=False),
        replicas=3)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)  # 2 ≠ 2×3
    with pytest.raises(ValueError, match="replicas"):
        greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, opts, 1)


def test_beam_decode_matches_python_reference(hf_model, params, mel):
    """models/decoding.beam_decode vs an independent pure-Python transcript
    of openai-whisper's BeamSearchDecoder (update() with the per-beam
    topk(R+1) pool, sorted EOT→finished / non-EOT→live routing with the
    break once R live beams are saved, the capacity-R first-come
    finished_sequences store, and finalize()'s live-beam fill): same
    finished sets, same token sequences, same cumulative scores, in the
    same store order. Covers candidate scoring, top-R live selection over
    the R×V grid, the finished-insertion rank rule, and the per-step
    self-KV/ancestry reorder."""
    import dataclasses
    from clearconverse_tpu.models.decoding import beam_decode

    steps, rep, sot, eot = 5, 3, 1, VOCAB - 1
    opts = dataclasses.replace(
        DecodeOptions(max_tokens=steps, eot=eot, suppress_blank=False),
        replicas=rep, beam=True)
    toks, lens = build_prompt_batch([[sot]] * (2 * rep), 1, pad_id=0)
    out = beam_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, opts, 1)
    got_tokens = np.asarray(out["tokens"]).reshape(2, rep, steps)
    got_scores = np.asarray(out["sum_logprob"]).reshape(2, rep)

    def step_logp(cross_kv, prefix):
        """log-softmax of the next-token logits after ``prefix`` (full
        teacher-forced forward — no incremental cache, so it cannot share
        a bug with the loop under test)."""
        t = len(prefix)
        kv = init_kv_cache(DIMS, 1, t)
        pos = jnp.arange(t)[None, :]
        k = jnp.arange(t)[None, None, None, :]
        q = jnp.arange(t)[None, None, :, None]
        mask = jnp.where(k <= q, 0.0, -1e9).astype(jnp.float32)
        logits, _ = decoder_forward(
            params, jnp.asarray([prefix], jnp.int32), pos, jnp.int32(0),
            kv, cross_kv, mask, None, DIMS)
        lg = np.asarray(logits[0, -1], np.float64)
        return lg - np.log(np.sum(np.exp(lg - lg.max()))) - lg.max()

    audio = whisper_encode(params, jnp.asarray(mel), DIMS)
    for g in range(2):
        cross_kv = precompute_cross_kv(params, audio[g:g + 1])
        # whisper's first update: all rep beams are the identical prompt —
        # the dict dedups them to ONE distribution's candidates.
        beams = [([sot], 0.0)] * rep
        finished = []                     # insertion-ordered, capacity rep
        for _ in range(steps):
            # update(): per-beam topk(rep+1) candidates, dict-deduped.
            scores = {}
            for tk, s in beams:
                lp = step_logp(cross_kv, tk)
                for v in np.argsort(-lp)[: rep + 1]:
                    scores[tuple(tk) + (int(v),)] = s + lp[v]
            new_live, new_fin = [], []
            for seq in sorted(scores, key=scores.get, reverse=True):
                if seq[-1] == eot:
                    new_fin.append((list(seq), scores[seq]))
                else:
                    new_live.append((list(seq), scores[seq]))
                    if len(new_live) == rep:
                        break             # later EOT candidates are DROPPED
            for tk, s in new_fin:         # score-ordered, first-come store
                if len(finished) < rep:
                    finished.append((tk, s))
            beams = new_live
            if len(finished) >= rep:      # completed (patience=1.0)
                break
        # finalize(): fill from live beams by cumulative score, EOT
        # appended at no logprob cost.
        for tk, s in sorted(beams, key=lambda b: -b[1]):
            if len(finished) >= rep:
                break
            finished.append((tk + [eot], s))
        assert len(finished) == rep
        for r, (tk, s) in enumerate(finished):
            gen = (tk[1:] + [eot] * steps)[:steps]   # strip [sot], EOT-pad
            np.testing.assert_array_equal(got_tokens[g, r], gen)
            np.testing.assert_allclose(got_scores[g, r], s, atol=1e-3)


def test_beam_decode_context_full_freezes_and_fills(hf_model, params, mel):
    """A group whose prompt nearly exhausts n_text_ctx stops extending at
    the context boundary (whisper's sample loop break) and its live beams
    fill the finished store at finalize with a free EOT — mirrored by a
    Python whisper-BeamSearchDecoder transcript run for exactly the
    context-budget number of update steps."""
    import dataclasses
    from clearconverse_tpu.models.decoding import beam_decode

    steps, rep, sot, eot = 8, 2, 1, VOCAB - 1
    plen = DIMS.n_text_ctx - 3                 # budget: 3 generated slots
    opts = dataclasses.replace(
        DecodeOptions(max_tokens=steps, eot=eot, suppress_blank=False),
        replicas=rep, beam=True)
    prompt = [sot] + [(7 * i) % (VOCAB - 2) + 1 for i in range(plen - 1)]
    toks, lens = build_prompt_batch([prompt] * rep, plen, pad_id=0)
    out = beam_decode(params, jnp.asarray(mel[:1]), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, opts, plen)
    got_tokens = np.asarray(out["tokens"]).reshape(rep, steps)
    got_scores = np.asarray(out["sum_logprob"]).reshape(rep)

    def step_logp(cross_kv, prefix):
        t = len(prefix)
        kv = init_kv_cache(DIMS, 1, t)
        pos = jnp.arange(t)[None, :]
        k = jnp.arange(t)[None, None, None, :]
        q = jnp.arange(t)[None, None, :, None]
        mask = jnp.where(k <= q, 0.0, -1e9).astype(jnp.float32)
        logits, _ = decoder_forward(
            params, jnp.asarray([prefix], jnp.int32), pos, jnp.int32(0),
            kv, cross_kv, mask, None, DIMS)
        lg = np.asarray(logits[0, -1], np.float64)
        return lg - np.log(np.sum(np.exp(lg - lg.max()))) - lg.max()

    audio = whisper_encode(params, jnp.asarray(mel[:1]), DIMS)
    cross_kv = precompute_cross_kv(params, audio)
    beams = [(list(prompt), 0.0)] * rep
    finished = []
    for _ in range(DIMS.n_text_ctx - plen):    # context budget, not steps
        scores = {}
        for tk, s in beams:
            lp = step_logp(cross_kv, tk)
            for v in np.argsort(-lp)[: rep + 1]:
                scores[tuple(tk) + (int(v),)] = s + lp[v]
        new_live = []
        for seq in sorted(scores, key=scores.get, reverse=True):
            if seq[-1] == eot:
                if len(finished) < rep:
                    finished.append((list(seq), scores[seq]))
            else:
                new_live.append((list(seq), scores[seq]))
                if len(new_live) == rep:
                    break
        beams = new_live
        if len(finished) >= rep:
            break
    for tk, s in sorted(beams, key=lambda b: -b[1]):
        if len(finished) >= rep:
            break
        finished.append((tk + [eot], s))
    for r, (tk, s) in enumerate(finished):
        gen = (tk[plen:] + [eot] * steps)[:steps]
        np.testing.assert_array_equal(got_tokens[r], gen)
        np.testing.assert_allclose(got_scores[r], s, atol=1e-3)


def test_suppression_rules(hf_model, params, mel):
    banned = (3, 7, 11)
    opts = DecodeOptions(max_tokens=6, eot=VOCAB - 1, suppress_blank=False,
                         suppress_tokens=banned)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)
    out = np.asarray(greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                                   jnp.asarray(lens), DIMS, opts, 1)["tokens"])
    assert not np.isin(out, np.asarray(banned)).any()


def test_no_speech_prob_matches_torch_softmax(hf_model, params, mel):
    """no_speech_prob must equal softmax of the raw logits at the SOT input
    slot (openai-whisper reads logits[:, sot_index]); layout pins SOT at
    slot P-2."""
    sot, nt, ns_tok = 1, 2, 5
    opts = DecodeOptions(max_tokens=4, eot=VOCAB - 1, suppress_blank=False,
                         no_speech_token=ns_tok)
    toks, lens = build_prompt_batch([[sot, nt], [sot, nt]], 2, pad_id=0)
    out = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, opts, 2)
    with torch.no_grad():
        logits = hf_model(input_features=torch.tensor(mel),
                          decoder_input_ids=torch.tensor(toks.tolist())).logits
        ref = logits[:, 0, :].float().softmax(-1)[:, ns_tok].numpy()
    np.testing.assert_allclose(np.asarray(out["no_speech_prob"]), ref,
                               atol=1e-5)
    # Disabled (default) → zeros.
    out2 = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                         jnp.asarray(lens), DIMS,
                         DecodeOptions(max_tokens=4, eot=VOCAB - 1,
                                       suppress_blank=False), 2)
    np.testing.assert_array_equal(np.asarray(out2["no_speech_prob"]), 0.0)


def test_generation_force_finishes_at_text_ctx(hf_model, params, mel):
    """Rows whose prompt nearly fills n_text_ctx stop generating at the
    context end instead of reusing the last positional embedding
    (openai-whisper caps prompt+generation <= n_text_ctx)."""
    n_ctx = DIMS.n_text_ctx                      # 48
    prompt = [1] + [2] * (n_ctx - 3)             # length 46
    opts = DecodeOptions(max_tokens=8, eot=VOCAB - 1, suppress_blank=False)
    toks, lens = build_prompt_batch([prompt], len(prompt), pad_id=0)
    out = greedy_decode(params, jnp.asarray(mel[:1]), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, opts, len(prompt))
    assert int(out["lengths"][0]) <= n_ctx - len(prompt)
    toks_np = np.asarray(out["tokens"])[0]
    assert (toks_np[n_ctx - len(prompt):] == VOCAB - 1).all()


def test_timestamp_rules_structure(hf_model, params, mel):
    """Timestamp decoding obeys whisper's ApplyTimestampRules: starts with a
    timestamp (capped by max_initial), timestamps pair up around text, and
    are non-decreasing."""
    sot, eot, tsb = 1, 139, 140
    opts = DecodeOptions(max_tokens=24, eot=eot, suppress_blank=False,
                         timestamps=True, timestamp_begin=tsb,
                         max_initial_timestamp_index=5)
    toks, lens = build_prompt_batch([[sot], [sot]], 1, pad_id=0)
    out = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, opts, 1)
    tokens, lengths = np.asarray(out["tokens"]), np.asarray(out["lengths"])
    for b in range(2):
        seq = tokens[b, : lengths[b]].tolist()
        assert seq, "no tokens generated"
        assert seq[0] >= tsb, "first sampled token must be a timestamp"
        assert seq[0] <= tsb + 5, "initial timestamp exceeds the cap"
        last_ts = None
        for j, t in enumerate(seq):
            if t >= tsb:
                if last_ts is not None:
                    assert t >= last_ts, "timestamps must be non-decreasing"
                last_ts = t
                if j >= 2 and seq[j - 1] >= tsb and seq[j - 2] >= tsb:
                    pytest.fail("three timestamps in a row")
        # After a lone trailing timestamp, only ts/EOT may follow — implied
        # by the loop ending at EOT; check no text follows an open pair end.
        for j in range(1, len(seq) - 1):
            if seq[j] >= tsb and seq[j - 1] < tsb and j >= 1:
                nxt = seq[j + 1]
                assert nxt >= tsb or nxt == eot or j + 1 >= len(seq)


def test_bf16_encoder_close_to_f32(params, mel):
    f32 = np.asarray(whisper_encode(params, jnp.asarray(mel), DIMS))
    bf16 = np.asarray(whisper_encode(params, jnp.asarray(mel), DIMS,
                                     compute_dtype=jnp.bfloat16)).astype(np.float32)
    # bf16 matmuls: loose tolerance, but structure must hold.
    assert np.mean(np.abs(f32 - bf16)) < 0.05


def test_model_dims_registry():
    d = model_dims("small.en")
    assert d.n_audio_state == 768 and d.n_audio_layer == 12 and d.n_vocab == 51864
    assert model_dims("tiny").n_vocab == 51865
    with pytest.raises(ValueError):
        model_dims("huge")


def test_scan_layers_matches_loop(hf_model, params, mel):
    """Stacked-scan decoder == unrolled decoder, token for token."""
    opts_loop = DecodeOptions(max_tokens=6, eot=VOCAB - 1, suppress_blank=False)
    opts_scan = DecodeOptions(max_tokens=6, eot=VOCAB - 1, suppress_blank=False,
                              scan_layers=True)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)
    a = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, opts_loop, 1)
    b = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, opts_scan, 1)
    np.testing.assert_array_equal(np.asarray(a["tokens"]), np.asarray(b["tokens"]))
    np.testing.assert_allclose(np.asarray(a["sum_logprob"]),
                               np.asarray(b["sum_logprob"]), atol=1e-4)


def test_head_major_cross_kv_matches_legacy(params, mel):
    """decoder_forward with head-major cross-KV (the decode-loop layout,
    precompute_cross_kv(n_head=...)) == legacy [B,T,D] layout, for both
    bf16 storage and int8 quantized storage."""
    audio = whisper_encode(params, jnp.asarray(mel), DIMS)
    B = audio.shape[0]
    toks = jnp.asarray(np.array([[1, 5, 9], [1, 2, 3]], np.int32))
    pos = jnp.broadcast_to(jnp.arange(3)[None, :], (B, 3))
    k = jnp.arange(8)[None, None, None, :]
    q = jnp.arange(3)[None, None, :, None]
    mask = jnp.where((k <= q) & (k < 3), 0.0, -1e9).astype(jnp.float32)

    def run(ckv):
        kv = init_kv_cache(DIMS, B, 8)
        logits, _ = decoder_forward(params, toks, pos, jnp.int32(0), kv,
                                    ckv, mask, None, DIMS)
        return np.asarray(logits)

    legacy16 = run(precompute_cross_kv(params, audio))
    hm16 = run(precompute_cross_kv(params, audio, n_head=DIMS.n_text_head))
    np.testing.assert_allclose(hm16, legacy16, atol=2e-4)

    legacy8 = run(precompute_cross_kv(params, audio, bits=8))
    hm8 = run(precompute_cross_kv(params, audio, bits=8,
                                  n_head=DIMS.n_text_head))
    # identical per-channel quantization semantics; folding order differs
    np.testing.assert_allclose(hm8, legacy8, atol=5e-3)
    np.testing.assert_allclose(hm8, legacy16, atol=0.2)


def test_int8_self_kv_matches_f32_cache(hf_model, params, mel):
    """Greedy decode with the int8 self-attention cache (per-position
    scales, init_kv_cache bits=8) produces the same tokens as the full-
    precision cache on the tiny model."""
    sot, steps = 1, 8
    toks, lens = build_prompt_batch([[sot], [sot]], 1, pad_id=0)
    base = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False)
    q8 = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False,
                       self_kv_bits=8)
    a = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, base, 1)
    b = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, q8, 1)
    np.testing.assert_array_equal(np.asarray(a["tokens"]), np.asarray(b["tokens"]))
    np.testing.assert_allclose(np.asarray(a["sum_logprob"]),
                               np.asarray(b["sum_logprob"]), atol=0.05)


def test_int8_self_kv_multitoken_prefill(hf_model, params, mel):
    """int8 self-KV with a MULTI-token prompt: the prefill writes a T>1
    block into the quantized cache (per-position scales per slot)."""
    steps = 6
    toks, lens = build_prompt_batch([[1, 5, 9], [1, 7]], 4, pad_id=0)
    base = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False)
    q8 = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False,
                       self_kv_bits=8)
    a = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, base, 4)
    b = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                      jnp.asarray(lens), DIMS, q8, 4)
    np.testing.assert_array_equal(np.asarray(a["tokens"]), np.asarray(b["tokens"]))


def test_packed_output_matches_keys(hf_model, params, mel):
    """The single-transfer "packed" result array carries exactly the four
    individual outputs (tunnel-RTT optimization; bundle._unpack_decode)."""
    from clearconverse_tpu.pipeline.bundle import _unpack_decode

    steps = 8
    opts = DecodeOptions(max_tokens=steps, eot=VOCAB - 1, suppress_blank=False)
    toks, lens = build_prompt_batch([[1], [1]], 1, pad_id=0)
    out = greedy_decode(params, jnp.asarray(mel), jnp.asarray(toks),
                        jnp.asarray(lens), DIMS, opts, 1)
    tk, ln, slp, nsp = _unpack_decode(out, steps)
    np.testing.assert_array_equal(tk, np.asarray(out["tokens"]))
    np.testing.assert_array_equal(ln, np.asarray(out["lengths"]))
    np.testing.assert_array_equal(slp, np.asarray(out["sum_logprob"],
                                                  np.float32))
    np.testing.assert_array_equal(nsp, np.asarray(out["no_speech_prob"],
                                                  np.float32))
