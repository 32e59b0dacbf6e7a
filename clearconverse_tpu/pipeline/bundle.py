"""ModelBundle: the engine's device-program interface.

The engine (pipeline/engine.py) never touches model internals — it talks to
four batched callables. This mirrors the reference's model-handle layout
(back/api.py:601-797: whisper_model / embedding_model / vad+diarization
pipelines / separator) but each call takes a BATCH and runs as one device
program. Tests inject ``FakeModels`` (deterministic, weight-free) — the
in-process fake backend SURVEY.md §4 calls for.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _unpack_decode(out: dict, max_tokens: int):
    """Fetch a greedy_decode result with ONE device→host transfer via its
    "packed" [B, max_tokens+3] int32 array (each separate fetch pays a
    ~34 ms tunnel RTT; pulling the four keys individually cost the decode
    loop ~100 ms per call — models/decoding.greedy_decode note). Results
    without "packed" (test stand-ins, alternate decode backends) fall back
    to per-key fetches."""
    if "packed" not in out:
        return (np.asarray(out["tokens"]), np.asarray(out["lengths"]),
                np.asarray(out["sum_logprob"]),
                np.asarray(out["no_speech_prob"]))
    pk = np.asarray(out["packed"])
    return (pk[:, :max_tokens], pk[:, max_tokens],
            pk[:, max_tokens + 1].copy().view(np.float32),
            pk[:, max_tokens + 2].copy().view(np.float32))


def _row_bucket(n: int) -> int:
    """Next power-of-two row count: every device-facing batch pads to one of
    a tiny set of shapes so jit programs compile once per (rows, length)
    bucket instead of per request (minutes per shape on TPU)."""
    b = 1
    while b < n:
        b *= 2
    return b


class AudioStore:
    """Gated full-file audio resident on device as one ``[N, T+30 s]``
    array (30 s of trailing zeros so window gathers never clamp).

    Batch consumers pass (row, start, len) descriptors instead of audio —
    window extraction happens ON DEVICE (models/decoding.gather_windows),
    replacing bulk re-uploads with a few tiny integer transfers. Measured
    through the tunnel: host↔device moves ~26 MB/s, and window re-uploads
    dominated the engine pass."""

    def __init__(self, dev, sr: int):
        self.dev = dev            # jnp [N, T + 30*sr]
        self.sr = sr


class StoreBatch:
    """A batch of fixed-bucket windows into an AudioStore: (row, start,
    valid-len) per entry. Supports the row indexing/padding the transcribe
    fallback loop applies to plain arrays."""

    def __init__(self, store: AudioStore, rows, starts, lens, bucket: int):
        self.store = store
        self.bucket = int(bucket)
        self.rows = np.asarray(rows, np.int32)
        self.starts = np.asarray(starts, np.int32)
        self.lens = np.asarray(lens, np.int32)

    @property
    def shape(self):
        return (len(self.rows), self.bucket)

    def __getitem__(self, idx):
        return StoreBatch(self.store, self.rows[idx], self.starts[idx],
                          self.lens[idx], self.bucket)

    def pad_rows(self, extra: int) -> "StoreBatch":
        z = np.zeros(extra, np.int32)
        return StoreBatch(self.store,
                          np.concatenate([self.rows, z]),
                          np.concatenate([self.starts, z]),
                          np.concatenate([self.lens, np.ones(extra, np.int32)]),
                          self.bucket)

    def gather(self):
        """Eager device gather → [B, bucket] (rare paths only)."""
        from clearconverse_tpu.models.decoding import gather_windows
        return gather_windows(self.store.dev, self.rows, self.starts,
                              self.lens, self.bucket)


def iter_store_batches(refs, lens, sr, buckets, batch_size,
                       fixed_bucket=None):
    """Group (store, row, start) refs with per-item valid lengths by
    (store, duration bucket) into StoreBatch device batches.

    Yields (original_indices, StoreBatch) — the one grouping rule for every
    store-backed consumer (decode wavefront, embeddings, profiles)."""
    from clearconverse_tpu.pipeline.batching import pick_bucket
    groups = {}
    for i, (ref, n) in enumerate(zip(refs, lens)):
        b = (fixed_bucket if fixed_bucket is not None
             else int(pick_bucket(n / sr, buckets) * sr))
        groups.setdefault((id(ref[0]), b), []).append(i)
    for (_, b), ids in sorted(groups.items()):
        for lo in range(0, len(ids), batch_size):
            sub = ids[lo:lo + batch_size]
            yield sub, StoreBatch(refs[sub[0]][0],
                                  [refs[i][1] for i in sub],
                                  [refs[i][2] for i in sub],
                                  [max(min(lens[i], b), 1) for i in sub], b)


class ModelBundle:
    """Real TPU-backed bundle. Lazy: heavy jit compilation happens at first
    use per bucket shape; ``load_with_progress`` mirrors the reference's
    staged loading percentages (back/api.py:617-655)."""

    def __init__(self, config=None, tpu_config=None, model_dir: str = "./models"):
        from clearconverse_tpu.config import Config, TPUConfig
        self.config = config or Config()
        self.tpu = tpu_config or TPUConfig()
        self.model_dir = model_dir
        self._loaded = False
        # Where each family's weights actually came from on the last load —
        # "checkpoint" (converted from model_dir) vs "random_init" — so
        # bench/serve telemetry can prove the converter path ran
        # (VERDICT r4 #3; reference always loads real weights,
        # back/api.py:657-797).
        self.load_source: dict = {}
        self._whisper = None       # (params, dims, tokenizer)
        self._ecapa = None         # params
        self._pyannet = None       # params
        self._sepformer = None     # params
        # Dims default to the production configurations; tests inject
        # smaller ones alongside hand-built params.
        self._ecapa_dims = None
        self._pyannet_dims = None
        self._sepformer_dims = None
        # Jitted device programs, built lazily per dims (un-jitted eager
        # dispatch costs ~30-100 ms per op over the device tunnel — measured
        # 10.7 s vs 27.6 ms for one segmentation batch).
        self._jit_embed = None
        self._jit_embed_denoised = {}        # keyed by sample rate
        self._jit_embed_from_store = {}      # keyed by bucket
        self._jit_embed_denoised_store = {}  # keyed by (bucket, sr)
        self._jit_segment_store = {}         # keyed by window
        self._jit_segment = None
        self._jit_separate = None
        # Per-call sampling seed: whisper's fallback rungs draw fresh
        # randomness every decode; a fixed key would retry every batch with
        # identical samples (VERDICT r1).
        self._decode_seed = 0
        # Cancel gate: when set (the engine installs it per run), every
        # batched compute method probes it BEFORE dispatching — a cancelled
        # task must never pay a first-per-shape jit compile, which takes
        # minutes over the tunnel (VERDICT r2 weak #4).
        self.should_cancel: Optional[Callable[[], bool]] = None
        # Wall-clock sub-spans of the transcribe calls ("decode_dev" =
        # device program incl. result sync; the remainder is host
        # tokenizer/quality-gate work). The engine snapshots
        # ``stage_times`` around the decode wavefront and surfaces the
        # deltas as decode_wavefront.* children in bench.py's breakdown.
        from clearconverse_tpu.utils.tracing import StageTimer
        # totals_only: this timer lives as long as the bundle and records a
        # span per device call — an append-only span list would grow
        # unboundedly in a long-running server.
        self._stage_timer = StageTimer(totals_only=True)
        # Multi-chip serving (SURVEY.md §2.5/§5.8 new design): when
        # TPUConfig.data_axis * model_axis > 1, a device mesh shards every
        # batched program — whisper params megatron-style over ``model``,
        # batch rows over ``data`` — and XLA inserts the ICI collectives.
        self._mesh = None
        self._mesh_built = False
        self._whisper_placed = False
        self._aux_placed = False

    # ----------------------------------------------------------------- mesh
    @property
    def mesh(self):
        """Device mesh from TPUConfig axes; None for the 1x1 (single-chip)
        configuration. Built lazily so tests can inject models first."""
        if not self._mesh_built:
            self._mesh_built = True
            if self.tpu.data_axis * self.tpu.model_axis > 1:
                from clearconverse_tpu.parallel.mesh import build_mesh
                self._mesh = build_mesh(data=self.tpu.data_axis,
                                        model=self.tpu.model_axis)
        return self._mesh

    def _rows(self, n: int) -> int:
        """Row bucket, rounded up so the data axis divides it evenly."""
        rows = _row_bucket(n)
        d = self.tpu.data_axis
        if d > 1 and rows % d:
            rows = -(-rows // d) * d
        return max(rows, d)

    @property
    def stage_times(self) -> dict:
        """Accumulated transcribe sub-spans (see __init__ note)."""
        return self._stage_timer.as_dict()

    def _put_data(self, arr):
        """Commit a batch array to the mesh, leading axis over ``data``
        (no-op placement on the 1x1 config)."""
        import jax
        import jax.numpy as jnp
        arr = jnp.asarray(arr)
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # The engine checks this to decide whether to build store-backed
    # (device-resident) batches; test fakes don't set it.
    supports_store = True

    def make_store(self, dev_audio, sr: int) -> AudioStore:
        """Wrap a device-resident [N, T] gated-audio array (e.g. the gate
        output of audio.decode.load_audio_many) as an AudioStore, adding the
        30 s zero tail gathers rely on; replicated across the mesh."""
        import jax
        import jax.numpy as jnp
        dev = jnp.pad(jnp.asarray(dev_audio), ((0, 0), (0, 30 * sr)))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dev = jax.device_put(dev, NamedSharding(self.mesh, P()))
        return AudioStore(dev, sr)

    def _place_aux(self) -> None:
        """Move the non-whisper model params to device ONCE per (re)load.

        Converted checkpoints arrive as HOST numpy pytrees, and a numpy
        leaf passed to a jitted program re-uploads on EVERY call — ~25 MB
        of ECAPA weights per embed batch over the ~30 MB/s tunnel, which
        made every embed stage ~10× slower the first time real-format
        checkpoints were loaded (round 5: engine 430× random-init vs 165×
        checkpoint until this fix; random-init params never hit it because
        init_* builds them on device). With a mesh they replicate across
        it (small; data-parallel batches need a copy per device)."""
        if self._aux_placed:
            return
        import jax
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())

            def put(x):
                return jax.device_put(x, rep)
        else:
            put = jax.device_put
        for name in ("_ecapa", "_pyannet", "_sepformer"):
            tree = getattr(self, name)
            if tree is not None:
                setattr(self, name, jax.tree.map(put, tree))
        self._aux_placed = True

    # ---------------------------------------------------------------- load
    def models_are_loaded(self) -> bool:
        return self._loaded

    def load_with_progress(self, progress_callback: Optional[Callable] = None) -> bool:
        """Stage order and percentages follow back/api.py:617-655:
        separation → whisper → pyannote-family."""
        import jax

        def cb(pct, msg):
            if progress_callback:
                progress_callback(pct, msg)

        try:
            self.load_source = {}   # fresh provenance for this (re)load
            cb(10, "Loading separation model")
            self._sepformer = self._load_sepformer()

            cb(40, "Loading Whisper model")
            from clearconverse_tpu.models.convert import load_whisper
            from clearconverse_tpu.models.tokenizer import load_tokenizer
            from clearconverse_tpu.models.whisper import init_whisper_params

            params, dims = load_whisper(self.model_dir, self.config.whisper_model_size)
            if params is None:
                logger.warning("no whisper checkpoint in %s; using random init",
                               self.model_dir)
                params = init_whisper_params(jax.random.PRNGKey(0), dims)
                self.load_source["whisper"] = "random_init"
            else:
                self.load_source["whisper"] = "checkpoint"
            english = self.config.whisper_model_size.endswith(".en")
            tok = load_tokenizer(self.model_dir, english=english)
            self.load_source["tokenizer"] = type(tok).__name__
            self._whisper = (jax.device_put(params), dims, tok)

            cb(70, "Loading speaker models")
            self._ecapa = self._load_ecapa()
            self._pyannet = self._load_pyannet()
            cb(100, "Models loaded")
            # Freshly loaded params are on the default device; a RE-load on
            # a multichip bundle must re-shard/replicate them (see
            # load_native).
            self._whisper_placed = False
            self._aux_placed = False
            self._loaded = True
            return True
        except Exception as exc:  # noqa: BLE001 — load failure is recoverable
            logger.error("model loading failed: %s", exc)
            return False

    def _load_sepformer(self):
        import os
        import jax
        from clearconverse_tpu.models.resepformer import (
            convert_speechbrain_sepformer, init_sepformer_params)
        from clearconverse_tpu.models.convert import load_torch_state_dict
        ft = os.path.join(self.model_dir, "resepformer-ft")
        names = ["encoder.ckpt", "masknet.ckpt", "decoder.ckpt"]
        if all(os.path.exists(os.path.join(ft, n)) for n in names):
            try:  # ft → base fallback (back/api.py:752-764)
                from clearconverse_tpu.models.resepformer import (
                    infer_sepformer_dims)
                sds = [load_torch_state_dict(os.path.join(ft, n)) for n in names]
                params = convert_speechbrain_sepformer(*sds)
                # The checkpoint's own shapes govern the forward (head count
                # and chunk size stay at the production defaults — they are
                # not recoverable from weights).
                self._sepformer_dims = infer_sepformer_dims(params)
                self.load_source["sepformer"] = "checkpoint"
                return params
            except Exception as exc:
                logger.warning("resepformer-ft load failed (%s); using init", exc)
        self.load_source["sepformer"] = "random_init"
        return init_sepformer_params(jax.random.PRNGKey(1))

    def _load_ecapa(self):
        import os
        import jax
        from clearconverse_tpu.models.ecapa import (
            convert_speechbrain_ecapa, init_ecapa_params)
        from clearconverse_tpu.models.convert import load_torch_state_dict
        ckpt = os.path.join(self.model_dir, "embedding", "embedding_model.ckpt")
        if os.path.exists(ckpt):
            try:
                from clearconverse_tpu.models.ecapa import infer_ecapa_dims
                params = convert_speechbrain_ecapa(load_torch_state_dict(ckpt))
                self._ecapa_dims = infer_ecapa_dims(params)
                self.load_source["ecapa"] = "checkpoint"
                return params
            except Exception as exc:
                logger.warning("ecapa ckpt load failed (%s); using init", exc)
        self.load_source["ecapa"] = "random_init"
        return init_ecapa_params(jax.random.PRNGKey(2))

    def _load_pyannet(self):
        import os
        import jax
        from clearconverse_tpu.models.pyannet import (
            convert_pyannote_pyannet, init_pyannet_params)
        from clearconverse_tpu.models.convert import load_torch_state_dict
        ckpt = os.path.join(self.model_dir, "segmentation", "pytorch_model.bin")
        if os.path.exists(ckpt):
            try:
                from clearconverse_tpu.models.pyannet import infer_pyannet_dims
                params = convert_pyannote_pyannet(load_torch_state_dict(ckpt))
                self._pyannet_dims = infer_pyannet_dims(params)
                self.load_source["pyannet"] = "checkpoint"
                return params
            except Exception as exc:
                logger.warning("pyannet ckpt load failed (%s); using init", exc)
        self.load_source["pyannet"] = "random_init"
        return init_pyannet_params(jax.random.PRNGKey(3))

    # ---------------------------------------------------------- checkpoints
    def save_native(self, path: str) -> None:
        """Persist all four model families as one orbax checkpoint (the
        framework's own format; the reference has no equivalent — its
        'checkpoints' are only the consumed ft overlays, SURVEY.md §5.4).
        Dims ride along so restore is self-describing — the name table is
        never consulted (a tiny/custom model round-trips exactly)."""
        self._ensure()
        import dataclasses
        import numpy as _np
        from clearconverse_tpu.train.checkpoint import save_checkpoint
        whisper_params, w_dims, _ = self._whisper

        def dims_tree(d):
            # tuples → arrays so every leaf is a plain orbax-storable array
            return {k: _np.asarray(v) for k, v in
                    dataclasses.asdict(d).items()}

        from clearconverse_tpu.models.ecapa import EcapaDims
        from clearconverse_tpu.models.pyannet import PyannetDims
        from clearconverse_tpu.models.resepformer import SepformerDims
        save_checkpoint(path, {
            "whisper": whisper_params,
            "ecapa": self._ecapa,
            "pyannet": self._pyannet,
            "sepformer": self._sepformer,
            "meta": {
                "whisper_dims": dims_tree(w_dims),
                "ecapa_dims": dims_tree(self._ecapa_dims or EcapaDims()),
                "pyannet_dims": dims_tree(self._pyannet_dims or PyannetDims()),
                "sepformer_dims": dims_tree(self._sepformer_dims
                                            or SepformerDims()),
            },
        })

    def load_native(self, path: str) -> None:
        """Restore a save_native checkpoint. Dims come from the checkpoint's
        own meta block when present (self-describing); pre-meta checkpoints
        fall back to the config's name table + shape inference."""
        import jax
        from clearconverse_tpu.models.tokenizer import load_tokenizer
        from clearconverse_tpu.models.whisper import model_dims
        from clearconverse_tpu.train.checkpoint import load_checkpoint
        payload = load_checkpoint(path)["params"]

        def undims(cls, tree):
            import dataclasses
            fields = {f.name: f for f in dataclasses.fields(cls)}
            vals = {}
            for k, v in tree.items():
                if k not in fields:
                    continue
                arr = np.asarray(v)
                vals[k] = (tuple(int(x) for x in arr.reshape(-1))
                           if arr.ndim else int(arr))
            return cls(**vals)

        from clearconverse_tpu.models.ecapa import EcapaDims
        from clearconverse_tpu.models.pyannet import PyannetDims
        from clearconverse_tpu.models.resepformer import SepformerDims
        from clearconverse_tpu.models.whisper import WhisperDims
        meta = payload.get("meta")
        if meta:
            dims = undims(WhisperDims, meta["whisper_dims"])
            self._ecapa_dims = undims(EcapaDims, meta["ecapa_dims"])
            self._pyannet_dims = undims(PyannetDims, meta["pyannet_dims"])
            self._sepformer_dims = undims(SepformerDims,
                                          meta["sepformer_dims"])
        else:
            from clearconverse_tpu.models.convert import infer_whisper_dims
            from clearconverse_tpu.models.ecapa import infer_ecapa_dims
            from clearconverse_tpu.models.pyannet import infer_pyannet_dims
            from clearconverse_tpu.models.resepformer import (
                infer_sepformer_dims)
            dims = infer_whisper_dims(
                payload["whisper"],
                model_dims(self.config.whisper_model_size))
            self._ecapa_dims = infer_ecapa_dims(payload["ecapa"])
            self._pyannet_dims = infer_pyannet_dims(payload["pyannet"])
            self._sepformer_dims = infer_sepformer_dims(payload["sepformer"])
        english = self.config.whisper_model_size.endswith(".en")
        tok = load_tokenizer(self.model_dir, english=english)
        self._whisper = (jax.device_put(payload["whisper"]), dims, tok)
        self._ecapa = payload["ecapa"]
        self._pyannet = payload["pyannet"]
        self._sepformer = payload["sepformer"]
        # Provenance telemetry must follow hot-swaps too: a payload load
        # after (or instead of) a model-dir load would otherwise leave
        # stale "random_init" entries and bench/serve would mislabel real
        # weights as random (review r5).
        self.load_source = {f: "payload" for f in
                            ("whisper", "ecapa", "pyannet", "sepformer")}
        self.load_source["tokenizer"] = type(tok).__name__
        # Hot-swapped params land on the default device — force the next
        # _whisper_on_mesh/_place_aux to re-shard/replicate them, or a
        # multichip bundle would feed unsharded single-device params into
        # mesh-sharded programs.
        self._whisper_placed = False
        self._aux_placed = False
        self._loaded = True

    # ------------------------------------------------------------- compute
    def _ensure(self):
        """Load models lazily AND probe the cancel gate — called at the top
        of every batched compute method, so no device program (or cold
        compile) ever starts for an already-cancelled task (the reference
        could kill the worker process instead, back/api.py:2029-2042)."""
        if self.should_cancel is not None and self.should_cancel():
            from clearconverse_tpu.pipeline.cancel import ProcessingCancelled
            raise ProcessingCancelled()
        if not self._loaded:
            self.load_with_progress()

    def _whisper_on_mesh(self):
        params, dims, tok = self._whisper
        if self.mesh is not None and not self._whisper_placed:
            from clearconverse_tpu.parallel.sharding import shard_params
            params = shard_params(params, self.mesh)
            self._whisper = (params, dims, tok)
        self._whisper_placed = True
        return params, dims, tok

    def _prompt_batch(self, prompts, tok, dims, timestamps: bool,
                      languages=None):
        """openai-whisper parity prompt assembly: context encodes as
        " " + prompt.strip() kept to the last n_text_ctx//2-1 tokens
        (transcribe.py's initial_prompt handling), terminated by the SOT
        sequence — bare [sot] for .en models, [sot, <|lang|>, <|transcribe|>]
        for multilingual ones — plus notimestamps outside timestamp mode.

        A prompt entry may also be a TUPLE ``(init_text, token_ids)``:
        whisper's seek loop chains windows at the TOKEN level
        (``all_tokens`` accumulates each window's kept segment tokens —
        timestamp tokens included — and the next window's prompt is
        ``all_tokens[prompt_reset_since:]``, ids not text), so the engine
        passes decoded ids straight back instead of a detokenize→
        re-tokenize round trip that can shift BPE merge boundaries and
        strips timestamp context. The tuple is encode(" "+init_text) ++
        token_ids, tail-trimmed to the same ctx_keep.

        ``languages`` (per-row ISO codes, from detection) overrides the
        pinned TPUConfig.language on multilingual models. Prompt lengths
        bucket into a tiny static set (max_prompt_len is a static jit arg;
        arbitrary lengths would recompile the decode program per batch)."""
        from clearconverse_tpu.models.decoding import build_prompt_batch
        sp = tok.specials
        ctx_keep = dims.n_text_ctx // 2 - 1
        if sp.english_only:
            tails = [[sp.sot]] * len(prompts)
        else:
            langs = (languages if languages is not None
                     else [self.tpu.language or "en"] * len(prompts))
            tails = [list(sp.sot_sequence(sp.language_token(lang)))
                     for lang in langs]
        tail_len = len(tails[0])
        if not timestamps:
            tails = [t + [sp.no_timestamps] for t in tails]
            tail_len += 1

        def ctx_ids(p):
            if isinstance(p, tuple):
                init, ids = p
                full = (tok.encode(" " + init.strip()) if init.strip()
                        else []) + [int(t) for t in ids]
                return full
            return tok.encode(" " + p.strip()) if p.strip() else []

        prompt_lists = []
        for i, p in enumerate(prompts):
            ids = ctx_ids(p)
            prompt_lists.append(
                (([sp.sot_prev] + ids[-ctx_keep:]) if ids else [])
                + tails[i])
        need = max(len(p) for p in prompt_lists)
        max_p = next(b for b in (4, 16, 64, 256) if b >= min(need, 256))
        toks, lens = build_prompt_batch(prompt_lists, max_p, pad_id=sp.eot)
        return toks, lens, max_p, tail_len    # tail length = SOT offset

    def _detect_languages(self, audio, params, dims, tok, target: int):
        """Per-row language codes via whisper detect_language (VERDICT r2
        missing #5) — runs only for multilingual models with
        TPUConfig.language=None.

        KNOWN COST: this is a separate program with its own encoder
        forward, so auto-detect pays ~2× encoder FLOPs per batch (the
        decode program re-encodes — the detected language must come back
        to the HOST to build prompts, so the passes can't fuse without
        moving prompt assembly on-device). Deployments that know their
        language should pin TPUConfig.language instead."""
        import jax.numpy as jnp
        from clearconverse_tpu.models.decoding import detect_language_from_audio
        from clearconverse_tpu.models.tokenizer import WHISPER_LANGUAGES
        sp = tok.specials
        wav = audio.gather() if isinstance(audio, StoreBatch) else audio
        lang_lo = sp.sot + 1
        lang_hi = sp.translate                 # one past the last language
        ids = np.asarray(detect_language_from_audio(
            params, jnp.asarray(wav, jnp.float32), dims, sp.sot, lang_lo,
            lang_hi, target, self._cdt,
            pallas_attn_enabled=self.tpu.pallas_encoder_attn))
        return [WHISPER_LANGUAGES[i - lang_lo] for i in ids]

    def _suppress_ids(self, tok, timestamps: bool):
        """Whisper's per-step suppression set: non-speech symbols +
        specials, plus the timestamp range (non-timestamp mode) or the
        notimestamps token (timestamp mode)."""
        from clearconverse_tpu.models.tokenizer import non_speech_tokens
        sp = tok.specials
        ids = (set(non_speech_tokens(tok))
               | {sp.sot, sp.sot_prev, sp.sot_lm, sp.translate,
                  sp.transcribe, sp.no_speech})
        if timestamps:
            ids |= {sp.no_timestamps}
        else:
            ids |= set(range(sp.timestamp_begin, sp.n_vocab))
        return tuple(sorted(ids))

    @property
    def _cdt(self):
        import jax.numpy as jnp
        return (jnp.bfloat16 if self.tpu.compute_dtype == "bfloat16"
                else jnp.float32)

    def _decode_with_fallback(self, decode_rows, audio_all, toks, lens,
                              temperature, n_real: int, text_of, eot: int):
        """Whisper's decode_with_fallback semantics, shared by
        transcribe_batch and transcribe_long_batch (VERDICT r2 missing #1;
        previously duplicated ~80 lines in each).

        The reference passes a SCALAR temperature (0.1, back/api.py:128
        via :1294); openai-whisper turns a scalar into a ONE-rung schedule
        — no fallback ladder — decoded with DecodingOptions(best_of=5):
        every row draws best_of sampled replicas and the max
        sum_logprob/length one is kept (MaximumLikelihoodRanker,
        length_penalty None). A tuple temperature is whisper transcribe's
        fallback schedule: rows whose text is degenerate (compression
        ratio > 2.4) or low-confidence (avg logprob < logprob_threshold)
        retry at the next rung — unless no_speech_prob clears the
        no-speech threshold (silence is never worth retrying). Retries
        are ROW-SPARSE: only flagged rows gather into a fresh batch.

        ``decode_rows(audio_rows, toks_rows, lens_rows, temp, replicas)``
        → (tokens [R, mt], lengths, sum_logprob, no_speech_prob) — the
        caller supplies its device program (plain or timestamped).
        ``audio_rows`` carries UNIQUE rows; ``toks_rows``/``lens_rows``
        and the outputs carry rows × replicas (replica-consecutive) —
        replication happens inside the program so replicas share the
        encoder forward and cross-KV stream (DecodeOptions.replicas).
        ``text_of(tokens_row, n)`` renders the text the quality gate
        judges (timestamp callers strip ts tokens). Returns
        (tokens [R, mt], lengths [R], sum_lp [R], nsp [R], avg [R],
        texts list[n_real], final_temp [R]) — nsp is from the FIRST rung
        (whisper keeps the original no-speech estimate across retries);
        ``final_temp`` is the rung each row's kept result decoded at
        (whisper records result.temperature per window — its transcribe
        loop resets the rolling prompt when it exceeds 0.5)."""
        import zlib

        nst, lpt = self.tpu.no_speech_threshold, self.tpu.logprob_threshold
        n_rows = len(toks)
        mt = self.tpu.max_decode_tokens

        def avg_logprob(s: float, n: int) -> float:
            return s / max(n + 1, 1)    # whisper: +1 counts the EOT

        def rank_score(s: float, n: int) -> float:
            return s / max(n, 1)        # MaximumLikelihoodRanker (no +1)

        def quality_ok(text: str, a: float) -> bool:
            data = text.encode("utf-8")
            ratio = (len(data) / len(zlib.compress(data))) if data else 0.0
            return ratio <= 2.4 and a >= lpt

        if isinstance(temperature, (tuple, list)):
            ladder = [float(t) for t in temperature] or [0.0]
        else:
            ladder = [float(temperature)]
        ladder = ladder[: max(1, self.tpu.max_fallback_attempts)]

        def rep_for(temp: float) -> int:
            """Replicas per row at a rung — whisper transcribe's rule:
            best_of on sampling rungs (t > 0), beam_size on greedy rungs
            (t == 0); openai-whisper strips the inapplicable option per
            rung the same way."""
            if temp > 0:
                return max(1, self.tpu.best_of)
            return max(1, self.tpu.beam_size)

        def decode_selected(row_idx, temp):
            """Decode original rows ``row_idx``, each sampled best_of times
            when temp > 0; keep the best replica per row by rank_score.
            Returns {row: (tokens, n, sum_lp, nsp)}.

            The audio batch carries UNIQUE rows only; replication happens
            INSIDE the decode program (DecodeOptions.replicas), where the
            encoder runs once per row and all replicas share one cross-KV
            stream — ~1/best_of the decode loop's dominant HBM traffic vs
            tiling the rows host-side (measured: the loop is cross-KV
            streaming-bound, CLAUDE.md perf notes). Greedy rungs with
            beam_size > 1 decode beam_size beams per row instead
            (models/decoding.beam_decode) — the winner-picking rule below
            (max rank_score) IS whisper's MaximumLikelihoodRanker for
            both paths."""
            rep = rep_for(temp)
            uidx = np.asarray(row_idx, np.int64)
            b = self._rows(len(uidx))
            # Pad rows replicate the last row (kept shapes, ignored).
            uidx = np.concatenate([uidx, np.repeat(uidx[-1:], b - len(uidx))])
            idx = np.repeat(uidx, rep)      # prompt rows, replica-consecutive
            t_s, l_s, s_s, n_s = decode_rows(audio_all[uidx], toks[idx],
                                             lens[idx], temp, replicas=rep)
            out = {}
            for fi, row in enumerate(row_idx):
                best_r = max(range(fi * rep, (fi + 1) * rep),
                             key=lambda r: rank_score(float(s_s[r]),
                                                      int(l_s[r])))
                out[row] = (t_s[best_r], int(l_s[best_r]),
                            float(s_s[best_r]), float(n_s[best_r]))
            return out

        if rep_for(ladder[0]) > 1:
            # First (often only) rung replicates: best_of samples per row
            # when it's a sampling rung (the reference's default-config
            # decode path), beam_size beams when greedy + beam decoding is
            # enabled.
            sel = decode_selected(list(range(n_real)), ladder[0])
            final_tokens = np.full((n_rows, mt), eot, np.int32)
            final_lens = np.zeros((n_rows,), np.int32)
            sum_lp = np.zeros((n_rows,), np.float32)
            nsp = np.zeros((n_rows,), np.float32)
            for row, (tk, n, s, ns) in sel.items():
                final_tokens[row, : tk.shape[0]] = tk
                final_lens[row] = n
                sum_lp[row] = s
                nsp[row] = ns
        else:
            tokens, lengths, sum_lp, nsp = decode_rows(audio_all, toks,
                                                       lens, ladder[0])
            final_tokens, final_lens = tokens.copy(), lengths.copy()
        final_avg = np.array([avg_logprob(float(sum_lp[i]),
                                          int(final_lens[i]))
                              for i in range(n_rows)])
        final_temp = np.full((n_rows,), ladder[0], np.float32)
        texts: List[str] = [text_of(final_tokens[i], int(final_lens[i]))
                            for i in range(n_real)]

        def flag(i: int) -> bool:
            # whisper decode_with_fallback: no_speech_prob above the
            # threshold clears needs_fallback UNCONDITIONALLY.
            if nsp[i] > nst:
                return False
            return not quality_ok(texts[i], final_avg[i])

        flagged = [i for i in range(n_real) if flag(i)]
        for temp in ladder[1:]:
            if not flagged:
                break
            sel = decode_selected(flagged, temp)
            still: List[int] = []
            for row, (tk, n, s, _ns) in sel.items():
                # This rung's result stands (whisper keeps the hottest
                # decode even when it still fails the gate on the last
                # rung).
                final_tokens[row, : tk.shape[0]] = tk
                final_lens[row] = n
                final_avg[row] = avg_logprob(s, n)
                final_temp[row] = temp
                texts[row] = text_of(tk, n)
                if flag(row):
                    still.append(row)
            flagged = still
        return (final_tokens, final_lens, sum_lp, nsp, final_avg, texts,
                final_temp)

    def transcribe_batch(self, audio: np.ndarray, prompts: Sequence[str],
                         temperature: float = 0.0,
                         word_timestamps: bool = False):
        """[B, T] padded 16 kHz segments + per-row prompt strings → texts.
        One device program: mel → encoder → batched greedy decode.

        ``word_timestamps=True`` (the reference passes it on every call,
        back/api.py:1290) additionally returns per-row word lists
        [{"word","start","end"}] from a batched teacher-forced
        cross-attention alignment pass → returns (texts, words)."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.models.decoding import (
            DecodeOptions, greedy_decode_from_audio, greedy_decode_from_store)

        params, dims, tok = self._whisper_on_mesh()
        sp = tok.specials
        n_real = len(prompts)
        rows = self._rows(n_real)
        is_store = isinstance(audio, StoreBatch)
        if rows > n_real:
            audio = (audio.pad_rows(rows - n_real) if is_store else
                     np.pad(np.asarray(audio), ((0, rows - n_real), (0, 0))))
            prompts = list(prompts) + [""] * (rows - n_real)
        if self.tpu.pad_to_full_window:
            target = 30 * 16000
        else:  # bucket-length windows: shorter encoder ctx, less cross-KV
            target = min(-(-audio.shape[1] // 16000) * 16000, 30 * 16000)
        if not is_store:
            # pad/mel happen INSIDE the jitted decode program (one dispatch);
            # store batches gather their windows on device as well.
            audio = self._put_data(jnp.asarray(audio, jnp.float32))

        languages = None
        if not sp.english_only and self.tpu.language is None:
            languages = self._detect_languages(audio, params, dims, tok,
                                               target)
        toks, lens, max_p, sot_off = self._prompt_batch(prompts, tok, dims,
                                                        timestamps=False,
                                                        languages=languages)
        cdt = self._cdt
        suppress = self._suppress_ids(tok, timestamps=False)

        def decode_rows(audio_rows, toks_rows, lens_rows, temp: float,
                        replicas: int = 1):
            opts = DecodeOptions(
                max_tokens=self.tpu.max_decode_tokens,
                temperature=temp, eot=sp.eot,
                suppress_blank=True, blank_token=220,
                suppress_tokens=suppress,
                compute_dtype=cdt,
                cross_kv_bits=self.tpu.cross_kv_bits,
                self_kv_bits=self.tpu.self_kv_bits,
                pallas_encoder_attn=self.tpu.pallas_encoder_attn,
                no_speech_token=sp.no_speech, sot_from_end=sot_off,
                replicas=replicas,
                beam=(temp == 0 and replicas > 1))
            rng = None
            if temp > 0:
                self._decode_seed += 1
                rng = jax.random.PRNGKey(self._decode_seed)
            with self._stage_timer.stage("decode_dev"):
                if isinstance(audio_rows, StoreBatch):
                    out = greedy_decode_from_store(
                        params, audio_rows.store.dev,
                        self._put_data(audio_rows.rows),
                        self._put_data(audio_rows.starts),
                        self._put_data(audio_rows.lens),
                        self._put_data(toks_rows), self._put_data(lens_rows),
                        dims, opts, max_p, rng, target_len=target,
                        bucket=audio_rows.bucket)
                else:
                    out = greedy_decode_from_audio(
                        params, self._put_data(audio_rows),
                        self._put_data(toks_rows), self._put_data(lens_rows),
                        dims, opts, max_p, rng, target_len=target)
                return _unpack_decode(out, opts.max_tokens)

        # Whisper's temperature/best_of semantics — shared with
        # transcribe_long_batch (see _decode_with_fallback).
        nst, lpt = self.tpu.no_speech_threshold, self.tpu.logprob_threshold
        (final_tokens, final_lengths, _sum_lp, nsp, final_avg,
         texts, _ftemp) = self._decode_with_fallback(
            decode_rows, audio, toks, lens, temperature, n_real,
            text_of=lambda tk, n: tok.decode(tk[:n]), eot=sp.eot)

        # Whisper's no-speech gate (transcribe: skip the segment when
        # no_speech_prob exceeds the threshold unless avg logprob clears
        # logprob_threshold) — silent/noise rows emit empty text instead of
        # hallucinating (back/api.py:1286-1296 inherits this rule).
        for i in range(n_real):
            if nsp[i] > nst and final_avg[i] <= lpt:
                texts[i] = ""
                final_lengths[i] = 0
        out_texts = texts[:n_real]
        if not word_timestamps:
            return out_texts

        from clearconverse_tpu.audio.mel import log_mel_auto, pad_or_trim
        from clearconverse_tpu.models.alignment import align_batch
        from clearconverse_tpu.models.whisper import whisper_encode
        if is_store:
            audio = audio.gather()
        mel = log_mel_auto(pad_or_trim(audio, target), dims.n_mels)
        feats = whisper_encode(params, mel, dims, cdt,
                               pallas_attn_enabled=self.tpu.pallas_encoder_attn)
        # openai-whisper's find_alignment replays the FULL SOT sequence
        # (+ language/transcribe for multilingual) + <|notimestamps|>
        # before the text tokens, ending with EOT — the same conditioning
        # that generated them.
        if sp.english_only:
            pres = [[sp.sot, sp.no_timestamps]] * rows
        else:
            langs = (list(languages[:n_real]) if languages is not None
                     else [self.tpu.language or "en"] * n_real)
            pres = [list(sp.sot_sequence(sp.language_token(lang)))
                    + [sp.no_timestamps] for lang in langs]
            pres += [[sp.sot, sp.no_timestamps]] * (rows - n_real)
        # Keep the alignment pass on the SAME padded row count as the decode
        # programs: slicing to n_real would give the jitted teacher program a
        # fresh batch axis per caller batch size — each a multi-minute tunnel
        # compile. Pad rows run with length 0 → empty word lists, discarded.
        align_lens = np.zeros(rows, np.int32)
        align_lens[:n_real] = np.asarray(final_lengths[:n_real], np.int32)
        words = align_batch(params, tok, final_tokens, align_lens, feats,
                            dims, prefixes=pres, eot=sp.eot)[:n_real]
        return out_texts, words

    def transcribe_long_batch(self, audio: np.ndarray,
                              prompts: Sequence[str],
                              lengths: Optional[np.ndarray] = None,
                              temperature: float = 0.0):
        """One ≤30 s WINDOW per row of a longer segment → [(text,
        advance_seconds, reset_context, ctx_tokens)] — whisper
        transcribe's timestamp-driven seek (reached via
        back/api.py:1474-1480; VERDICT r1 #8).

        ``ctx_tokens`` is the window's contribution to whisper's
        ``all_tokens`` — the KEPT token ids, timestamp tokens included
        (whisper extends all_tokens with each segment's raw ids); the
        caller chains the next window's prompt from these ids, not from
        re-tokenized text. A skipped (silent) window contributes [].

        Decodes with timestamp tokens (ApplyTimestampRules inside the jit
        loop). Per row: text up to the last COMPLETE <ts>text<ts> segment and
        the cursor advance = that segment's end timestamp; the dropped tail
        re-decodes in the caller's next window, so no words are lost or
        duplicated at window seams. Rows ending in a lone timestamp (or with
        no complete pair) keep all text and advance the full window.

        ``reset_context`` per row is whisper transcribe's prompt-reset rule
        (``if not condition_on_previous_text or result.temperature > 0.5:
        prompt_reset_since = len(all_tokens)``): True tells the caller the
        NEXT window's rolling prompt must start fresh — either the config
        disables conditioning entirely (the reference threads
        config.condition_on_previous_text straight through,
        back/api.py:1478) or this window's kept result decoded at a
        fallback rung hotter than 0.5 (hallucination-loop protection)."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.models.decoding import (
            DecodeOptions, greedy_decode_from_audio, greedy_decode_from_store)

        params, dims, tok = self._whisper_on_mesh()
        sp = tok.specials
        is_store = isinstance(audio, StoreBatch)
        if not is_store:
            audio = np.asarray(audio, np.float32)
        n_real = len(prompts)
        if lengths is None:
            lengths = (audio.lens[:n_real] if is_store
                       else np.full(n_real, audio.shape[1], np.int64))
        window_s = np.minimum(np.asarray(lengths) / 16000.0, 30.0)
        rows = self._rows(n_real)
        if rows > n_real:
            audio = (audio.pad_rows(rows - n_real) if is_store else
                     np.pad(audio, ((0, rows - n_real), (0, 0))))
            prompts = list(prompts) + [""] * (rows - n_real)
        if not is_store:
            audio_dev = self._put_data(jnp.asarray(audio, jnp.float32))

        languages = None
        if not sp.english_only and self.tpu.language is None:
            languages = self._detect_languages(
                audio if is_store else audio_dev, params, dims, tok,
                30 * 16000)
        toks, plens, max_p, sot_off = self._prompt_batch(prompts, tok, dims,
                                                         timestamps=True,
                                                         languages=languages)
        cdt = self._cdt
        suppress = self._suppress_ids(tok, timestamps=True)

        def decode_rows(audio_rows, toks_rows, plens_rows, temp: float,
                        replicas: int = 1):
            opts = DecodeOptions(
                max_tokens=self.tpu.max_decode_tokens, temperature=temp,
                eot=sp.eot, suppress_blank=True, blank_token=220,
                suppress_tokens=suppress, compute_dtype=cdt,
                cross_kv_bits=self.tpu.cross_kv_bits,
                self_kv_bits=self.tpu.self_kv_bits,
                pallas_encoder_attn=self.tpu.pallas_encoder_attn,
                no_speech_token=sp.no_speech, sot_from_end=sot_off,
                timestamps=True, timestamp_begin=sp.timestamp_begin,
                replicas=replicas,
                beam=(temp == 0 and replicas > 1))
            rng = None
            if temp > 0:
                self._decode_seed += 1
                rng = jax.random.PRNGKey(self._decode_seed)
            with self._stage_timer.stage("decode_dev"):
                if isinstance(audio_rows, StoreBatch):
                    out = greedy_decode_from_store(
                        params, audio_rows.store.dev,
                        self._put_data(audio_rows.rows),
                        self._put_data(audio_rows.starts),
                        self._put_data(audio_rows.lens),
                        self._put_data(toks_rows), self._put_data(plens_rows),
                        dims, opts, max_p, rng, target_len=30 * 16000,
                        bucket=audio_rows.bucket)
                else:
                    out = greedy_decode_from_audio(
                        params, audio_rows, self._put_data(toks_rows),
                        self._put_data(plens_rows), dims, opts, max_p, rng,
                        target_len=30 * 16000)
                return _unpack_decode(out, opts.max_tokens)

        # Whisper's per-window temperature semantics (its seek loop runs
        # decode_with_fallback for every window) — shared with
        # transcribe_batch (see _decode_with_fallback). The quality gate
        # judges the window text WITHOUT timestamp tokens.
        nst, lpt = self.tpu.no_speech_threshold, self.tpu.logprob_threshold
        audio_all = audio if is_store else audio_dev

        def win_text(tk: np.ndarray, n: int) -> str:
            return tok.decode([t for t in tk[:n].tolist() if t < sp.eot])

        (final_tokens, final_lens, _sum_lp, nsp, final_avg,
         _texts, final_temp) = self._decode_with_fallback(
            decode_rows, audio_all, toks, plens, temperature, n_real,
            text_of=win_text, eot=sp.eot)

        precision = 0.02
        tsb = sp.timestamp_begin
        cond_prev = bool(self.config.condition_on_previous_text)
        results = []
        for i in range(n_real):
            reset = (not cond_prev) or float(final_temp[i]) > 0.5
            seq = final_tokens[i, : final_lens[i]].tolist()
            win = float(window_s[i])
            if nsp[i] > nst and final_avg[i] <= lpt:
                # Silent window: whisper's seek loop `continue`s on the
                # skip branch BEFORE its prompt-reset statement, so a
                # skipped window never resets the rolling prompt — even
                # when its (discarded) decode ran at a hot rung — and
                # contributes no tokens to the rolling context.
                results.append(("", win, False, []))
                continue
            is_ts = [t >= tsb for t in seq]
            single_ending = len(seq) >= 2 and not is_ts[-2] and is_ts[-1] \
                or len(seq) == 1 and is_ts[-1]
            pairs = [j + 1 for j in range(len(seq) - 1)
                     if is_ts[j] and is_ts[j + 1]]
            if pairs and not single_ending:
                last_slice = pairs[-1]
                kept = seq[:last_slice]
                advance = (seq[last_slice - 1] - tsb) * precision
                if advance < 1.0:
                    # A sub-second seek would re-decode essentially the same
                    # window forever; keep ALL text and advance the whole
                    # window instead — nothing dropped, progress guaranteed
                    # (clipping advance up while dropping the tail text
                    # would lose the audio in between).
                    kept = seq
                    advance = win
            else:
                kept = seq
                advance = win
            text = tok.decode([t for t in kept if t < sp.eot])
            results.append((text, float(min(advance, win)), reset,
                            [int(t) for t in kept]))
        return results

    def embed_batch(self, audio: np.ndarray,
                    lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """[B, T] (padded) → [B, D] speaker embeddings."""
        self._ensure()
        import jax.numpy as jnp
        from clearconverse_tpu.models.ecapa import ecapa_embed
        audio = np.asarray(audio, np.float32)
        n_real = audio.shape[0]
        rows = self._rows(n_real)
        if rows > n_real:
            audio = np.pad(audio, ((0, rows - n_real), (0, 0)))
        if lengths is None:
            lengths = np.full(n_real, audio.shape[1], np.int64)
        lengths = np.pad(np.asarray(lengths), (0, rows - n_real),
                         constant_values=1)
        from clearconverse_tpu.models.ecapa import EcapaDims
        dims = self._ecapa_dims or EcapaDims()
        self._place_aux()
        if self._jit_embed is None:
            import jax
            self._jit_embed = jax.jit(
                lambda p, a, l: ecapa_embed(p, a, l, dims))
        with self._stage_timer.stage("embed_dev"):
            return np.asarray(self._jit_embed(
                self._ecapa, self._put_data(audio),
                self._put_data(lengths)))[:n_real]

    def embed_denoised_batch(self, audio: np.ndarray, lengths: np.ndarray,
                             prop_decrease: float,
                             sr: int = 16000) -> np.ndarray:
        """[B, T] RAW padded clips → [B, D] embeddings of their
        spectral-gated, peak-normalized versions — gate + embed as ONE
        device program (profile building previously round-tripped the gated
        audio through the host between two dispatches)."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.audio.denoise import peak_normalize, spectral_gate
        from clearconverse_tpu.models.ecapa import EcapaDims, ecapa_embed

        audio = np.asarray(audio, np.float32)
        n_real = audio.shape[0]
        rows = self._rows(n_real)
        if rows > n_real:
            audio = np.pad(audio, ((0, rows - n_real), (0, 0)))
        lengths = np.pad(np.asarray(lengths), (0, rows - n_real),
                         constant_values=1)
        dims = self._ecapa_dims or EcapaDims()
        self._place_aux()
        if sr not in self._jit_embed_denoised:
            def gate_embed(p, a, l, pd, sr=sr):
                mask = (jnp.arange(a.shape[1])[None, :]
                        < l[:, None]).astype(jnp.float32)
                clean = peak_normalize(spectral_gate(a, sr, pd, mask))
                return ecapa_embed(p, clean, l, dims)
            self._jit_embed_denoised[sr] = jax.jit(gate_embed)
        with self._stage_timer.stage("embed_dev"):
            return np.asarray(self._jit_embed_denoised[sr](
                self._ecapa, self._put_data(audio), self._put_data(lengths),
                jnp.float32(prop_decrease)))[:n_real]

    def segment_frames(self, audio: np.ndarray) -> np.ndarray:
        """[B, T] window chunks → [B, F, 3] per-frame speaker activities."""
        self._ensure()
        import jax.numpy as jnp
        from clearconverse_tpu.models.pyannet import (
            PyannetDims, powerset_to_multilabel, pyannet_forward)
        audio = np.asarray(audio, np.float32)
        n_real = audio.shape[0]
        rows = self._rows(n_real)
        if rows > n_real:
            audio = np.pad(audio, ((0, rows - n_real), (0, 0)))
        dims = self._pyannet_dims or PyannetDims()
        self._place_aux()
        if self._jit_segment is None:
            import jax
            self._jit_segment = jax.jit(
                lambda p, a: powerset_to_multilabel(pyannet_forward(p, a, dims)))
        with self._stage_timer.stage("segment_dev"):
            return np.asarray(self._jit_segment(
                self._pyannet, self._put_data(audio)))[:n_real]

    def _store_embed_args(self, rows, starts, lens):
        rows = np.asarray(rows, np.int32)
        starts = np.asarray(starts, np.int32)
        lens = np.asarray(lens, np.int32)
        n_real = len(rows)
        b = self._rows(n_real)
        if b > n_real:
            rows = np.pad(rows, (0, b - n_real))
            starts = np.pad(starts, (0, b - n_real))
            lens = np.pad(lens, (0, b - n_real), constant_values=1)
        return rows, starts, lens, n_real

    def embed_store(self, store: AudioStore, rows, starts, lens,
                    bucket: int) -> np.ndarray:
        """embed_batch over windows gathered on device from the store."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.models.decoding import gather_windows
        from clearconverse_tpu.models.ecapa import EcapaDims, ecapa_embed
        rows, starts, lens, n_real = self._store_embed_args(rows, starts, lens)
        dims = self._ecapa_dims or EcapaDims()
        self._place_aux()
        if bucket not in self._jit_embed_from_store:
            def f(p, dev, r, s, l, bucket=bucket):
                audio = gather_windows(dev, r, s, l, bucket)
                return ecapa_embed(p, audio, l, dims)
            self._jit_embed_from_store[bucket] = jax.jit(f)
        with self._stage_timer.stage("embed_dev"):
            return np.asarray(self._jit_embed_from_store[bucket](
                self._ecapa, store.dev, self._put_data(rows),
                self._put_data(starts), self._put_data(lens)))[:n_real]

    def embed_frames_store(self, store: AudioStore, rows, fstarts, totals,
                           frame: int, pad: int) -> np.ndarray:
        """embed_batch over NON-CONTIGUOUS clips assembled on device: clip i
        concatenates fixed-length ``frame``-sample windows of store row
        rows[i] at sample offsets fstarts[i, :] (diarization's
        exclusive-frame subsegment clips, pipeline/diarize._carve_subsegments),
        truncated to ``pad`` samples with ``totals[i]`` valid. Replaces the
        per-clip host upload (~190 KB each over the ~25 MB/s tunnel)."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.models.ecapa import EcapaDims, ecapa_embed
        rows = np.asarray(rows, np.int32)
        fstarts = np.asarray(fstarts, np.int32)
        totals = np.asarray(totals, np.int32)
        n_real = len(rows)
        b = self._rows(n_real)
        if b > n_real:
            rows = np.pad(rows, (0, b - n_real))
            fstarts = np.pad(fstarts, ((0, b - n_real), (0, 0)))
            totals = np.pad(totals, (0, b - n_real), constant_values=1)
        dims = self._ecapa_dims or EcapaDims()
        self._place_aux()
        F = fstarts.shape[1]
        key = ("frames", F, int(frame), int(pad))
        if key not in self._jit_embed_from_store:
            def f(p, dev, r, s, tot, F=F, frame=int(frame), pad=int(pad)):
                def one_clip(row, ss):     # ss [F] → [F*frame]
                    return jax.vmap(lambda st: jax.lax.dynamic_slice(
                        dev, (row, st), (1, frame))[0])(ss).reshape(-1)
                clips = jax.vmap(one_clip)(r, s)[:, :pad]
                if clips.shape[1] < pad:   # F under-provisioned by caller
                    clips = jnp.pad(clips, ((0, 0), (0, pad - clips.shape[1])))
                mask = (jnp.arange(pad)[None, :]
                        < tot[:, None]).astype(clips.dtype)
                return ecapa_embed(p, clips * mask, tot, dims)
            self._jit_embed_from_store[key] = jax.jit(f)
        with self._stage_timer.stage("embed_dev"):
            return np.asarray(self._jit_embed_from_store[key](
                self._ecapa, store.dev, self._put_data(rows),
                self._put_data(fstarts), self._put_data(totals)))[:n_real]

    def embed_denoised_store(self, store: AudioStore, rows, starts, lens,
                             prop_decrease: float, bucket: int,
                             with_var: bool = False):
        """gather + spectral gate + peak-norm + embed as ONE device program
        over store windows (profile building). ``with_var`` also returns the
        population variance of each RAW (pre-denoise) window — the profile
        weighting the engine otherwise computes as host np.var(clip), which
        would join a still-in-flight LazyAudio download."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.audio.denoise import peak_normalize, spectral_gate
        from clearconverse_tpu.models.decoding import gather_windows
        from clearconverse_tpu.models.ecapa import EcapaDims, ecapa_embed
        rows, starts, lens, n_real = self._store_embed_args(rows, starts, lens)
        dims = self._ecapa_dims or EcapaDims()
        self._place_aux()
        key = (bucket, store.sr, bool(with_var))
        if key not in self._jit_embed_denoised_store:
            def f(p, dev, r, s, l, pd, bucket=bucket, sr=store.sr,
                  with_var=bool(with_var)):
                audio = gather_windows(dev, r, s, l, bucket)
                mask = (jnp.arange(bucket)[None, :]
                        < l[:, None]).astype(jnp.float32)
                clean = peak_normalize(spectral_gate(audio, sr, pd, mask))
                emb = ecapa_embed(p, clean, l, dims)
                if not with_var:
                    return emb
                lf = l.astype(jnp.float32)
                mean = jnp.sum(audio * mask, axis=-1) / lf
                var = (jnp.sum(((audio - mean[:, None]) * mask) ** 2,
                               axis=-1) / lf)
                return emb, var
            self._jit_embed_denoised_store[key] = jax.jit(f)
        with self._stage_timer.stage("embed_dev"):
            out = self._jit_embed_denoised_store[key](
                self._ecapa, store.dev, self._put_data(rows),
                self._put_data(starts), self._put_data(lens),
                jnp.float32(prop_decrease))
            if with_var:
                emb, var = out
                return np.asarray(emb)[:n_real], np.asarray(var)[:n_real]
            return np.asarray(out)[:n_real]

    def segment_frames_store(self, store: AudioStore, rows, starts,
                             window: int) -> np.ndarray:
        """segment_frames over windows gathered on device from the store:
        [(row, start)] × fixed window length → [B, F, 3] activities. The
        store's zero tail reproduces the host version's zero-padded final
        windows."""
        self._ensure()
        import jax
        import jax.numpy as jnp
        from clearconverse_tpu.models.decoding import gather_windows
        from clearconverse_tpu.models.pyannet import (
            PyannetDims, powerset_to_multilabel, pyannet_forward)
        rows = np.asarray(rows, np.int32)
        starts = np.asarray(starts, np.int32)
        n_real = len(rows)
        b = self._rows(n_real)
        if b > n_real:
            rows = np.pad(rows, (0, b - n_real))
            starts = np.pad(starts, (0, b - n_real))
        dims = self._pyannet_dims or PyannetDims()
        self._place_aux()
        if window not in self._jit_segment_store:
            def seg(p, dev, r, s, window=window):
                lens = jnp.full(r.shape, window, jnp.int32)
                audio = gather_windows(dev, r, s, lens, window)
                return powerset_to_multilabel(pyannet_forward(p, audio, dims))
            self._jit_segment_store[window] = jax.jit(seg)
        with self._stage_timer.stage("segment_dev"):
            return np.asarray(self._jit_segment_store[window](
                self._pyannet, store.dev, self._put_data(rows),
                self._put_data(starts)))[:n_real]

    @property
    def frame_hop_seconds(self) -> float:
        from clearconverse_tpu.models.pyannet import PyannetDims
        return (self._pyannet_dims or PyannetDims()).frame_hop_seconds

    def separate_batch(self, audio: np.ndarray) -> np.ndarray:
        """[B, T] mixtures → [B, T, 2] separated sources."""
        self._ensure()
        import jax.numpy as jnp
        from clearconverse_tpu.models.resepformer import (
            SepformerDims, sepformer_separate)
        audio = np.asarray(audio, np.float32)
        n_real = audio.shape[0]
        rows = self._rows(n_real)
        if rows > n_real:
            audio = np.pad(audio, ((0, rows - n_real), (0, 0)))
        dims = self._sepformer_dims or SepformerDims()
        self._place_aux()
        if self._jit_separate is None:
            import jax
            self._jit_separate = jax.jit(
                lambda p, a: sepformer_separate(p, a, dims))
        with self._stage_timer.stage("separate_dev"):
            return np.asarray(self._jit_separate(
                self._sepformer, self._put_data(audio)))[:n_real]
