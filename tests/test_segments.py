"""Exact-output tests for the pure segment algebra (reference parity:
back/api.py:294-343, 893-921, 961-1050, 1347-1472)."""

import numpy as np
import pytest

from clearconverse_tpu.pipeline.segments import (
    choose_prompt, detect_overlap_regions, extract_segment,
    extract_segment_lazy, find_segment_overlaps, is_rapid_exchange,
    map_speakers, merge_segments, merge_window_labels,
    refine_segment_with_vad, select_profile_segments, window_hysteresis,
    DEFAULT_PROMPT, RAPID_PROMPT)
from clearconverse_tpu.pipeline.clustering import (
    ahc_cluster, binarize, cluster_speakers, cosine_distance_matrix)


# ------------------------------------------------------------- merge

def test_merge_same_speaker_within_gap():
    segs = [(0.0, 1.0, "A"), (1.3, 2.0, "A"), (2.8, 3.5, "A")]
    assert merge_segments(segs, 0.5) == [(0.0, 2.0, "A"), (2.8, 3.5, "A")]


def test_merge_respects_speaker_change():
    segs = [(0.0, 1.0, "A"), (1.1, 2.0, "B"), (2.05, 3.0, "A")]
    assert merge_segments(segs, 0.5) == segs


def test_merge_sorts_input():
    segs = [(2.0, 3.0, "A"), (0.0, 1.8, "A")]
    assert merge_segments(segs, 0.5) == [(0.0, 3.0, "A")]


def test_merge_empty():
    assert merge_segments([], 0.5) == []


# ------------------------------------------------------------- VAD refine

def test_vad_refine_clips_to_speech_span():
    vad = [(0.5, 1.5), (2.0, 3.0)]
    assert refine_segment_with_vad((0.0, 2.5), vad) == (0.5, 2.5)


def test_vad_refine_none_when_silent():
    assert refine_segment_with_vad((3.5, 4.0), [(0.0, 1.0)]) is None


def test_vad_refine_span_includes_interior_gap():
    # Reference semantics: min(start), max(end) of intersections — the gap
    # between VAD islands stays inside the refined segment.
    vad = [(0.0, 1.0), (2.0, 3.0)]
    assert refine_segment_with_vad((0.5, 2.5), vad) == (0.5, 2.5)


# ------------------------------------------------------------- overlaps

def test_overlap_sweep_basic():
    segs = [(0.0, 2.0, "A"), (1.0, 3.0, "B")]
    assert find_segment_overlaps(segs) == {(1.0, 2.0): ["A", "B"]}


def test_overlap_sweep_disjoint():
    segs = [(0.0, 1.0, "A"), (1.5, 2.0, "B")]
    assert find_segment_overlaps(segs) == {}


def test_overlap_three_speakers():
    segs = [(0.0, 4.0, "A"), (1.0, 3.0, "B"), (2.0, 5.0, "C")]
    got = find_segment_overlaps(segs)
    # Regions close as each speaker exits.
    assert (1.0, 3.0) in got and sorted(got[(1.0, 3.0)]) == ["A", "B", "C"]


def test_detect_overlap_regions_duration_filter():
    segs = [(0.0, 2.0, "A"), (1.7, 3.0, "B"), (5.0, 8.0, "A"), (6.0, 7.5, "B")]
    regions = detect_overlap_regions(segs, min_duration=0.5)
    assert regions == [(6.0, 7.5, ["A", "B"])]


# ------------------------------------------------------------- mapping

def test_map_speakers_top_two():
    segs = [(0, 1, "s1"), (1, 2, "s1"), (2, 3, "s2"), (4, 5, "s3")]
    m = map_speakers(segs)
    assert m["s1"] == "SPEAKER_A" and m["s2"] == "SPEAKER_B" and "s3" not in m


def test_map_speakers_single():
    assert map_speakers([(0, 1, "x")]) == {"x": "SPEAKER_A"}


def test_map_speakers_empty_raises():
    with pytest.raises(ValueError):
        map_speakers([])


# ------------------------------------------------------------- profiles

def test_select_profile_segments_budget_split():
    # 8 segments for A, budget 4 → 2 longest + stride over the rest.
    segs = [(float(i), float(i) + 1.0 + 0.1 * i, "A") for i in range(8)]
    out = select_profile_segments(segs, max_embedding_segments=4)
    sel = out["A"]
    assert len(sel) == 4
    # The two longest (last two by construction) must be present.
    assert (7.0, 8.7) in sel and (6.0, 7.6) in sel


def test_select_profile_segments_min_duration():
    segs = [(0.0, 0.5, "A"), (1.0, 2.0, "A")]
    out = select_profile_segments(segs, max_embedding_segments=10)
    assert out["A"] == [(1.0, 2.0)]


# ------------------------------------------------------------- windows

def test_window_hysteresis_keeps_prev_speaker():
    sims = [("B", 0.70), ("A", 0.60)]  # gap 0.10 < 0.15, runner-up = prev
    spk, conf = window_hysteresis(sims, prev_speaker="A")
    assert spk == "A" and conf == 0.60


def test_window_hysteresis_clear_winner():
    sims = [("B", 0.90), ("A", 0.50)]
    spk, _ = window_hysteresis(sims, prev_speaker="A")
    assert spk == "B"


def test_merge_window_labels_merges_and_filters():
    windows = [(0.0, 0.8, "A", 0.9), (0.4, 1.2, "A", 0.8),
               (0.8, 1.6, "B", 0.7), (1.2, 2.0, "B", 0.9)]
    out = merge_window_labels(windows, 0.0, 2.0, step=0.4)
    assert out == [(0.0, 1.2, "A"), (0.8, 2.0, "B")]


def test_merge_window_labels_empty():
    assert merge_window_labels([], 1.0, 3.0, 0.4) == [(1.0, 3.0, "UNKNOWN")]


# ------------------------------------------------------------- context

def test_rapid_exchange_rules():
    assert is_rapid_exchange("A", "B", prev_end=1.0, start=1.3)
    assert not is_rapid_exchange("A", "A", 1.0, 1.3)
    assert not is_rapid_exchange("A", "B", 1.0, 1.9)
    assert not is_rapid_exchange(None, "B", 0.0, 0.2)
    assert not is_rapid_exchange("A", "B", 1.0, 1.0)  # zero gap excluded


def test_choose_prompt_rules():
    assert choose_prompt("A", None, 0, 5.0, "", False) == DEFAULT_PROMPT
    assert choose_prompt("A", "A", 4.9, 5.0, "so far", False) == "so far "
    assert choose_prompt("B", "A", 4.9, 5.0, "so far", True) == RAPID_PROMPT


# ------------------------------------------------------------- extraction

def test_extract_segment_clamps():
    sr = 100
    audio = np.arange(500, dtype=np.float32)
    np.testing.assert_array_equal(extract_segment(audio, -1.0, 2.0, sr),
                                  audio[:200])
    np.testing.assert_array_equal(extract_segment(audio, 4.0, 99.0, sr),
                                  audio[400:])
    assert extract_segment(audio, 3.0, 2.0, sr).shape == (100,)
    assert (extract_segment(audio, 3.0, 2.0, sr) == 0).all()


def test_extract_segment_lazy_matches_eager():
    """The lazy variant (LazyAudio-safe, used on store-backed engine paths)
    has identical clamping, length, and bytes — including the 100-zeros
    inverted-range quirk — and does not read bytes until accessed."""
    from clearconverse_tpu.pipeline.segments import extract_segment_lazy

    sr = 100
    audio = np.arange(500, dtype=np.float32)

    class Counting:
        """len() is free; any byte access increments reads."""
        def __init__(self, a):
            self.a, self.reads = a, 0
        def __len__(self):
            return len(self.a)
        def __getitem__(self, k):
            self.reads += 1
            return self.a[k]

    for s, e in [(-1.0, 2.0), (4.0, 99.0), (1.0, 1.5), (3.0, 2.0)]:
        src = Counting(audio)
        lazy = extract_segment_lazy(src, s, e, sr)
        eager = extract_segment(audio, s, e, sr)
        assert len(lazy) == len(eager)
        assert src.reads == 0                       # len cost no bytes
        np.testing.assert_array_equal(np.asarray(lazy), eager)


def test_split_long_short_clip_is_identity():
    """≤30 s clips return unsliced (keeps LazyClips unread); longer ones
    split as before."""
    from clearconverse_tpu.pipeline.batching import split_long

    sr = 10
    short = np.arange(200, dtype=np.float32)
    out = split_long(short, sr, 30.0)
    assert len(out) == 1 and out[0] is short
    longer = np.arange(650, dtype=np.float32)
    out = split_long(longer, sr, 30.0)
    assert [len(c) for c in out] == [300, 300, 50]
    np.testing.assert_array_equal(np.concatenate(out), longer)


# ------------------------------------------------------------- clustering

def test_binarize_hysteresis():
    scores = np.array([0.1, 0.9, 0.9, 0.6, 0.2, 0.1, 0.9, 0.9, 0.1])
    out = binarize(scores, frame_hop=0.1, onset=0.8, offset=0.3)
    assert out == [(pytest.approx(0.1), pytest.approx(0.4)),
                   (pytest.approx(0.6), pytest.approx(0.8))]


def test_binarize_fill_and_min_duration():
    scores = np.array([0.9] * 5 + [0.0] + [0.9] * 5 + [0.0] * 5 + [0.9])
    out = binarize(scores, 0.1, 0.5, 0.5, min_duration_on=0.3,
                   min_duration_off=0.2)
    assert len(out) == 1
    assert out[0] == (pytest.approx(0.0), pytest.approx(1.1))


def test_ahc_two_clear_clusters(rng):
    a = rng.standard_normal(16) + 5
    b = rng.standard_normal(16) - 5
    embs = np.stack([a + 0.01 * rng.standard_normal(16) for _ in range(5)]
                    + [b + 0.01 * rng.standard_normal(16) for _ in range(5)])
    labels = ahc_cluster(embs, threshold=0.5)
    assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
    assert labels[0] != labels[5]
    assert labels[0] == 0  # first-appearance ordering


def test_cluster_speakers_max_constraint(rng):
    embs = rng.standard_normal((6, 8))  # no real structure
    labels = cluster_speakers(embs, threshold=0.0, max_speakers=2)
    assert labels.max() + 1 <= 2


def test_cluster_speakers_min_constraint(rng):
    a = rng.standard_normal(8)
    embs = np.stack([a + 1e-4 * rng.standard_normal(8) for _ in range(4)])
    labels = ahc_cluster(embs, threshold=0.5, min_clusters=1)
    assert labels.max() + 1 == 1


def test_binarize_vectorized_equals_reference_loop():
    """The vectorized hysteresis must match the per-frame reference loop
    exactly, across threshold configurations incl. onset == offset and the
    state-dependent onset < offset fallback."""
    import numpy as np
    from clearconverse_tpu.pipeline.clustering import _binarize_loop, binarize

    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(0, 400))
        scores = rng.random(n).astype(np.float32)
        onset = float(rng.random())
        offset = float(rng.random())
        fhop = float(rng.uniform(0.005, 0.05))
        # exercise exact-threshold frames too
        if n and trial % 3 == 0:
            scores[:: 5] = np.float32(onset)
        got = binarize(scores, fhop, onset, offset)
        want = _binarize_loop(scores, fhop, onset, offset)
        assert got == want, (trial, onset, offset)
        # and with the min-duration post-passes
        got2 = binarize(scores, fhop, onset, offset,
                        min_duration_on=0.05, min_duration_off=0.03)
        base = _binarize_loop(scores, fhop, onset, offset)
        if base:
            filled = [base[0]]
            for s, e in base[1:]:
                ps, pe = filled[-1]
                if s - pe < 0.03:
                    filled[-1] = (ps, e)
                else:
                    filled.append((s, e))
            base = filled
        base = [(s, e) for s, e in base if e - s >= 0.05]
        assert got2 == base


# ------------------------------------------- diarizer numeric regressions

def test_stitch_window_placement_does_not_drift():
    """Window frame offsets round PER WINDOW: at the production frame hop
    (270/16000 s) HOP_S/fhop = 296.296, so a rounded-once integer stride
    drifts 5 ms/window — 0.6 s of cumulative timestamp error at 10 min."""
    from clearconverse_tpu.pipeline.diarize import HOP_S, WINDOW_S, _stitch

    sr, fhop = 16000, 270.0 / 16000.0
    w = 121                                    # 10 minutes of windows
    fw = int(WINDOW_S / fhop)
    probs = np.tile(np.arange(w, dtype=np.float32)[:, None, None],
                    (1, fw, 1))                # window i scores == i
    n_samples = int((HOP_S * (w - 1) + WINDOW_S) * sr)
    act = _stitch(probs, n_samples, sr, fhop)
    # The frame at the true start of the LAST window must already include
    # its score (drifted placement would still show window w-2 only).
    lo_true = round((w - 1) * HOP_S / fhop)
    assert act[lo_true, 0] >= w - 1.5          # mean of windows w-2, w-1
    # Frames past the second-to-last window's extent are the last window
    # alone.
    end_prev = round((w - 2) * HOP_S / fhop) + fw
    assert float(act[end_prev, 0]) == w - 1


def test_carve_exclusive_uses_configured_onset():
    """A frame where another slot is above the CONFIGURED onset is not
    'exclusively active' — the old hard-coded 0.5 let overlapped frames
    into the clean clustering clips when deployments lowered the onset."""
    from clearconverse_tpu.pipeline.diarize import _carve_subsegments

    sr, fhop = 16000, 270.0 / 16000.0
    frames = 80                                # ~1.35 s
    act = np.zeros((frames, 2), np.float32)
    act[:, 0] = 0.9                            # slot 0 clearly active
    act[:, 1] = 0.45                           # slot 1 above onset=0.3
    audio = np.zeros(int(frames * fhop * sr) + sr, np.float32)
    _, slots, clean, descs = _carve_subsegments(audio, act, fhop, sr,
                                                onset=0.3, offset=0.2)
    i = slots.index(0)
    assert clean[i] is False                   # overlapped ⇒ not clean
    assert descs[i][0] == "slice"
    # Same frames with slot 1 quiet ⇒ clean again.
    act[:, 1] = 0.05
    _, slots2, clean2, _ = _carve_subsegments(audio, act, fhop, sr,
                                              onset=0.3, offset=0.2)
    assert clean2[slots2.index(0)] is True


def test_carve_region_end_frame_not_truncated():
    """binarize returns frame-aligned times; int(e/fhop) truncates to
    frame-1 for ~14% of indices at the production hop (float residue),
    silently dropping the region's last active frame from the exclusive
    clip."""
    from clearconverse_tpu.pipeline.diarize import _carve_subsegments

    sr, fhop = 16000, 270.0 / 16000.0
    # region [100, 125) — 125*fhop/fhop = 124.99999999999999
    assert int((125 * fhop) / fhop) == 124     # the trap this guards
    act = np.zeros((200, 2), np.float32)
    act[100:125, 0] = 0.9
    audio = np.zeros(int(200 * fhop * sr) + sr, np.float32)
    _, slots, clean, descs = _carve_subsegments(audio, act, fhop, sr,
                                                onset=0.5, offset=0.5)
    i = slots.index(0)
    kind, fs, fe = descs[i]
    assert kind == "frames" and len(fs) == 25  # all 25 frames, incl. last


def test_extract_segment_lazy_multichannel_duration():
    """extract_segment supports [C, T] via audio[..., i0:i1]; the lazy
    variant must match it exactly on eager arrays — a len(audio)-based
    duration read the CHANNEL count and hit the 100-zeros quirk."""
    audio = np.random.default_rng(0).standard_normal((2, 32000)) \
        .astype(np.float32)
    eager = extract_segment(audio, 0.5, 1.5, 16000)
    lazy = np.asarray(extract_segment_lazy(audio, 0.5, 1.5, 16000))
    np.testing.assert_array_equal(lazy, eager)
    assert eager.shape[-1] == 32000       # 2 channels x 1 s, flattened


def test_ahc_cluster_matches_naive_reference():
    """The cached-minima AHC (O(n^2)) is label-identical to a naive
    re-slicing average-linkage implementation across random cases."""
    def naive(emb, threshold, min_clusters, max_clusters):
        n = len(emb)
        dist = cosine_distance_matrix(emb)
        np.fill_diagonal(dist, np.inf)
        members = [[i] for i in range(n)]
        active = list(range(n))
        cd = dist.copy()
        while len(active) > max(min_clusters, 1):
            sub = cd[np.ix_(active, active)]
            k = np.argmin(sub)
            i_loc, j_loc = divmod(int(k), len(active))
            d = sub[i_loc, j_loc]
            over = max_clusters is not None and len(active) > max_clusters
            if d > threshold and not over:
                break
            a, b = sorted((active[i_loc], active[j_loc]))
            na, nb = len(members[a]), len(members[b])
            for c in active:
                if c not in (a, b):
                    cd[a, c] = cd[c, a] = (na * cd[a, c]
                                           + nb * cd[b, c]) / (na + nb)
            members[a].extend(members[b])
            active.remove(b)
        labels = np.zeros(n, np.int32)
        order = sorted(active, key=lambda c: min(members[c]))
        for new_id, c in enumerate(order):
            for idx in members[c]:
                labels[idx] = new_id
        return labels

    rng = np.random.default_rng(7)
    for _ in range(60):
        n = int(rng.integers(2, 30))
        k = int(rng.integers(1, 4))
        emb = (np.repeat(rng.standard_normal((k, 8)), n, axis=0)[:n]
               + rng.standard_normal((n, 8)) * 0.2)
        th = float(rng.uniform(0.2, 1.2))
        mx = None if rng.random() < 0.5 else int(rng.integers(1, 4))
        got = ahc_cluster(emb, th, 1, mx)
        want = naive(emb, th, 1, mx)
        np.testing.assert_array_equal(got, want)
