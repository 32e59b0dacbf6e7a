"""Exact-output tests for the pure segment algebra (reference parity:
back/api.py:294-343, 893-921, 961-1050, 1347-1472)."""

import numpy as np
import pytest

from clearconverse_tpu.pipeline.segments import (
    choose_prompt, detect_overlap_regions, extract_segment,
    find_segment_overlaps, is_rapid_exchange, map_speakers, merge_segments,
    merge_window_labels, refine_segment_with_vad, select_profile_segments,
    window_hysteresis, DEFAULT_PROMPT, RAPID_PROMPT)
from clearconverse_tpu.pipeline.clustering import (
    ahc_cluster, binarize, cluster_speakers)


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
