"""Diarization error rate with optimal speaker mapping.

DER = (missed speech + false alarm + speaker confusion) / total reference
speech time, computed over a timeline discretized at ``resolution`` seconds
with an optional no-score collar around reference boundaries (pyannote/NIST
convention). Optimal reference↔hypothesis speaker mapping by exhaustive
permutation for small speaker counts, greedy otherwise.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np

LabeledSegment = Tuple[float, float, str]


def _rasterize(segments: Sequence[LabeledSegment], speakers: List[str],
               n_frames: int, resolution: float) -> np.ndarray:
    grid = np.zeros((n_frames, len(speakers)), bool)
    index = {s: i for i, s in enumerate(speakers)}
    for start, end, spk in segments:
        lo = int(round(start / resolution))
        hi = min(int(round(end / resolution)), n_frames)
        grid[lo:hi, index[spk]] = True
    return grid


def diarization_error_rate(reference: Sequence[LabeledSegment],
                           hypothesis: Sequence[LabeledSegment],
                           collar: float = 0.25,
                           resolution: float = 0.01) -> Dict[str, float]:
    """Returns {"der", "missed", "false_alarm", "confusion", "total"} where
    the components are in seconds and "der" is their sum over total
    reference speech time."""
    ref_spks = sorted({s for _, _, s in reference})
    hyp_spks = sorted({s for _, _, s in hypothesis})
    end = max([e for _, e, _ in list(reference) + list(hypothesis)] + [0.0])
    n = int(round(end / resolution)) + 1
    R = _rasterize(reference, ref_spks, n, resolution)
    H = _rasterize(hypothesis, hyp_spks, n, resolution)

    # No-score collar around reference segment boundaries.
    score_mask = np.ones(n, bool)
    if collar > 0:
        c = int(round(collar / resolution))
        for start, e_, _ in reference:
            for t in (start, e_):
                f = int(round(t / resolution))
                score_mask[max(f - c, 0): f + c] = False
    R = R[score_mask]
    H = H[score_mask]

    # Optimal speaker mapping (maximize overlap time).
    overlap = R.astype(np.int64).T @ H.astype(np.int64)   # [n_ref, n_hyp]
    n_ref, n_hyp = overlap.shape
    best_map: Dict[int, int] = {}
    if n_ref and n_hyp:
        if max(n_ref, n_hyp) <= 8:
            # Exhaustive assignment over the LARGER side so every speaker
            # on both sides is a mapping candidate (permuting hyp columns
            # against refs 0..min-1 could never map later reference
            # speakers, inflating confusion whenever n_ref > n_hyp).
            best_score = -1
            if n_ref <= n_hyp:
                for perm in itertools.permutations(range(n_hyp), n_ref):
                    score = sum(overlap[i, p] for i, p in enumerate(perm))
                    if score > best_score:
                        best_score = score
                        best_map = dict(enumerate(perm))
            else:
                for perm in itertools.permutations(range(n_ref), n_hyp):
                    score = sum(overlap[p, j] for j, p in enumerate(perm))
                    if score > best_score:
                        best_score = score
                        best_map = {p: j for j, p in enumerate(perm)}
        else:  # greedy fallback
            pairs = sorted(((overlap[i, j], i, j) for i in range(n_ref)
                            for j in range(n_hyp)), reverse=True)
            used_i, used_j = set(), set()
            for val, i, j in pairs:
                if i not in used_i and j not in used_j and val > 0:
                    best_map[i] = j
                    used_i.add(i)
                    used_j.add(j)

    mapped = np.zeros_like(R)
    for i, j in best_map.items():
        mapped[:, i] = H[:, j]

    ref_count = R.sum(1)
    hyp_count = H.sum(1)
    total = float(ref_count.sum()) * resolution
    missed = float(np.maximum(ref_count - hyp_count, 0).sum()) * resolution
    false_alarm = float(np.maximum(hyp_count - ref_count, 0).sum()) * resolution
    # Confusion: reference speech attributed to the wrong (mapped) speaker,
    # excluding time already counted as missed.
    correct = float((R & mapped).sum()) * resolution
    confusion = max(total - missed - correct, 0.0)

    errors = missed + false_alarm + confusion
    if total > 0:
        der = errors / total
    else:
        # No scored reference speech: DER is undefined (NIST divides by
        # zero). 0.0 only when the hypothesis is also silent; otherwise
        # +inf — reporting hallucinated speech on a silent reference as a
        # perfect 0.0 would rank pure false alarm as the best config.
        der = 0.0 if errors == 0 else float("inf")
    return {"der": der, "missed": missed, "false_alarm": false_alarm,
            "confusion": confusion, "total": total}
