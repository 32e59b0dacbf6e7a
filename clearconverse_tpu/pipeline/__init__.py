"""Pipeline: segment algebra, diarization, profiles, overlap handling, and
the batched transcription engine.

The host/device split (SURVEY.md §7): all interval logic, clustering and
control flow run on host over plain floats; every model evaluation (VAD/
segmentation frames, speaker embeddings, separation, ASR) is gathered into a
small number of large fixed-shape device programs. The reference instead
loops models segment-by-segment (back/api.py:1378-1530).
"""

from clearconverse_tpu.pipeline.segments import (  # noqa: F401
    AudioSegment, Interval, merge_segments, refine_segment_with_vad,
    find_segment_overlaps, detect_overlap_regions, map_speakers,
    select_profile_segments, merge_window_labels)
