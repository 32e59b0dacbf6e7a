"""Evaluation: computed WER / DER / RTFx replacing the reference's manual
scoring harness (back/test.py — its evaluation.csv ships blank 1-5 columns
for HUMAN scoring, test.py:1192-1228; SURVEY.md §4). Here the same sweep
produces numbers."""

from clearconverse_tpu.eval.wer import word_error_rate, normalize_text  # noqa: F401
from clearconverse_tpu.eval.der import diarization_error_rate  # noqa: F401
