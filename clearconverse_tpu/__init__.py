"""ClearConverse-TPU: a TPU-native speaker-diarized transcription framework.

A from-scratch rebuild of the capabilities of Yotsuei/ClearConverse
(reference at /root/reference): overlapping-speech transcription with
speaker diarization, speaker-profile matching, overlap source separation
and Whisper ASR — re-architected as batched JAX/XLA/Pallas programs over
TPU device meshes instead of the reference's sequential per-segment
PyTorch calls (reference back/api.py:1378-1530).

Layering (bottom-up):
  audio/     WAV codec, polyphase resampling, STFT/log-mel, spectral-gate denoise
  ops/       XLA + Pallas kernels shared by the model zoo
  models/    Whisper small.en, ECAPA-TDNN, PyanNet segmentation, RE-SepFormer
  parallel/  device mesh, sharding rules, batched device-program executor
  pipeline/  segment algebra, clustering, profiles, overlap logic, engine
  train/     fine-tuning (the reference only consumes ft checkpoints; we produce them)
  serve/     HTTP/WS API byte-compatible with the reference (back/api.py:1555-2785)
  eval/      computed WER/DER/RTFx replacing the reference's manual harness (back/test.py)
"""

__version__ = "0.1.0"

from clearconverse_tpu.config import Config, load_environment  # noqa: F401
