"""TPU-native model zoo.

Pure-JAX reimplementations of the four model families the reference drives
through torch (SURVEY.md §2.4):

  whisper.py / decoding.py   Whisper ASR encoder-decoder + KV-cached batched
                             greedy decode (reference: openai-whisper via
                             back/api.py:657-703, 1282-1296)
  ecapa.py                   ECAPA-TDNN speaker embedder (reference:
                             pyannote/embedding, back/api.py:770-774)
  pyannet.py                 PyanNet segmentation/VAD (reference:
                             pyannote VAD + diarization pipelines,
                             back/api.py:776-792)
  resepformer.py             RE-SepFormer 2-source separation (reference:
                             speechbrain resepformer-wsj02mix,
                             back/api.py:705-764)
  convert.py                 torch-checkpoint → param-pytree converters,
                             including the reference's fine-tune overlay
                             formats (back/api.py:671-692, 727-746)
  tokenizer.py               GPT-2 BPE tokenizer (whisper vocab layouts)

Models are plain functions over param pytrees (not framework Modules): the
pytree layout mirrors each source checkpoint's state-dict naming so
conversion is mechanical, and sharding annotations attach directly.
"""
