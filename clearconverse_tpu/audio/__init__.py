"""Audio I/O + DSP frontend.

Replaces the reference's torchaudio/ffmpeg/noisereduce stack
(back/api.py:530-568, 799-838) with:
  * a first-party WAV codec (pure-NumPy with optional C++ fast path),
  * a windowed-sinc polyphase resampler (same math as torchaudio's
    ``Resample``) implemented as an XLA conv,
  * a Whisper-exact STFT/log-mel frontend (XLA matmul form, Pallas kernel
    on TPU),
  * stationary spectral-gating noise reduction (noisereduce's algorithm)
    as a batched jnp program.

Fixed-shape discipline: everything past decode operates on ``[B, T]``
padded buffers with explicit length masks.
"""

from clearconverse_tpu.audio.wav import read_wav, write_wav  # noqa: F401
from clearconverse_tpu.audio.resample import resample  # noqa: F401
from clearconverse_tpu.audio.mel import log_mel_spectrogram  # noqa: F401
from clearconverse_tpu.audio.denoise import spectral_gate  # noqa: F401
from clearconverse_tpu.audio.decode import load_audio, ensure_wav_format  # noqa: F401
