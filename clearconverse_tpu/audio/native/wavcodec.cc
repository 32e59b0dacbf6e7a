// Native host-side audio codec for ClearConverse-TPU.
//
// Role: the hot host path between container decode and the TPU — the
// reference delegates this to torchaudio's C++ backend (back/api.py:820)
// and ffmpeg (back/api.py:544). Python orchestration stays in
// audio/wav.py; this library does the byte crunching:
//   * PCM decode: s16/s24/s32/u8 + IEEE f32/f64 → planar float32
//   * PCM encode: float32 → s16le with clipping
//   * mono mixdown and peak normalization in one pass
//
// C ABI only (loaded via ctypes — pybind11 is not vendored). All functions
// return 0 on success, negative on error. Buffers are caller-allocated.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Interleaved s16le → planar float32 [channels][frames].
int decode_s16(const uint8_t* in, int64_t n_bytes, int channels,
               float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const int16_t* samples = reinterpret_cast<const int16_t*>(in);
  const int64_t frames = std::min<int64_t>(n_bytes / 2 / channels, out_frames);
  for (int c = 0; c < channels; ++c) {
    float* dst = out + c * out_frames;
    for (int64_t f = 0; f < frames; ++f) {
      dst[f] = samples[f * channels + c] * (1.0f / 32768.0f);
    }
  }
  return 0;
}

// Interleaved s24le (3 bytes) → planar float32.
int decode_s24(const uint8_t* in, int64_t n_bytes, int channels,
               float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const int64_t frames = std::min<int64_t>(n_bytes / 3 / channels, out_frames);
  for (int64_t f = 0; f < frames; ++f) {
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = in + (f * channels + c) * 3;
      int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
      if (v & 0x800000) v -= 0x1000000;
      out[c * out_frames + f] = v * (1.0f / 8388608.0f);
    }
  }
  return 0;
}

// Interleaved s32le → planar float32.
int decode_s32(const uint8_t* in, int64_t n_bytes, int channels,
               float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const int32_t* samples = reinterpret_cast<const int32_t*>(in);
  const int64_t frames = std::min<int64_t>(n_bytes / 4 / channels, out_frames);
  for (int c = 0; c < channels; ++c) {
    float* dst = out + c * out_frames;
    for (int64_t f = 0; f < frames; ++f) {
      dst[f] = samples[f * channels + c] * (1.0f / 2147483648.0f);
    }
  }
  return 0;
}

// Interleaved u8 → planar float32.
int decode_u8(const uint8_t* in, int64_t n_bytes, int channels,
              float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const int64_t frames = std::min<int64_t>(n_bytes / channels, out_frames);
  for (int c = 0; c < channels; ++c) {
    float* dst = out + c * out_frames;
    for (int64_t f = 0; f < frames; ++f) {
      dst[f] = (in[f * channels + c] - 128.0f) * (1.0f / 128.0f);
    }
  }
  return 0;
}

// Interleaved float32 → planar float32.
int decode_f32(const uint8_t* in, int64_t n_bytes, int channels,
               float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const float* samples = reinterpret_cast<const float*>(in);
  const int64_t frames = std::min<int64_t>(n_bytes / 4 / channels, out_frames);
  for (int c = 0; c < channels; ++c) {
    float* dst = out + c * out_frames;
    for (int64_t f = 0; f < frames; ++f) {
      dst[f] = samples[f * channels + c];
    }
  }
  return 0;
}

// Interleaved float64 → planar float32.
int decode_f64(const uint8_t* in, int64_t n_bytes, int channels,
               float* out, int64_t out_frames) {
  if (channels <= 0) return -1;
  const double* samples = reinterpret_cast<const double*>(in);
  const int64_t frames = std::min<int64_t>(n_bytes / 8 / channels, out_frames);
  for (int c = 0; c < channels; ++c) {
    float* dst = out + c * out_frames;
    for (int64_t f = 0; f < frames; ++f) {
      dst[f] = static_cast<float>(samples[f * channels + c]);
    }
  }
  return 0;
}

// Planar float32 [channels][frames] → interleaved s16le with clipping.
int encode_s16(const float* in, int channels, int64_t frames, uint8_t* out) {
  if (channels <= 0) return -1;
  int16_t* dst = reinterpret_cast<int16_t*>(out);
  for (int64_t f = 0; f < frames; ++f) {
    for (int c = 0; c < channels; ++c) {
      float v = std::round(in[c * frames + f] * 32767.0f);
      v = std::min(32767.0f, std::max(-32768.0f, v));
      dst[f * channels + c] = static_cast<int16_t>(v);
    }
  }
  return 0;
}

// Planar [channels][frames] → mono mean [frames].
int mono_mix(const float* in, int channels, int64_t frames, float* out) {
  if (channels <= 0) return -1;
  const float scale = 1.0f / channels;
  for (int64_t f = 0; f < frames; ++f) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) acc += in[c * frames + f];
    out[f] = acc * scale;
  }
  return 0;
}

// In-place peak normalization: x /= (max|x| + eps). Returns the peak.
float peak_normalize(float* x, int64_t n, float eps) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) peak = std::max(peak, std::fabs(x[i]));
  const float inv = 1.0f / (peak + eps);
  for (int64_t i = 0; i < n; ++i) x[i] *= inv;
  return peak;
}

// ---- Lossless delta wire (audio/pack.py format) -------------------------
//
// The packed host->device wire needs an exact max-|delta| scan and a
// bit-packing pass over the whole int16 batch; numpy does them in ~0.3-0.9 s
// on this image's ONE host core (temporaries + strided slicing), which
// would eat the wire saving. Single-pass C does both in ~30-50 ms.

// Max |first delta| (slots >= 2) and |second delta| per batch; deltas never
// cross row boundaries. Rows are contiguous [k][t].
int delta_scan(const int16_t* q, int64_t k, int64_t t,
               int32_t* max_d1, int32_t* max_d2) {
  if (t < 2) return -1;
  int32_t m1 = 0, m2 = 0;
  for (int64_t r = 0; r < k; ++r) {
    const int16_t* x = q + r * t;
    int32_t prev_d = (int32_t)x[1] - x[0];
    for (int64_t i = 2; i < t; ++i) {
      const int32_t d = (int32_t)x[i] - x[i - 1];
      const int32_t a1 = d < 0 ? -d : d;
      const int32_t d2 = d - prev_d;
      const int32_t a2 = d2 < 0 ? -d2 : d2;
      if (a1 > m1) m1 = a1;
      if (a2 > m2) m2 = a2;
      prev_d = d;
    }
  }
  *max_d1 = m1;
  *max_d2 = m2;
  return 0;
}

// Pack order-1/2 deltas (slots >= 2; slots 0/1 pack as zero) into a
// little-endian width-bit stream, one stream per row: out is
// [k][t*width/8] bytes; x0/e1 receive each row's sample 0 and slot-1
// delta. Byte layout matches audio/pack.pack_bits_np exactly.
int delta_pack(const int16_t* q, int64_t k, int64_t t, int order, int width,
               uint8_t* out, int32_t* x0, int32_t* e1) {
  if (t < 2 || t % 8 || width < 2 || width > 15) return -1;
  if (order != 1 && order != 2) return -1;
  const uint32_t half = 1u << (width - 1);
  const int64_t row_bytes = t * width / 8;
  for (int64_t r = 0; r < k; ++r) {
    const int16_t* x = q + r * t;
    uint8_t* o = out + r * row_bytes;
    x0[r] = x[0];
    e1[r] = (int32_t)x[1] - x[0];
    uint64_t acc = half | ((uint64_t)half << width);  // slots 0 and 1 = 0
    int nbits = 2 * width;
    int32_t prev_d = e1[r];
    for (int64_t i = 2; i < t; ++i) {
      const int32_t d = (int32_t)x[i] - x[i - 1];
      const uint32_t v = (uint32_t)((order == 1 ? d : d - prev_d) + (int32_t)half);
      prev_d = d;
      acc |= (uint64_t)v << nbits;
      nbits += width;
      while (nbits >= 8) {
        *o++ = (uint8_t)(acc & 0xff);
        acc >>= 8;
        nbits -= 8;
      }
    }
    while (nbits > 0) {
      *o++ = (uint8_t)(acc & 0xff);
      acc >>= 8;
      nbits -= 8;
    }
  }
  return 0;
}

}  // extern "C"
