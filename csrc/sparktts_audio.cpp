// Native host-side audio runtime: WAV I/O + polyphase resampler + volume
// normalization.
//
// Role parity: the reference's host audio path runs on two C libraries —
// libsndfile (via soundfile) for WAV I/O and soxr for VHQ resampling
// (reference sparktts/utils/audio.py:97-103).  This is the TPU stack's native
// equivalent, exposed through a C ABI consumed via ctypes
// (sparktts_tpu/io/native.py).  The resampler is a Kaiser-windowed sinc
// polyphase identical in construction to scipy.signal.resample_poly's default
// (beta=5.0, half_len=10*max_rate), so Python fallback and native path agree
// to float tolerance.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsparkttsaudio.so sparktts_audio.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Kaiser window / FIR design (scipy firwin-compatible)
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  // power series; converges quickly for the beta range we use
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= y / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

std::vector<double> design_lowpass(int up, int down, double beta = 5.0) {
  const int max_rate = std::max(up, down);
  const double fc = 1.0 / max_rate;       // in Nyquist units
  const int half_len = 10 * max_rate;
  const int numtaps = 2 * half_len + 1;
  std::vector<double> h(numtaps);
  const double denom = bessel_i0(beta);
  double sum = 0.0;
  for (int n = 0; n < numtaps; ++n) {
    const double m = n - half_len;
    // sinc lowpass at cutoff fc (normalized to Nyquist): sin(pi*fc*m)/(pi*m)
    double s = (m == 0.0) ? fc : std::sin(M_PI * fc * m) / (M_PI * m);
    const double r = 2.0 * n / (numtaps - 1) - 1.0;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[n] = s * w;
    sum += h[n];
  }
  for (auto& v : h) v /= sum;  // unity DC gain (firwin scale=True)
  return h;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// memory
// ---------------------------------------------------------------------------

void sparktts_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// polyphase resampling
// ---------------------------------------------------------------------------

// Resample `in` (length n) from rate up/down; returns malloc'd buffer in *out
// with length *out_len.  Returns 0 on success.
int sparktts_resample_poly(const double* in, int64_t n, int up, int down,
                           double** out, int64_t* out_len) {
  if (up <= 0 || down <= 0 || n <= 0) return -1;
  if (up == down) {
    *out = static_cast<double*>(std::malloc(sizeof(double) * n));
    if (!*out) return -2;
    std::memcpy(*out, in, sizeof(double) * n);
    *out_len = n;
    return 0;
  }
  const std::vector<double> h = design_lowpass(up, down);
  const int half_len = (static_cast<int>(h.size()) - 1) / 2;
  const int numtaps = static_cast<int>(h.size());

  int64_t n_out = n * up;
  n_out = n_out / down + (n_out % down ? 1 : 0);

  double* y = static_cast<double*>(std::malloc(sizeof(double) * n_out));
  if (!y) return -2;

#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < n_out; ++m) {
    // upsampled-domain tap center aligned so the filter's group delay is
    // removed (matches scipy's output alignment)
    const int64_t jmax = m * down + half_len;
    int64_t p_min = (jmax - (numtaps - 1) + up - 1) / up;  // ceil
    if (p_min < 0) p_min = 0;
    int64_t p_max = jmax / up;
    if (p_max > n - 1) p_max = n - 1;
    double acc = 0.0;
    for (int64_t p = p_min; p <= p_max; ++p) {
      acc += in[p] * h[jmax - p * up];
    }
    y[m] = acc * up;
  }
  *out = y;
  *out_len = n_out;
  return 0;
}

// ---------------------------------------------------------------------------
// volume normalization (reference audio.py:33-73 algorithm)
// ---------------------------------------------------------------------------

int sparktts_volume_normalize(double* audio, int64_t n, double coeff) {
  if (n <= 0) return -1;
  std::vector<double> mags(n);
  for (int64_t i = 0; i < n; ++i) mags[i] = std::fabs(audio[i]);
  std::sort(mags.begin(), mags.end());

  if (mags[n - 1] < 0.1) {
    const double scale = std::max(mags[n - 1], 1e-3);
    for (int64_t i = 0; i < n; ++i) audio[i] = audio[i] / scale * 0.1;
    // NOTE: the magnitude histogram is intentionally NOT rescaled — the
    // reference filters the PRE-scaling magnitudes (audio.py:45-56)
  }

  // values > 0.01, then mean of the top [90%, 99%) slice
  const auto first = std::upper_bound(mags.begin(), mags.end(), 0.01);
  const int64_t L = mags.end() - first;
  if (L <= 10) return 0;
  const int64_t lo = static_cast<int64_t>(0.9 * L);
  const int64_t hi = static_cast<int64_t>(0.99 * L);
  double volume = 0.0;
  for (int64_t i = lo; i < hi; ++i) volume += *(first + i);
  volume /= static_cast<double>(hi - lo);

  double gain = coeff / volume;
  gain = std::min(10.0, std::max(0.1, gain));
  double maxv = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    audio[i] *= gain;
    maxv = std::max(maxv, std::fabs(audio[i]));
  }
  if (maxv > 1.0) {
    for (int64_t i = 0; i < n; ++i) audio[i] /= maxv;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// WAV I/O (PCM 8/16/24/32 + float32/64, first channel)
// ---------------------------------------------------------------------------

int sparktts_read_wav(const char* path, double** out, int64_t* out_len, int* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) ||
      std::fread(&riff_size, 4, 1, f) != 1 || std::fread(wave, 1, 4, f) != 4 ||
      std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> data;
  bool got_fmt = false, got_data = false;

  while (!got_data) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    if (!std::memcmp(id, "fmt ", 4)) {
      std::vector<uint8_t> chunk(size);
      if (std::fread(chunk.data(), 1, size, f) != size) break;
      fmt = *reinterpret_cast<uint16_t*>(&chunk[0]);
      channels = *reinterpret_cast<uint16_t*>(&chunk[2]);
      rate = *reinterpret_cast<uint32_t*>(&chunk[4]);
      bits = *reinterpret_cast<uint16_t*>(&chunk[14]);
      if (fmt == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fmt = *reinterpret_cast<uint16_t*>(&chunk[24]);
      }
      got_fmt = true;
    } else if (!std::memcmp(id, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) break;
      got_data = true;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!got_fmt || !got_data || channels == 0) return -3;

  const int bytes_per = bits / 8;
  const int64_t frames = static_cast<int64_t>(data.size()) / (bytes_per * channels);
  double* buf = static_cast<double*>(std::malloc(sizeof(double) * frames));
  if (!buf) return -4;

  for (int64_t i = 0; i < frames; ++i) {
    const uint8_t* p = data.data() + i * bytes_per * channels;  // first channel
    double v = 0.0;
    if (fmt == 1) {  // PCM
      if (bits == 16) {
        v = *reinterpret_cast<const int16_t*>(p) / 32768.0;
      } else if (bits == 32) {
        v = *reinterpret_cast<const int32_t*>(p) / 2147483648.0;
      } else if (bits == 24) {
        int32_t s = (p[0] | (p[1] << 8) | (p[2] << 16));
        if (s & 0x800000) s |= 0xFF000000;
        v = s / 8388608.0;
      } else if (bits == 8) {
        v = (p[0] - 128) / 128.0;
      }
    } else if (fmt == 3) {  // IEEE float
      if (bits == 32) v = *reinterpret_cast<const float*>(p);
      else if (bits == 64) v = *reinterpret_cast<const double*>(p);
    }
    buf[i] = v;
  }
  *out = buf;
  *out_len = frames;
  *sample_rate = static_cast<int>(rate);
  return 0;
}

int sparktts_write_wav(const char* path, const double* audio, int64_t n, int sample_rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_size = static_cast<uint32_t>(n * 2);
  const uint32_t riff_size = 36 + data_size;
  const uint16_t fmt = 1, channels = 1, bits = 16;
  const uint32_t byte_rate = sample_rate * 2;
  const uint16_t block_align = 2;
  const uint32_t fmt_size = 16;

  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVE", 1, 4, f);
  std::fwrite("fmt ", 1, 4, f);
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&fmt, 2, 1, f);
  std::fwrite(&channels, 2, 1, f);
  std::fwrite(&sample_rate, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block_align, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_size, 4, 1, f);
  for (int64_t i = 0; i < n; ++i) {
    double v = std::max(-1.0, std::min(1.0, audio[i]));
    int16_t s = static_cast<int16_t>(std::lrint(v * 32767.0));
    std::fwrite(&s, 2, 1, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
