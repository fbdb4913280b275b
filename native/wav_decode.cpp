// Native audio decode for whisperx_tpu: RIFF/WAVE parsing, channel
// downmix, and Kaiser-windowed-sinc polyphase resampling to the target
// rate. Fills the role ffmpeg plays in the reference's load_audio
// (whisperx/audio.py:41-65) on hosts without ffmpeg, at native speed.
//
// C ABI (used via ctypes from whisperx_tpu/native.py):
//   long wxt_decode_wav(const char* path, int target_sr, float** out);
//       returns sample count (>=0) or a negative error code; *out is a
//       malloc'd mono float32 buffer the caller frees with wxt_free.
//   long wxt_resample(const float* in, long n, int sr_in, int sr_out,
//                     float** out);
//   void wxt_free(float* buf);

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrAlloc = -4;

struct Reader {
  FILE* f;
  bool ok = true;
  uint32_t u32() {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { ok = false; return 0; }
    return b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  uint16_t u16() {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { ok = false; return 0; }
    return b[0] | (b[1] << 8);
  }
};

double bessel_i0(double x) {
  // series expansion, converges fast for the beta values we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Polyphase windowed-sinc resampler: 32 taps per phase, Kaiser beta 8.
//
// Upsampled-grid formulation: zero-stuff by `up`, low-pass with cutoff
// c = 0.95 * 0.5 / max(up, down) (in upsampled-rate units, gain `up`),
// then keep every `down`-th sample:
//   out[m] = sum_k in[k] * h[m*down - k*up]
std::vector<float> resample(const std::vector<float>& in, int sr_in, int sr_out) {
  if (sr_in == sr_out || in.empty()) return in;
  long a = sr_in, b = sr_out;
  while (b) { long t = a % b; a = b; b = t; }
  const long g = a;
  const int up = int(sr_out / g), down = int(sr_in / g);

  const int taps_per_phase = 32;
  const int half = taps_per_phase * std::max(up, down) / 2;
  const double c = 0.95 * 0.5 / std::max(up, down);
  const double beta = 8.0;
  const double i0b = bessel_i0(beta);

  std::vector<double> h(2 * half + 1);
  for (int n = -half; n <= half; ++n) {
    const double x = 2.0 * c * n;
    const double sinc = (n == 0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    const double frac = double(n) / half;
    const double w =
        bessel_i0(beta * std::sqrt(std::fmax(0.0, 1.0 - frac * frac))) / i0b;
    h[n + half] = double(up) * 2.0 * c * sinc * w;
  }

  const long n_out = (long(in.size()) * up) / down;
  std::vector<float> out(n_out);
  const long n_in = long(in.size());
  for (long m = 0; m < n_out; ++m) {
    const long num = m * down;  // position on the upsampled grid
    long k_lo = (num - half + up - 1) / up;  // ceil((num-half)/up)
    long k_hi = (num + half) / up;
    if (k_lo < 0) k_lo = 0;
    if (k_hi >= n_in) k_hi = n_in - 1;
    double acc = 0.0;
    for (long k = k_lo; k <= k_hi; ++k) {
      acc += double(in[k]) * h[num - k * up + half];
    }
    out[m] = float(acc);
  }
  return out;
}

}  // namespace

extern "C" {

void wxt_free(float* buf) { std::free(buf); }

long wxt_resample(const float* in, long n, int sr_in, int sr_out, float** out) {
  std::vector<float> input(in, in + n);
  std::vector<float> res = resample(input, sr_in, sr_out);
  if (res.empty()) {  // malloc(0) may return NULL — that is not an error
    *out = nullptr;
    return 0;
  }
  *out = static_cast<float*>(std::malloc(res.size() * sizeof(float)));
  if (!*out) return kErrAlloc;
  std::memcpy(*out, res.data(), res.size() * sizeof(float));
  return long(res.size());
}

long wxt_decode_wav(const char* path, int target_sr, float** out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  Reader r{f};

  if (r.u32() != 0x46464952u) { fclose(f); return kErrFormat; }  // "RIFF"
  r.u32();                                                      // size
  if (r.u32() != 0x45564157u) { fclose(f); return kErrFormat; }  // "WAVE"

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  std::vector<float> samples;
  bool have_fmt = false, have_data = false;

  while (r.ok && !(have_fmt && have_data)) {
    uint32_t id = r.u32();
    uint32_t size = r.u32();
    if (!r.ok) break;
    if (id == 0x20746d66u) {  // "fmt "
      // the 16 field bytes below are read unconditionally: a declared
      // size < 16 would desynchronize the chunk walk into raw data
      if (size < 16) { fclose(f); return kErrFormat; }
      fmt = r.u16();
      channels = r.u16();
      sr = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      // reject malformed fmt chunks before any arithmetic uses these:
      // channels==0 or bits<8 would divide by zero computing the frame
      // count (SIGFPE in the host process)
      if (channels == 0 || channels > 64 || bits < 8 || bits % 8 != 0) {
        fclose(f);
        return kErrFormat;
      }
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (id == 0x61746164u) {  // "data"
      if (!have_fmt) { fclose(f); return kErrFormat; }
      // validate the declared chunk size against the bytes actually left
      // in the file, so a corrupt header can't drive a huge allocation
      long pos = ftell(f);
      fseek(f, 0, SEEK_END);
      long remain = ftell(f) - pos;
      fseek(f, pos, SEEK_SET);
      if (remain < 0 || static_cast<long>(size) > remain) {
        fclose(f);
        return kErrFormat;
      }
      std::vector<uint8_t> raw(size);
      if (fread(raw.data(), 1, size, f) != size) { fclose(f); return kErrFormat; }
      const long frames = size / (channels * (bits / 8));
      samples.resize(frames);
      for (long i = 0; i < frames; ++i) {
        double acc = 0.0;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + (i * channels + c) * (bits / 8);
          double v = 0.0;
          if (fmt == 1 && bits == 16) {
            int16_t s;
            std::memcpy(&s, p, 2);
            v = s / 32768.0;
          } else if (fmt == 1 && bits == 32) {
            int32_t s;
            std::memcpy(&s, p, 4);
            v = s / 2147483648.0;
          } else if (fmt == 1 && bits == 8) {
            v = (int(p[0]) - 128) / 128.0;
          } else if (fmt == 3 && bits == 32) {
            float s;
            std::memcpy(&s, p, 4);
            v = s;
          } else {
            fclose(f);
            return kErrUnsupported;
          }
          acc += v;
        }
        samples[i] = float(acc / channels);
      }
      have_data = true;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!have_data || sr == 0) return kErrFormat;

  std::vector<float> final_samples =
      (int(sr) == target_sr) ? samples : resample(samples, int(sr), target_sr);
  if (final_samples.empty()) {  // 0-byte data chunk: empty result, not an error
    *out = nullptr;
    return 0;
  }
  *out = static_cast<float*>(std::malloc(final_samples.size() * sizeof(float)));
  if (!*out) return kErrAlloc;
  std::memcpy(*out, final_samples.data(), final_samples.size() * sizeof(float));
  return long(final_samples.size());
}

}  // extern "C"
