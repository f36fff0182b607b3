// ezaudio-tpu native runtime: multithreaded audio ingest.
//
// The reference framework is pure Python and leans on a torch DataLoader
// with 16 worker *processes* (src/train.py:34,190) to hide host-side wav
// decoding behind the training step.  On TPU hosts the bottleneck budget is
// tighter (the accelerator step is faster), so this C shim does the host
// hot path natively:
//
//   * RIFF/WAVE parsing + PCM16/24/32/float32 decode to float32,
//   * channel downmix (mono mean; 5.1 -> front-pair mean, matching
//     dataset/audiocaps_v2.py:53-62),
//   * random fixed-length crop + zero pad + peak normalization
//     (audiocaps_v2.py:75-88),
//   * a pthread worker pool that fills a whole batch in parallel.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: see ezaudio_tpu/data/native_loader.py (setup-free cc at first use).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

namespace {

struct WavInfo {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;  // raw sample bytes
  uint64_t data_len = 0;          // bytes
};

bool parse_wav(const uint8_t* buf, uint64_t len, WavInfo* out) {
  if (len < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  uint64_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= len) {
    const uint8_t* hdr = buf + pos;
    uint32_t chunk_len;
    memcpy(&chunk_len, hdr + 4, 4);
    const uint8_t* body = hdr + 8;
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16 && pos + 8 + chunk_len <= len) {
      memcpy(&out->format, body, 2);
      memcpy(&out->channels, body + 2, 2);
      memcpy(&out->sample_rate, body + 4, 4);
      memcpy(&out->bits, body + 14, 2);
      if (out->format == 0xFFFE && chunk_len >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: subformat GUID's first two bytes
        memcpy(&out->format, body + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(hdr, "data", 4) == 0) {
      out->data = body;
      out->data_len = chunk_len;
      if (pos + 8 + out->data_len > len) out->data_len = len - pos - 8;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are word-aligned
  }
  if (!(have_fmt && out->data != nullptr)) return false;
  // Reject malformed/unsupported streams here so callers return an error
  // status instead of dividing by zero (channels=0/bits<8 -> SIGFPE) or
  // silently decoding zeros (A-law, ADPCM, float64, ...).
  if (out->channels < 1 || out->channels > 64) return false;
  const uint16_t fmt = out->format, bits = out->bits;
  const bool supported =
      (fmt == 3 && bits == 32) ||
      (fmt == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32));
  return supported;
}

// Decode + downmix one frame range into float32 mono.
// Returns frames decoded.
int64_t decode_mono(const WavInfo& w, int64_t start_frame, int64_t n_frames,
                    float* out) {
  const int ch = w.channels;
  const int bytes = w.bits / 8;
  const int64_t total_frames = (int64_t)(w.data_len / (bytes * ch));
  if (start_frame >= total_frames) return 0;
  if (start_frame + n_frames > total_frames) n_frames = total_frames - start_frame;

  // channel policy: 6ch -> mean of first two; else mean of all
  const int use_ch = (ch == 6) ? 2 : ch;
  const double inv = 1.0 / use_ch;

  for (int64_t i = 0; i < n_frames; ++i) {
    const uint8_t* frame = w.data + (uint64_t)(start_frame + i) * bytes * ch;
    double acc = 0.0;
    for (int c = 0; c < use_ch; ++c) {
      const uint8_t* p = frame + c * bytes;
      double v = 0.0;
      if (w.format == 3 && w.bits == 32) {
        float f;
        memcpy(&f, p, 4);
        v = f;
      } else if (w.format == 1 && w.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.0;
      } else if (w.format == 1 && w.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.0;
      } else if (w.format == 1 && w.bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (s >> 8) / 8388608.0;
      } else if (w.format == 1 && w.bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out[i] = (float)(acc * inv);
  }
  return n_frames;
}

struct LoadTask {
  const char* path;
  uint64_t rng;          // per-item seed
  int64_t seg_len;       // output frames
  int expected_sr;
  int normalize;
  float* out;            // seg_len floats
  int32_t* status;       // 0 ok, negative = error code
};

// xorshift64* for crop sampling (deterministic per item seed)
static inline uint64_t xs64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
  *s = x;
  return x * 0x2545F4914F6CDD1DULL;
}

void run_task(const LoadTask& t) {
  *t.status = 0;
  FILE* f = fopen(t.path, "rb");
  if (!f) { *t.status = -1; return; }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)fsize);
  if (fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f); *t.status = -2; return;
  }
  fclose(f);

  WavInfo w;
  if (!parse_wav(buf.data(), (uint64_t)fsize, &w)) { *t.status = -3; return; }
  if (t.expected_sr > 0 && (int)w.sample_rate != t.expected_sr) {
    *t.status = -4; return;
  }
  const int64_t total = (int64_t)(w.data_len / ((w.bits / 8) * w.channels));

  uint64_t rng = t.rng ? t.rng : 0x9E3779B97F4A7C15ULL;
  int64_t start = 0;
  if (total > t.seg_len) start = (int64_t)(xs64(&rng) % (uint64_t)(total - t.seg_len + 1));

  memset(t.out, 0, sizeof(float) * (size_t)t.seg_len);
  int64_t got = decode_mono(w, start, t.seg_len, t.out);

  if (t.normalize) {
    float peak = 0.f;
    for (int64_t i = 0; i < got; ++i) peak = fmaxf(peak, fabsf(t.out[i]));
    const float inv = 1.0f / (peak + 1e-9f);
    for (int64_t i = 0; i < got; ++i) t.out[i] *= inv;
  }
}

}  // namespace

extern "C" {

// Decode a whole file to mono float32. Returns frames written (capped at
// max_frames), or a negative error code.  sr_out receives the sample rate.
int64_t ez_decode_wav(const char* path, float* out, int64_t max_frames,
                      int32_t* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)fsize);
  if (fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) { fclose(f); return -2; }
  fclose(f);
  WavInfo w;
  if (!parse_wav(buf.data(), (uint64_t)fsize, &w)) return -3;
  *sr_out = (int32_t)w.sample_rate;
  return decode_mono(w, 0, max_frames, out);
}

// Fill a (batch, seg_len) float32 buffer from `batch` wav paths in
// parallel: random crop (seeded), zero pad, optional peak normalize.
// statuses: per-item 0/err.  Returns 0.
int32_t ez_load_batch(const char** paths, int32_t batch, int64_t seg_len,
                      int32_t expected_sr, int32_t normalize, uint64_t seed,
                      int32_t n_threads, float* out, int32_t* statuses) {
  std::vector<LoadTask> tasks((size_t)batch);
  for (int i = 0; i < batch; ++i) {
    tasks[i] = LoadTask{paths[i], seed + (uint64_t)i * 0x9E3779B97F4A7C15ULL,
                        seg_len, expected_sr, normalize,
                        out + (int64_t)i * seg_len, statuses + i};
  }
  if (n_threads <= 1 || batch <= 1) {
    for (auto& t : tasks) run_task(t);
    return 0;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= batch) break;
      run_task(tasks[(size_t)i]);
    }
  };
  int nt = n_threads < batch ? n_threads : batch;
  std::vector<std::thread> pool;
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
