// Native batched audio loader for the data pipeline.
//
// The reference reaches native code for audio IO through torchaudio's C++
// backends (reference: data.py:72 torchaudio.load). This library provides the
// TPU-framework equivalent: multi-threaded WAV decode + mono downmix +
// random-crop/pad directly into a caller-provided float32 batch buffer, so the
// Python hot loop does zero per-sample work.
//
// Exposed C ABI (ctypes):
//   int al_load_batch(const char** paths, int n, long max_length,
//                     unsigned long long seed, float* out, long* out_lengths,
//                     int* out_rates, int num_threads);
//     out: (n, max_length) float32, zero-padded.  Returns 0 on success,
//     else the index+1 of the first failing file.
//   int al_probe(const char* path, long* length, int* rate, int* channels);
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libaudioload.so audioload.cpp -lpthread
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  int rate = 0;
  int channels = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

bool parse_wav(const char* path, Wav& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44) { fclose(f); return false; }
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return false; }
  fclose(f);

  if (memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return false;

  int fmt = 0, channels = 0, rate = 0, bits = 0;
  const uint8_t* data = nullptr;
  long data_len = 0;
  long pos = 12;
  while (pos + 8 <= size) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t clen = rd_u32(chunk + 4);
    if (!memcmp(chunk, "fmt ", 4) && clen >= 16) {
      fmt = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      rate = (int)rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
    } else if (!memcmp(chunk, "data", 4)) {
      data = chunk + 8;
      data_len = clen;
      if (pos + 8 + data_len > size) data_len = size - pos - 8;
    }
    pos += 8 + clen + (clen & 1);
  }
  if (!data || channels <= 0 || rate <= 0) return false;

  long frames;
  out.rate = rate;
  out.channels = channels;
  const float inv_ch = 1.0f / channels;

  if (fmt == 1 && bits == 16) {
    frames = data_len / (2 * channels);
    out.samples.resize(frames);
    const int16_t* s = reinterpret_cast<const int16_t*>(data);
    for (long i = 0; i < frames; i++) {
      float acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c];
      out.samples[i] = acc * inv_ch / 32768.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    frames = data_len / (4 * channels);
    out.samples.resize(frames);
    const int32_t* s = reinterpret_cast<const int32_t*>(data);
    for (long i = 0; i < frames; i++) {
      double acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c];
      out.samples[i] = (float)(acc * inv_ch / 2147483648.0);
    }
  } else if (fmt == 1 && bits == 24) {
    frames = data_len / (3 * channels);
    out.samples.resize(frames);
    for (long i = 0; i < frames; i++) {
      float acc = 0;
      for (int c = 0; c < channels; c++) {
        const uint8_t* p = data + (i * channels + c) * 3;
        int32_t v = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
        if (v & 0x800000) v -= 0x1000000;
        acc += (float)v;
      }
      out.samples[i] = acc * inv_ch / 8388608.0f;
    }
  } else if (fmt == 3 && bits == 32) {  // IEEE float
    frames = data_len / (4 * channels);
    out.samples.resize(frames);
    const float* s = reinterpret_cast<const float*>(data);
    for (long i = 0; i < frames; i++) {
      float acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c];
      out.samples[i] = acc * inv_ch;
    }
  } else {
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

int al_probe(const char* path, long* length, int* rate, int* channels) {
  Wav w;
  if (!parse_wav(path, w)) return 1;
  *length = (long)w.samples.size();
  *rate = w.rate;
  *channels = w.channels;
  return 0;
}

int al_load_batch(const char** paths, int n, long max_length,
                  unsigned long long seed, float* out, long* out_lengths,
                  int* out_rates, int num_threads) {
  std::atomic<int> fail{0};
  std::atomic<int> next{0};
  if (num_threads < 1) num_threads = 1;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Wav w;
      if (!parse_wav(paths[i], w)) {
        int expected = 0;
        fail.compare_exchange_strong(expected, i + 1);
        continue;
      }
      out_rates[i] = w.rate;
      long len = (long)w.samples.size();
      float* dst = out + (long)i * max_length;
      if (len > max_length) {
        // deterministic random crop from (seed, i)
        std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ull + i);
        std::uniform_int_distribution<long> dist(0, len - max_length);
        long start = dist(rng);
        memcpy(dst, w.samples.data() + start, max_length * sizeof(float));
        out_lengths[i] = max_length;
      } else {
        memcpy(dst, w.samples.data(), len * sizeof(float));
        memset(dst + len, 0, (max_length - len) * sizeof(float));
        out_lengths[i] = len;
      }
    }
  };

  std::vector<std::thread> threads;
  int t = std::min(num_threads, n);
  for (int i = 0; i < t; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return fail.load();
}

}  // extern "C"
