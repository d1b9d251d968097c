// Native host-side DSP for the data pipeline.
//
// The reference leans on libsndfile (soundfile) + librosa for WAV decode and
// resampling on dataloader workers (reference train/dataloader.py:4-6,
// 157-161).  This library provides the equivalent hot path in C++:
//   * RIFF/WAV parsing (PCM 16/24/32, IEEE float32) -> float32 mono
//   * center-padded batch assembly straight into a caller-provided buffer
//     (one memcpy-free pass from file bytes to the training batch)
//   * a simple multithreaded batch loader
//
// Exposed with a C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
  bool ok = false;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

WavData decode_wav_file(const char* path) {
  WavData out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 44) {
    std::fclose(f);
    return out;
  }
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != (size_t)size) {
    std::fclose(f);
    return out;
  }
  std::fclose(f);

  if (std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return out;

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t chunk_len = rd_u32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_len >= 16) {
      format = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      sample_rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data = chunk + 8;
      data_len = chunk_len;
      if (pos + 8 + data_len > (size_t)size) data_len = size - pos - 8;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!data || channels == 0 || sample_rate == 0) return out;
  // WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real format in the
  // extension; PCM layouts are identical so treat it as PCM/float by bits.
  bool is_float = (format == 3) || (format == 0xFFFE && bits == 32);
  bool is_pcm = (format == 1) || (format == 0xFFFE);
  if (!is_float && !is_pcm) return out;

  uint32_t bytes_per = bits / 8;
  uint32_t n_frames = data_len / (bytes_per * channels);
  out.samples.resize(n_frames);
  out.sample_rate = (int)sample_rate;

  for (uint32_t i = 0; i < n_frames; ++i) {
    const uint8_t* p = data + (size_t)i * bytes_per * channels;  // channel 0
    float v = 0.f;
    if (is_float && bits == 32) {
      float fv;
      std::memcpy(&fv, p, 4);
      v = fv;
    } else if (bits == 16) {
      int16_t s = (int16_t)rd_u16(p);
      v = (float)s / 32768.0f;
    } else if (bits == 24) {
      int32_t s = ((int32_t)p[0] << 8) | ((int32_t)p[1] << 16) |
                  ((int32_t)p[2] << 24);
      v = (float)(s >> 8) / 8388608.0f;
    } else if (bits == 32) {
      int32_t s;
      std::memcpy(&s, p, 4);
      v = (float)s / 2147483648.0f;
    }
    out.samples[i] = v;
  }
  out.ok = true;
  return out;
}

}  // namespace

extern "C" {

// Probe header only: returns 0 on success, fills frames / sample_rate.
int wav_probe(const char* path, int64_t* frames, int32_t* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[12];
  if (std::fread(head, 1, 12, f) != 12 || std::memcmp(head, "RIFF", 4) != 0 ||
      std::memcmp(head + 8, "WAVE", 4) != 0) {
    std::fclose(f);
    return -2;
  }
  uint16_t channels = 0, bits = 0;
  uint32_t sr = 0, data_len = 0;
  uint8_t chunk[8];
  while (std::fread(chunk, 1, 8, f) == 8) {
    uint32_t len = rd_u32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && len >= 16) {
      uint8_t fmt[16];
      if (std::fread(fmt, 1, 16, f) != 16) break;
      channels = rd_u16(fmt + 2);
      sr = rd_u32(fmt + 4);
      bits = rd_u16(fmt + 14);
      std::fseek(f, len - 16 + (len & 1), SEEK_CUR);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data_len = len;
      break;
    } else {
      std::fseek(f, len + (len & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (channels == 0 || bits == 0 || sr == 0) return -3;
  *frames = (int64_t)(data_len / (bits / 8 * channels));
  *sample_rate = (int32_t)sr;
  return 0;
}

// Decode one file to float32 mono.  Caller provides out buffer of capacity
// `capacity`; returns frames written (or required if out==nullptr), <0 on
// error.  sample_rate_out receives the file's native rate (no resampling —
// datasets are expected at the training rate, as in the reference).
int64_t wav_decode(const char* path, float* out, int64_t capacity,
                   int32_t* sample_rate_out) {
  WavData wav = decode_wav_file(path);
  if (!wav.ok) return -1;
  *sample_rate_out = wav.sample_rate;
  int64_t n = (int64_t)wav.samples.size();
  if (out == nullptr) return n;
  if (n > capacity) n = capacity;
  std::memcpy(out, wav.samples.data(), n * sizeof(float));
  return n;
}

// Decode a batch of files into a center-padded [batch, frame_count*hop]
// buffer using worker threads — the Collater hot path
// (reference train/dataloader.py:154-182, 202-208).
// paths: concatenated NUL-separated strings.
int batch_decode_padded(const char* paths, int batch, int64_t samples_per_row,
                        float* out, int n_threads) {
  std::vector<const char*> files;
  const char* p = paths;
  for (int i = 0; i < batch; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::vector<int> status(batch, 0);
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      WavData wav = decode_wav_file(files[i]);
      if (!wav.ok) {
        status[i] = -1;
        continue;
      }
      int64_t n = (int64_t)wav.samples.size();
      if (n > samples_per_row) n = samples_per_row;
      int64_t pad_start = (samples_per_row - n) / 2;
      float* row = out + (size_t)i * samples_per_row;
      std::memset(row, 0, samples_per_row * sizeof(float));
      std::memcpy(row + pad_start, wav.samples.data(), n * sizeof(float));
    }
  };
  if (n_threads <= 1 || batch <= 1) {
    work(0, batch);
  } else {
    int workers = n_threads < batch ? n_threads : batch;
    std::vector<std::thread> threads;
    int per = (batch + workers - 1) / workers;
    for (int w = 0; w < workers; ++w) {
      int begin = w * per;
      int end = begin + per < batch ? begin + per : batch;
      if (begin >= end) break;
      threads.emplace_back(work, begin, end);
    }
    for (auto& t : threads) t.join();
  }
  for (int s : status)
    if (s != 0) return -1;
  return 0;
}

}  // extern "C"
