// Native FLAC decoder for the sls_tpu data pipeline.
//
// The reference pipeline decodes FLAC through librosa/libsndfile on
// dataloader workers (reference: data_utils_SSL.py:87,112,132).  This
// environment ships no audio decode library at all, so the framework
// provides its own: a dependency-free C++17 FLAC decoder with a C ABI,
// loaded from Python via ctypes (sls_tpu/data/flac.py), with
// multi-threaded batch decode + pad/tile so a whole training batch is
// assembled in one native call.
//
// Supported: all FLAC subframe types (constant / verbatim / fixed 0-4 /
// LPC 1-32), rice + rice2 residual partitions with escape codes, wasted
// bits, all channel assignments (independent, left/side, right/side,
// mid/side), 8/16/24/32-bit sample widths, variable + fixed blocking.
// CRCs are consumed but not verified (corrupt files surface as short
// reads and fall back to zero-fill upstream).
//
// Build: make -C native/flac   -> libslsaudio.so

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <thread>
#include <vector>

namespace {

// Buffered MSB-first bit reader: a 64-bit top-aligned accumulator is
// refilled bytewise, so multi-bit reads are shifts and unary (rice) codes
// decode via count-leading-zeros instead of per-bit loops (~5x faster
// decode than the naive bit-at-a-time form).
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  bool ok() const { return ok_; }

  // Read up to 32 bits MSB-first.
  uint32_t bits(int n) {
    return static_cast<uint32_t>(bits64(n));
  }

  uint64_t bits64(int n) {
    if (n == 0) return 0;
    uint64_t v = 0;
    while (n > 32) {  // rare (only the 36-bit total_samples field)
      v = (v << 32) | bits64(32);
      n -= 32;
    }
    refill();
    if (avail_ < n) {
      ok_ = false;
      int got = avail_;
      uint64_t head = got ? (buf_ >> (64 - got)) : 0;
      buf_ = 0;
      avail_ = 0;
      return (v << n) | (head << (n - got));
    }
    uint64_t out = buf_ >> (64 - n);
    buf_ <<= n;
    avail_ -= n;
    return (v << n) | out;
  }

  int64_t signed_bits(int n) {
    if (n == 0) return 0;
    uint64_t v = bits64(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? static_cast<int64_t>(v) - (1ll << n)
                      : static_cast<int64_t>(v);
  }

  // Count zero bits until the terminating 1 (unary code).
  uint32_t unary() {
    uint32_t q = 0;
    for (;;) {
      refill();
      if (avail_ == 0) {
        ok_ = false;
        return q;
      }
      // zeros within the valid bits only
      int lead = buf_ == 0 ? 64 : __builtin_clzll(buf_);
      if (lead >= avail_) {  // all valid bits are zero; consume them
        q += avail_;
        buf_ = 0;
        avail_ = 0;
        continue;
      }
      q += lead;
      // consume the zeros and the terminating 1 (guard: << 64 is UB)
      int consume = lead + 1;
      buf_ = consume >= 64 ? 0 : buf_ << consume;
      avail_ -= consume;
      return q;
    }
  }

  void align_to_byte() {
    int drop = avail_ % 8;
    buf_ <<= drop;
    avail_ -= drop;
  }

 private:
  void refill() {
    while (avail_ <= 56 && pos_ < size_) {
      buf_ |= static_cast<uint64_t>(data_[pos_++]) << (56 - avail_);
      avail_ += 8;
    }
  }

  const uint8_t* data_;
  size_t size_;
  size_t pos_ = 0;
  uint64_t buf_ = 0;
  int avail_ = 0;
  bool ok_ = true;
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
};

// UTF-8-style coded number used for frame/sample indices.
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = br.bits(8);
  if (!br.ok()) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br.bits(8);
    if (!br.ok() || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// Residual decode into res[0..n), where n = blocksize - predictor_order.
bool decode_residual(BitReader& br, uint32_t blocksize, uint32_t order,
                     int64_t* res) {
  uint32_t method = br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order = br.bits(4);
  uint32_t parts = 1u << part_order;
  if (blocksize % parts != 0) return false;
  uint32_t part_samples = blocksize >> part_order;
  if (part_samples < order) return false;  // first partition would underflow

  size_t idx = 0;
  for (uint32_t p = 0; p < parts; ++p) {
    uint32_t count = part_samples - (p == 0 ? order : 0);
    uint32_t rice = br.bits(plen);
    if (!br.ok()) return false;
    if (rice == escape) {
      uint32_t raw_bits = br.bits(5);
      for (uint32_t i = 0; i < count; ++i)
        res[idx++] = br.signed_bits(raw_bits);
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint64_t q = br.unary();
        uint64_t u = (q << rice) | br.bits64(rice);
        res[idx++] = static_cast<int64_t>(u >> 1) ^
                     -static_cast<int64_t>(u & 1);
      }
    }
    if (!br.ok()) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, uint32_t blocksize, uint32_t bps,
                     int64_t* out) {
  if (br.bits(1) != 0) return false;  // padding bit must be 0
  uint32_t type = br.bits(6);
  uint32_t wasted = 0;
  if (br.bits(1)) wasted = br.unary() + 1;
  if (!br.ok() || wasted >= bps) return false;
  bps -= wasted;

  if (type == 0) {  // constant
    int64_t v = br.signed_bits(bps);
    for (uint32_t i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (uint32_t i = 0; i < blocksize; ++i) out[i] = br.signed_bits(bps);
  } else if (type >= 8 && type <= 12) {  // fixed, order = type - 8
    uint32_t order = type - 8;
    // crafted frames can pair a tiny blocksize (1-3) with order 4: the
    // warmup write below would overflow the blocksize-sized buffer
    // (the LPC branch has the same guard)
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t e = res[i - order];
      switch (order) {
        case 0: out[i] = e; break;
        case 1: out[i] = e + out[i - 1]; break;
        case 2: out[i] = e + 2 * out[i - 1] - out[i - 2]; break;
        case 3:
          out[i] = e + 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
          break;
        default:
          out[i] = e + 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                   out[i - 4];
      }
    }
  } else if (type >= 32) {  // LPC, order = (type & 31) + 1
    uint32_t order = (type & 31u) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    uint32_t precision = br.bits(4);
    if (precision == 0xF) return false;
    precision += 1;
    int32_t shift = static_cast<int32_t>(br.signed_bits(5));
    if (shift < 0) return false;
    std::vector<int64_t> coeff(order);
    for (uint32_t i = 0; i < order; ++i)
      coeff[i] = br.signed_bits(precision);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j)
        acc += coeff[j] * out[i - 1 - j];
      out[i] = res[i - order] + (acc >> shift);
    }
  } else {
    return false;  // reserved type
  }
  if (!br.ok()) return false;
  if (wasted)
    for (uint32_t i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return true;
}

const uint32_t kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384,
                                  32768};
const uint32_t kSampleRates[12] = {0,     88200, 176400, 192000,
                                   8000,  16000, 22050,  24000,
                                   32000, 44100, 48000,  96000};
const uint32_t kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Decode one frame; appends interleaved-average mono float samples.
// Returns decoded blocksize, 0 on end, -1 on error.
long decode_frame(BitReader& br, const StreamInfo& si, float* out,
                  long out_capacity, long written) {
  // sync code 0b11111111111110
  uint32_t sync = br.bits(14);
  if (!br.ok()) return 0;  // clean EOF
  if (sync != 0x3FFE) return -1;
  if (br.bits(1) != 0) return -1;  // reserved
  br.bits(1);                      // blocking strategy
  uint32_t bs_code = br.bits(4);
  uint32_t sr_code = br.bits(4);
  uint32_t ch_code = br.bits(4);
  uint32_t ss_code = br.bits(3);
  if (br.bits(1) != 0) return -1;  // reserved

  uint64_t frame_number;
  if (!read_coded_number(br, &frame_number)) return -1;

  uint32_t blocksize;
  if (bs_code == 6)
    blocksize = br.bits(8) + 1;
  else if (bs_code == 7)
    blocksize = br.bits(16) + 1;
  else
    blocksize = kBlockSizes[bs_code];
  if (blocksize == 0) return -1;

  if (sr_code == 12)
    br.bits(8);
  else if (sr_code == 13 || sr_code == 14)
    br.bits(16);
  else if (sr_code == 15)
    return -1;

  uint32_t bps = ss_code == 0 ? si.bits_per_sample : kSampleSizes[ss_code];
  if (bps == 0) return -1;

  br.bits(8);  // CRC-8 (consumed, not verified)

  uint32_t channels;
  bool left_side = false, right_side = false, mid_side = false;
  if (ch_code < 8) {
    channels = ch_code + 1;
  } else if (ch_code == 8) {
    channels = 2;
    left_side = true;
  } else if (ch_code == 9) {
    channels = 2;
    right_side = true;
  } else if (ch_code == 10) {
    channels = 2;
    mid_side = true;
  } else {
    return -1;
  }

  std::vector<std::vector<int64_t>> ch(channels,
                                       std::vector<int64_t>(blocksize));
  for (uint32_t c = 0; c < channels; ++c) {
    uint32_t ch_bps = bps;
    // the side channel carries one extra bit
    if ((left_side && c == 1) || (right_side && c == 0) ||
        (mid_side && c == 1))
      ch_bps += 1;
    if (!decode_subframe(br, blocksize, ch_bps, ch[c].data())) return -1;
  }
  br.align_to_byte();
  br.bits(16);  // CRC-16 (consumed, not verified)
  if (!br.ok()) return -1;

  // undo inter-channel decorrelation
  if (left_side) {
    for (uint32_t i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
  } else if (right_side) {
    for (uint32_t i = 0; i < blocksize; ++i) ch[0][i] = ch[1][i] + ch[0][i];
  } else if (mid_side) {
    for (uint32_t i = 0; i < blocksize; ++i) {
      int64_t side = ch[1][i];
      int64_t mid = (ch[0][i] << 1) | (side & 1);
      ch[0][i] = (mid + side) >> 1;
      ch[1][i] = (mid - side) >> 1;
    }
  }

  float scale = 1.0f / static_cast<float>(1ll << (bps - 1));
  long n = 0;
  for (uint32_t i = 0; i < blocksize && written + n < out_capacity; ++i) {
    float acc = 0.0f;
    for (uint32_t c = 0; c < channels; ++c)
      acc += static_cast<float>(ch[c][i]);
    out[written + n++] = acc / static_cast<float>(channels) * scale;
  }
  return static_cast<long>(blocksize);
}

bool read_file(const char* path, std::vector<uint8_t>* data) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  data->resize(static_cast<size_t>(size));
  size_t got = std::fread(data->data(), 1, data->size(), f);
  std::fclose(f);
  return got == data->size();
}

long decode_flac_buffer(const uint8_t* buf, size_t size, float* out,
                        long max_samples, int* sample_rate_out) {
  BitReader br(buf, size);
  if (br.bits(32) != 0x664C6143u) return -1;  // "fLaC"

  StreamInfo si;
  bool last = false;
  bool have_streaminfo = false;
  while (!last && br.ok()) {
    last = br.bits(1);
    uint32_t type = br.bits(7);
    uint32_t len = br.bits(24);
    if (type == 0 && len >= 34) {  // STREAMINFO
      br.bits(16);  // min blocksize
      br.bits(16);  // max blocksize
      br.bits(24);  // min framesize
      br.bits(24);  // max framesize
      si.sample_rate = br.bits(20);
      si.channels = br.bits(3) + 1;
      si.bits_per_sample = br.bits(5) + 1;
      si.total_samples = br.bits64(36);
      for (uint32_t i = 0; i < 16; ++i) br.bits(8);  // md5
      for (uint32_t i = 34; i < len; ++i) br.bits(8);
      have_streaminfo = true;
    } else {
      for (uint32_t i = 0; i < len; ++i) br.bits(8);
    }
  }
  if (!br.ok() || !have_streaminfo || si.channels == 0) return -1;
  if (sample_rate_out) *sample_rate_out = static_cast<int>(si.sample_rate);

  long written = 0;
  while (written < max_samples) {
    long n = decode_frame(br, si, out, max_samples, written);
    if (n == 0) break;  // EOF
    if (n < 0) return written > 0 ? written : -1;  // salvage prefix
    written += n;
    if (si.total_samples && written >= static_cast<long>(si.total_samples))
      break;
  }
  long result = std::min(written, max_samples);
  if (si.total_samples &&
      result > static_cast<long>(si.total_samples))
    result = static_cast<long>(si.total_samples);
  return result;
}

void pad_or_tile(const float* src, long n, float* dst, long cut) {
  if (n <= 0) {
    std::memset(dst, 0, sizeof(float) * static_cast<size_t>(cut));
    return;
  }
  if (n >= cut) {
    std::memcpy(dst, src, sizeof(float) * static_cast<size_t>(cut));
    return;
  }
  long pos = 0;
  while (pos < cut) {
    long chunk = std::min(n, cut - pos);
    std::memcpy(dst + pos, src, sizeof(float) * static_cast<size_t>(chunk));
    pos += chunk;
  }
}

// float [-1, 1] -> int16 wire format, matching numpy rint semantics
// (round half to even — lrintf under the default rounding mode).  For
// 16-bit sources the decoder emitted exactly i/32768, so this inverts
// losslessly (sls_tpu/data/pipeline.to_wire documents the contract).
void to_i16(const float* src, int16_t* dst, long cut) {
  for (long i = 0; i < cut; ++i) {
    long q = lrintf(src[i] * 32768.0f);
    if (q > 32767) q = 32767;
    if (q < -32768) q = -32768;
    dst[i] = static_cast<int16_t>(q);
  }
}

}  // namespace

extern "C" {

// Decode one FLAC file to mono float32 in [-1, 1].  Returns the number of
// samples written (<= max_samples), or -1 on failure.
long slsaudio_decode_flac_file(const char* path, float* out,
                               long max_samples, int* sample_rate_out) {
  std::vector<uint8_t> data;
  if (!read_file(path, &data)) return -1;
  return decode_flac_buffer(data.data(), data.size(), out, max_samples,
                            sample_rate_out);
}

// Decode a whole batch in parallel: n files -> out[n * cut], each row
// decoded then repeat-tiled/cropped to `cut` samples (the reference `pad`
// semantics, data_utils_SSL.py:58-65).  Unreadable/corrupt files produce
// zero rows (eval zero-fallback).  When `rates_out` is non-null it
// receives each file's sample rate (0 on failure) so callers can detect
// off-rate audio instead of silently training at the wrong rate
// (reference always resampled: data_utils_SSL.py:87).  Returns the
// number of successfully decoded files.
int slsaudio_decode_batch_rates(const char** paths, int n, long cut,
                                float* out, int* rates_out, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int> next(0), ok_count(0);

  auto worker = [&]() {
    std::vector<float> tmp(static_cast<size_t>(cut));
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rate = 0;
      long got = slsaudio_decode_flac_file(paths[i], tmp.data(), cut,
                                           &rate);
      if (got > 0) ok_count.fetch_add(1);
      if (rates_out) rates_out[i] = got > 0 ? rate : 0;
      pad_or_tile(tmp.data(), got, out + static_cast<long>(i) * cut, cut);
    }
  };

  int workers = std::min(n_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(workers));
  for (int i = 0; i < workers; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

int slsaudio_decode_batch(const char** paths, int n, long cut, float* out,
                          int n_threads) {
  return slsaudio_decode_batch_rates(paths, n, cut, out, nullptr, n_threads);
}

// Batch decode straight to the int16 wire format (half the bytes the
// host hands to the device; see sls_tpu/data/pipeline.to_wire).  The
// float->int16 conversion runs fused inside the decode workers while
// the row is still cache-hot — measured on the 1-core bench image, the
// equivalent numpy pass after a float decode cost ~3x decode-only
// throughput (380 -> 107 utts/s), which this path eliminates.
int slsaudio_decode_batch_rates_i16(const char** paths, int n, long cut,
                                    int16_t* out, int* rates_out,
                                    int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int> next(0), ok_count(0);

  auto worker = [&]() {
    std::vector<float> tmp(static_cast<size_t>(cut));
    std::vector<float> row(static_cast<size_t>(cut));
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rate = 0;
      long got = slsaudio_decode_flac_file(paths[i], tmp.data(), cut,
                                           &rate);
      if (got > 0) ok_count.fetch_add(1);
      if (rates_out) rates_out[i] = got > 0 ? rate : 0;
      pad_or_tile(tmp.data(), got, row.data(), cut);
      to_i16(row.data(), out + static_cast<long>(i) * cut, cut);
    }
  };

  int workers = std::min(n_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(workers));
  for (int i = 0; i < workers; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

}  // extern "C"
