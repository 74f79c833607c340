// rANS range coder for the TPU video codec framework.
//
// Host-side native entropy coding: the TPU computes symbols, CDF indexes and
// quantized CDF tables; this library turns them into/out of bytes. It is the
// native replacement for the C++ coder the reference reaches through
// compressai (/root/reference/dmc/models/base_model.py:37 — rANS encoder /
// decoder + pmf_to_quantized_cdf pybind11 extensions).
//
// Design: byte-wise rANS (state in [2^23, 2^31), 8-bit renormalization),
// 16-bit probability precision. Out-of-range values escape through the final
// in-range bin and are bypass-coded in 4-bit chunks. The encoder buffers
// (start, freq) pairs and encodes in reverse so the decoder streams forward.
// Exposed via a C ABI consumed from Python with ctypes.

#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

constexpr uint32_t kRansByteL = 1u << 23;
constexpr int kPrecision = 16;
constexpr int kBypassPrecision = 4;
constexpr int32_t kMaxBypassVal = (1 << kBypassPrecision) - 1;

struct RansSymbol {
  uint16_t start;
  uint16_t freq;  // 0 marks a bypass chunk (raw `start` bits)
  bool bypass;
};

class Encoder {
 public:
  explicit Encoder(int64_t expected_syms) {
    // rANS must emit in reverse symbol order; buffer (start, freq) pairs.
    // Reserving up front keeps the hot loop allocation-free (the escape
    // path adds bypass chunks, hence the slack).
    syms_.reserve(static_cast<size_t>(expected_syms) + 64);
  }

  inline void put_symbol(uint32_t start, uint32_t freq) {
    syms_.push_back({static_cast<uint16_t>(start),
                     static_cast<uint16_t>(freq), false});
  }
  inline void put_bypass(int32_t val) {
    syms_.push_back({static_cast<uint16_t>(val), 0, true});
  }

  // Encode buffered symbols in reverse, writing bytes backward into the
  // tail of [buf, buf+cap); returns the number of bytes (they end up
  // forward-readable at buf[0..n) after the final memmove), or -1 if the
  // buffer is too small.
  int64_t flush_into(uint8_t* buf, int64_t cap) {
    uint32_t state = kRansByteL;
    uint8_t* end = buf + cap;
    uint8_t* p = end;  // grows downward; reversed stream == forward bytes
    for (auto it = syms_.rbegin(); it != syms_.rend(); ++it) {
      if (it->bypass) {
        // Renormalize so the shift keeps state within [L, L<<8).
        uint32_t x_max = ((kRansByteL << 8) >> kBypassPrecision);
        while (state >= x_max) {
          if (p == buf) return -1;
          *--p = static_cast<uint8_t>(state & 0xff);
          state >>= 8;
        }
        state = (state << kBypassPrecision) | (it->start & kMaxBypassVal);
      } else {
        uint32_t freq = it->freq;
        uint32_t x_max = ((kRansByteL >> kPrecision) << 8) * freq;
        while (state >= x_max) {
          if (p == buf) return -1;
          *--p = static_cast<uint8_t>(state & 0xff);
          state >>= 8;
        }
        state = ((state / freq) << kPrecision) + (state % freq) + it->start;
      }
    }
    // Flush final state (4 bytes, big-endian at the stream head).
    for (int i = 0; i < 4; ++i) {
      if (p == buf) return -1;
      *--p = static_cast<uint8_t>(state & 0xff);
      state >>= 8;
    }
    int64_t n = end - p;
    std::memmove(buf, p, static_cast<size_t>(n));
    return n;
  }

 private:
  std::vector<RansSymbol> syms_;
};

class Decoder {
 public:
  Decoder(const uint8_t* buf, int64_t n) : buf_(buf), end_(buf + n) {
    state_ = 0;
    for (int i = 0; i < 4; ++i) state_ = (state_ << 8) | next_byte();
  }

  // Returns the cumulative slot in [0, 2^precision).
  uint32_t peek_cum() const { return state_ & ((1u << kPrecision) - 1); }

  void advance(uint32_t start, uint32_t freq) {
    state_ = freq * (state_ >> kPrecision) + peek_cum() - start;
    while (state_ < kRansByteL) state_ = (state_ << 8) | next_byte();
  }

  int32_t get_bypass() {
    int32_t val = static_cast<int32_t>(state_ & kMaxBypassVal);
    state_ >>= kBypassPrecision;
    while (state_ < kRansByteL) state_ = (state_ << 8) | next_byte();
    return val;
  }

 private:
  uint8_t next_byte() { return buf_ < end_ ? *buf_++ : 0; }
  const uint8_t* buf_;
  const uint8_t* end_;
  uint32_t state_;
};

// Find symbol s with cdf[s] <= cum < cdf[s+1] (binary search over the row).
inline int32_t find_symbol(const int32_t* cdf, int32_t cdf_len, uint32_t cum) {
  int32_t lo = 0, hi = cdf_len - 1;  // invariant: cdf[lo] <= cum < cdf[hi]
  while (hi - lo > 1) {
    int32_t mid = (lo + hi) >> 1;
    if (static_cast<uint32_t>(cdf[mid]) <= cum)
      lo = mid;
    else
      hi = mid;
  }
  return lo;
}

}  // namespace

extern "C" {

// -- decode lookup table ------------------------------------------------------
// find_symbol's binary search (~7 dependent branchy loads per symbol) is the
// decoder's bottleneck. A full 2^16-slot cum -> symbol table is exact but
// 2 B x 65536 x rows = 8 MB for the 64-row scale table — it thrashes the
// cache when consecutive symbols hop rows (measured: no better than the
// search). Instead: a COARSE table of the first symbol in each 64-wide cum
// bucket (1024 buckets x 2 B x rows = 128 KB, always cache-resident) plus a
// short linear refine — peaked codec rows span ~1 symbol per bucket.

constexpr int kLutShift = 6;  // 2^16 cum space / 2^6 = 1024 buckets

// Per-(row, symbol) division-free encoder entry (ryg_rans reciprocal
// trick): (state/freq)<<16 + state%freq + start ==
// state + bias + ((state * rcp_freq) >> 32 >> rcp_shift) * cmpl_freq.
struct EncSym {
  uint32_t rcp_freq;
  uint32_t x_max;  // renorm threshold: 32768 * freq
  uint32_t bias;
  uint16_t cmpl_freq;
  uint16_t rcp_shift;
};

struct CoderTables {
  std::vector<uint16_t> dec_lut;  // coarse cum-bucket -> first symbol
  std::vector<EncSym> enc;        // cdf_rows x enc_stride
  int64_t enc_stride = 0;
};

void* dvc_rans_lut_build(const int32_t* cdfs, int64_t cdf_rows,
                         int64_t cdf_stride, const int32_t* cdf_lengths) {
  const int64_t buckets = int64_t{1} << (kPrecision - kLutShift);
  auto* t = new (std::nothrow) CoderTables;
  if (t == nullptr) return nullptr;
  t->dec_lut.resize(static_cast<size_t>(cdf_rows * buckets));
  t->enc_stride = cdf_stride - 1;  // max symbols per row
  t->enc.resize(static_cast<size_t>(cdf_rows * t->enc_stride));
  for (int64_t r = 0; r < cdf_rows; ++r) {
    const int32_t* cdf = cdfs + r * cdf_stride;
    const int32_t cdf_len = cdf_lengths[r];
    uint16_t* row = t->dec_lut.data() + r * buckets;
    int32_t s = 0;
    for (int64_t b = 0; b < buckets; ++b) {
      const int32_t cum = static_cast<int32_t>(b << kLutShift);
      while (s + 2 < cdf_len && cdf[s + 1] <= cum) ++s;
      row[b] = static_cast<uint16_t>(s);
    }
    EncSym* erow = t->enc.data() + r * t->enc_stride;
    for (int32_t sym = 0; sym + 1 < cdf_len; ++sym) {
      const uint32_t start = static_cast<uint32_t>(cdf[sym]);
      const uint32_t freq = static_cast<uint32_t>(cdf[sym + 1] - cdf[sym]);
      EncSym e;
      e.x_max = ((kRansByteL >> kPrecision) << 8) * freq;
      e.cmpl_freq = static_cast<uint16_t>((1u << kPrecision) - freq);
      if (freq < 2) {  // freq == 1: q == state exactly via rcp ~0 + bias fix
        e.rcp_freq = ~0u;
        e.rcp_shift = 0;
        e.bias = start + (1u << kPrecision) - 1;
      } else {
        uint32_t shift = 0;
        while (freq > (1u << shift)) ++shift;
        e.rcp_freq = static_cast<uint32_t>(
            ((uint64_t{1} << (shift + 31)) + freq - 1) / freq);
        e.rcp_shift = static_cast<uint16_t>(shift - 1);
        e.bias = start;
      }
      erow[sym] = e;
    }
  }
  return t;
}

void dvc_rans_lut_free(void* lut) {
  delete static_cast<CoderTables*>(lut);
}

// Encode n symbols. cdfs is (cdf_rows, cdf_stride) row-major int32; row r has
// cdf_lengths[r] valid entries ending in 2^16. Symbol s on row r codes the
// integer value v = s; the coded alphabet spans [0, cdf_lengths[r]-2) with the
// final bin (cdf_lengths[r]-2) the escape symbol; `offsets[r]` shifts raw
// values: coded = value - offsets[r].
// Returns number of bytes written to out_buf, or -1 if out_capacity too small.
int64_t dvc_rans_encode_with_indexes(
    const int32_t* values, const int32_t* indexes, int64_t n,
    const int32_t* cdfs, int64_t cdf_rows, int64_t cdf_stride,
    const int32_t* cdf_lengths, const int32_t* offsets, uint8_t* out_buf,
    int64_t out_capacity) {
  (void)cdf_rows;
  Encoder enc(n);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;  // index of escape bin

    // 64-bit: values/offsets are int32 so their difference (and the folded
    // raw value below) overflows int32. With 32-bit arithmetic an INT32_MIN
    // symbol made raw_val negative via UB, and the arithmetic right shift in
    // the chunk-count loop then never reached zero — an infinite loop on the
    // kind of garbage symbols an untrained model can emit. The unsigned
    // 64-bit form is total over the full int32 input range.
    int64_t value = static_cast<int64_t>(values[i]) - offsets[idx];
    uint64_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint64_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint64_t>(2 * (value - max_value));
      value = max_value;
    }
    enc.put_symbol(cdf[value], cdf[value + 1] - cdf[value]);

    if (value == max_value) {
      // Bypass-code raw_val: chunk count (unary in base-15), then chunks.
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      int32_t v = n_bypass;
      while (v >= kMaxBypassVal) {
        enc.put_bypass(kMaxBypassVal);
        v -= kMaxBypassVal;
      }
      enc.put_bypass(v);
      for (int32_t j = 0; j < n_bypass; ++j)
        enc.put_bypass(static_cast<int32_t>(
            (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal));
    }
  }
  return enc.flush_into(out_buf, out_capacity);
}

// Decode n symbols from buf; writes integer values (already offset-shifted
// back) into out_values. `lut` is an optional handle from dvc_rans_lut_build
// for the same CDF tables (nullptr -> binary-search fallback).
// Returns 0 on success.
int64_t dvc_rans_decode_with_indexes_lut(
    const uint8_t* buf, int64_t nbytes, const int32_t* indexes, int64_t n,
    const int32_t* cdfs, int64_t cdf_rows, int64_t cdf_stride,
    const int32_t* cdf_lengths, const int32_t* offsets, int32_t* out_values,
    const void* lut_handle) {
  (void)cdf_rows;
  const uint16_t* lut =
      lut_handle == nullptr
          ? nullptr
          : static_cast<const CoderTables*>(lut_handle)->dec_lut.data();
  Decoder dec(buf, nbytes);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum = dec.peek_cum();
    int32_t s;
    if (lut != nullptr) {
      s = static_cast<int32_t>(
          lut[(static_cast<int64_t>(idx) << (kPrecision - kLutShift)) +
              (cum >> kLutShift)]);
      while (s + 2 < cdf_len && static_cast<uint32_t>(cdf[s + 1]) <= cum) ++s;
    } else {
      s = find_symbol(cdf, cdf_len, cum);
    }
    dec.advance(cdf[s], cdf[s + 1] - cdf[s]);

    int64_t value = s;
    if (s == max_value) {
      int32_t n_bypass = 0, chunk;
      while ((chunk = dec.get_bypass()) == kMaxBypassVal)
        n_bypass += kMaxBypassVal;
      n_bypass += chunk;
      uint64_t raw_val = 0;  // 64-bit mirror of the encoder (see above)
      for (int32_t j = 0; j < n_bypass; ++j) {
        const uint64_t chunk_bits =
            static_cast<uint64_t>(dec.get_bypass());
        if (j * kBypassPrecision < 64)  // guard UB on corrupt streams
          raw_val |= chunk_bits << (j * kBypassPrecision);
      }
      value = static_cast<int64_t>(raw_val >> 1) + max_value;
      if (raw_val & 1)  // raw odd -> negative
        value = -static_cast<int64_t>((raw_val + 1) >> 1);
    }
    out_values[i] = static_cast<int32_t>(value + offsets[idx]);
  }
  return 0;
}

// Back-compat entry point (binary-search path).
int64_t dvc_rans_decode_with_indexes(
    const uint8_t* buf, int64_t nbytes, const int32_t* indexes, int64_t n,
    const int32_t* cdfs, int64_t cdf_rows, int64_t cdf_stride,
    const int32_t* cdf_lengths, const int32_t* offsets, int32_t* out_values) {
  return dvc_rans_decode_with_indexes_lut(buf, nbytes, indexes, n, cdfs,
                                          cdf_rows, cdf_stride, cdf_lengths,
                                          offsets, out_values, nullptr);
}

// Table-accelerated encoder: single reverse pass, division-free via the
// per-symbol reciprocal entries, no symbol buffering. Emits the exact same
// byte stream as dvc_rans_encode_with_indexes (asserted in tests).
// Returns bytes written, or -1 if out_capacity is too small.
int64_t dvc_rans_encode_with_indexes_tab(
    const int32_t* values, const int32_t* indexes, int64_t n,
    const int32_t* cdfs, int64_t cdf_rows, int64_t cdf_stride,
    const int32_t* cdf_lengths, const int32_t* offsets, uint8_t* out_buf,
    int64_t out_capacity, const void* handle) {
  if (handle == nullptr)
    return dvc_rans_encode_with_indexes(values, indexes, n, cdfs, cdf_rows,
                                        cdf_stride, cdf_lengths, offsets,
                                        out_buf, out_capacity);
  const CoderTables* t = static_cast<const CoderTables*>(handle);
  uint32_t state = kRansByteL;
  uint8_t* const buf = out_buf;
  uint8_t* p = out_buf + out_capacity;  // bytes grow downward

  // rANS emits in reverse of decode order. Decode reads, per symbol:
  // escape-coded symbol, then the unary chunk count, then the chunks —
  // so walking values backward, each symbol emits: chunks reversed, the
  // unary reversed, then the (escape) symbol itself.
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t idx = indexes[i];
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;
    const EncSym* erow = t->enc.data() + idx * t->enc_stride;

    int64_t value = static_cast<int64_t>(values[i]) - offsets[idx];
    uint64_t raw_val = 0;
    bool escape = false;
    if (value < 0) {
      raw_val = static_cast<uint64_t>(-2 * value - 1);
      value = max_value;
      escape = true;
    } else if (value >= max_value) {
      raw_val = static_cast<uint64_t>(2 * (value - max_value));
      value = max_value;
      escape = true;
    }

    if (escape) {
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      // chunks, last first
      for (int32_t j = n_bypass - 1; j >= 0; --j) {
        const uint32_t chunk = static_cast<uint32_t>(
            (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal);
        uint32_t x_max = (kRansByteL << 8) >> kBypassPrecision;
        while (state >= x_max) {
          if (p == buf) return -1;
          *--p = static_cast<uint8_t>(state & 0xff);
          state >>= 8;
        }
        state = (state << kBypassPrecision) | chunk;
      }
      // unary chunk count, reversed: the final (< 15) digit first
      int32_t v = n_bypass;
      const int32_t tail = v % kMaxBypassVal;
      const int32_t n_full = v / kMaxBypassVal;
      for (int32_t j = 0; j <= n_full; ++j) {
        const uint32_t digit = static_cast<uint32_t>(
            j == 0 ? tail : kMaxBypassVal);
        uint32_t x_max = (kRansByteL << 8) >> kBypassPrecision;
        while (state >= x_max) {
          if (p == buf) return -1;
          *--p = static_cast<uint8_t>(state & 0xff);
          state >>= 8;
        }
        state = (state << kBypassPrecision) | digit;
      }
    }

    const EncSym e = erow[value];
    while (state >= e.x_max) {
      if (p == buf) return -1;
      *--p = static_cast<uint8_t>(state & 0xff);
      state >>= 8;
    }
    const uint32_t q = static_cast<uint32_t>(
        (static_cast<uint64_t>(state) * e.rcp_freq) >> 32) >> e.rcp_shift;
    state = state + e.bias + q * e.cmpl_freq;
  }

  for (int i = 0; i < 4; ++i) {
    if (p == buf) return -1;
    *--p = static_cast<uint8_t>(state & 0xff);
    state >>= 8;
  }
  const int64_t nb = (out_buf + out_capacity) - p;
  std::memmove(out_buf, p, static_cast<size_t>(nb));
  return nb;
}

// Quantize a pmf (pmf_len in-range bins + tail_mass appended internally) to a
// 16-bit integer CDF of length pmf_len + 2. Returns 0 on success.
int64_t dvc_pmf_to_quantized_cdf(const double* pmf, int64_t pmf_len,
                                 double tail_mass, int32_t* out_cdf) {
  const int64_t n = pmf_len + 1;  // + tail bin
  const int64_t total = 1 << kPrecision;
  double sum = tail_mass;
  for (int64_t i = 0; i < pmf_len; ++i) sum += pmf[i];
  if (sum <= 0) return -1;

  std::vector<int64_t> freqs(n);
  std::vector<double> p(n);
  for (int64_t i = 0; i < n; ++i) {
    double pi = (i < pmf_len ? pmf[i] : tail_mass) / sum;
    p[i] = pi;
    int64_t f = static_cast<int64_t>(pi * total + 0.5);
    freqs[i] = f < 1 ? 1 : f;
  }
  int64_t diff = total;
  for (int64_t i = 0; i < n; ++i) diff -= freqs[i];
  if (diff > 0) {
    // give the surplus to the most under-represented bin
    int64_t best = 0;
    double best_err = -1e300;
    for (int64_t i = 0; i < n; ++i) {
      double err = p[i] - static_cast<double>(freqs[i]) / total;
      if (err > best_err) {
        best_err = err;
        best = i;
      }
    }
    freqs[best] += diff;
  } else {
    while (diff < 0) {
      // steal from the largest bin that can afford it
      int64_t best = -1;
      for (int64_t i = 0; i < n; ++i)
        if (freqs[i] > 1 && (best < 0 || freqs[i] > freqs[best])) best = i;
      if (best < 0) return -1;
      int64_t take = -diff < freqs[best] - 1 ? -diff : freqs[best] - 1;
      freqs[best] -= take;
      diff += take;
    }
  }
  out_cdf[0] = 0;
  for (int64_t i = 0; i < n; ++i)
    out_cdf[i + 1] = out_cdf[i] + static_cast<int32_t>(freqs[i]);
  return out_cdf[n] == total ? 0 : -1;
}

}  // extern "C"
