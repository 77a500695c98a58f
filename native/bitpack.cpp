// Native bit-packing for the HSCT stream format (hsc_tpu/io/bitstream.py).
//
// The reference (sbrodeur/hierarchical-sparse-coding) has no native code and
// no serializer at all — its entropy stage only *counts* bits
// (hsc/analysis.py).  This is the rebuild's host-side packer: the device
// emits fixed-width (position, atom, amplitude) event tuples; packing them
// into the MSB-first bitstream is pure byte shuffling that belongs on the
// host CPU (SURVEY.md §7 H4 — variable-length output does not fit XLA's
// static shapes).  Semantics must match _pack_bits/_unpack_bits in
// bitstream.py exactly; tests compare both byte-for-byte.
//
// Build: g++ -O3 -shared -fPIC -o libhscbitpack.so bitpack.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// vals: row-major [n][nfields]; widths[nfields] bit widths (sum <= 64).
// out: preallocated (n * sum(widths) + 7) / 8 bytes, zeroed by caller.
void hsc_pack_events(const uint64_t* vals, int64_t n, const int32_t* widths,
                     int32_t nfields, uint8_t* out) {
  uint64_t acc = 0;   // bit accumulator, MSB-first
  int nacc = 0;       // bits in accumulator
  int64_t byte = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j = 0; j < nfields; ++j) {
      const int w = widths[j];
      const uint64_t v = vals[i * nfields + j] & ((w == 64) ? ~0ULL : ((1ULL << w) - 1));
      acc = (acc << w) | v;
      nacc += w;
      while (nacc >= 8) {
        nacc -= 8;
        out[byte++] = (uint8_t)(acc >> nacc);
      }
    }
  }
  if (nacc > 0) {
    out[byte++] = (uint8_t)(acc << (8 - nacc));
  }
}

// Inverse: fills vals [n][nfields] from the packed MSB-first buffer.
void hsc_unpack_events(const uint8_t* data, int64_t n, const int32_t* widths,
                       int32_t nfields, uint64_t* vals) {
  uint64_t acc = 0;
  int nacc = 0;
  int64_t byte = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j = 0; j < nfields; ++j) {
      const int w = widths[j];
      while (nacc < w) {
        acc = (acc << 8) | data[byte++];
        nacc += 8;
      }
      nacc -= w;
      vals[i * nfields + j] = (acc >> nacc) & ((w == 64) ? ~0ULL : ((1ULL << w) - 1));
      acc &= (nacc == 64) ? ~0ULL : ((1ULL << nacc) - 1);
    }
  }
}

}  // extern "C"
