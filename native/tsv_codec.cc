// Native data-path accelerator for the TSV feature interchange.
//
// The reference's native layer is CUDA kernels; on TPU those became
// Pallas/XLA (ops/). What remains host-side and hot is the data loader:
// stage 2 decodes ~100 x 2054-d base64 float32 features per query out of
// JSON TSV rows, and TSVFile startup scans multi-GB files for line offsets.
// This module implements both in C++ (loaded via ctypes with a pure-python
// fallback, cpt_tpu/utils/native.py).
//
// Build: make -C native   (produces libtsv_codec.so)

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Base64 decode table: 0-63 valid, 255 invalid, 254 padding '='.
static uint8_t B64_LUT[256];
static bool lut_init_done = false;

static void init_lut() {
  if (lut_init_done) return;
  memset(B64_LUT, 255, sizeof(B64_LUT));
  const char* alpha =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  for (int i = 0; i < 64; ++i) B64_LUT[(uint8_t)alpha[i]] = (uint8_t)i;
  B64_LUT[(uint8_t)'='] = 254;
  lut_init_done = true;
}

// Decode one base64 string into out (raw bytes). Returns number of bytes
// written, or -1 on invalid input / overflow.
int64_t b64_decode(const char* src, int64_t src_len, uint8_t* out,
                   int64_t out_cap) {
  init_lut();
  int64_t o = 0;
  uint32_t acc = 0;
  int bits = 0;
  for (int64_t i = 0; i < src_len; ++i) {
    uint8_t c = B64_LUT[(uint8_t)src[i]];
    if (c == 254) break;  // padding: done
    if (c == 255) {
      if (src[i] == '\n' || src[i] == '\r') continue;
      return -1;
    }
    acc = (acc << 6) | c;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (o >= out_cap) return -1;
      out[o++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return o;
}

// Decode `n` base64 feature strings (flattened `srcs` with per-string
// offsets) into a contiguous float32 matrix [n, dim]. Each decoded string
// must be exactly dim*4 bytes. Returns 0 on success, -(row+1) on error.
int64_t decode_features_f32(const char* srcs, const int64_t* offsets,
                            int64_t n, int64_t dim, float* out) {
  for (int64_t r = 0; r < n; ++r) {
    const char* s = srcs + offsets[r];
    int64_t len = offsets[r + 1] - offsets[r];
    int64_t got = b64_decode(s, len, (uint8_t*)(out + r * dim), dim * 4);
    if (got != dim * 4) return -(r + 1);
  }
  return 0;
}

// Scan a file for line-start byte offsets (the .lineidx sidecar).
// Writes up to max_lines offsets into `out`; returns the line count, or -1
// if the file can't be opened, or -2 if max_lines is too small.
int64_t scan_lineidx(const char* path, int64_t* out, int64_t max_lines) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  const size_t BUF = 1 << 20;
  char* buf = new char[BUF];
  int64_t count = 0;
  int64_t pos = 0;
  bool at_line_start = true;
  size_t got;
  while ((got = fread(buf, 1, BUF, f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      if (at_line_start) {
        if (count >= max_lines) {
          delete[] buf;
          fclose(f);
          return -2;
        }
        out[count++] = pos + (int64_t)i;
        at_line_start = false;
      }
      if (buf[i] == '\n') at_line_start = true;
    }
    pos += (int64_t)got;
  }
  delete[] buf;
  fclose(f);
  return count;
}

}  // extern "C"
