// Native host runtime for flatquant_tpu: threaded checkpoint-conversion
// kernels (the load/export pipeline's CPU-bound inner loops).
//
// The reference's load path leans on torch for dtype bridging
// (deepseek_v3/model.py + kernel.py:55-105 dequantize fp8 per-forward on
// GPU; HF loading goes through torch.float8_e4m3fn). On TPU the weights
// dequantize ONCE at load (they proceed to int4 anyway), so the conversion
// runs on host CPUs — at 671B scale that is ~700 GB of fp8 bytes, and a
// single-threaded Python/torch bridge is the bottleneck. These kernels are
// OpenMP-parallel, LUT-based, and operate straight on mmap'd safetensors
// payload bytes (no torch, no copies before the convert).
//
// Exposed C ABI (ctypes, see native/__init__.py):
//   fq_fp8_e4m3_to_f32        flat fp8 -> f32
//   fq_fp8_block_dequant      fp8 [out,in] * tile scales [so,si] -> f32
//   fq_bf16_to_f32            raw bf16 u16 -> f32 (u32 = u16 << 16)
//   fq_f16_to_f32             raw IEEE half -> f32
//   fq_pack_int4_planar       int8 codes [n,k] -> planar biased nibbles
//   fq_unpack_int4_planar     inverse
//
// Build: g++ -O3 -shared -fPIC -fopenmp (native/__init__.py does this
// lazily and caches the .so; every entry point has a numpy fallback).

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// fp8 E4M3 (float8_e4m3fn: bias 7, no inf, NaN = s.1111.111)
// ---------------------------------------------------------------------------

static float g_e4m3_lut[256];
static int g_lut_ready = 0;

static void build_e4m3_lut() {
  for (int b = 0; b < 256; ++b) {
    int sign = (b >> 7) & 1;
    int exp = (b >> 3) & 0xF;
    int mant = b & 0x7;
    float v;
    if (exp == 0xF && mant == 0x7) {
      v = __builtin_nanf("");
    } else if (exp == 0) {
      v = (float)mant / 8.0f / 64.0f;  // subnormal: mant/8 * 2^-6
    } else {
      v = ldexpf(1.0f + (float)mant / 8.0f, exp - 7);
    }
    g_e4m3_lut[b] = sign ? -v : v;
  }
  g_lut_ready = 1;
}

void fq_fp8_e4m3_to_f32(const uint8_t* src, int64_t n, float* dst) {
  if (!g_lut_ready) build_e4m3_lut();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = g_e4m3_lut[src[i]];
}

// w [out, in] fp8 row-major; scales [srows, scols] f32 with tile size
// `block` (srows = ceil(out/block), scols = ceil(in/block)) — the HF
// DeepSeek weight_scale_inv layout (models/ds_loader.py header).
void fq_fp8_block_dequant(const uint8_t* w, int64_t out_dim, int64_t in_dim,
                          const float* scales, int64_t scols, int64_t block,
                          float* dst) {
  if (!g_lut_ready) build_e4m3_lut();
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < out_dim; ++r) {
    const uint8_t* wr = w + r * in_dim;
    float* dr = dst + r * in_dim;
    const float* srow = scales + (r / block) * scols;
    for (int64_t c0 = 0; c0 < in_dim; c0 += block) {
      const float s = srow[c0 / block];
      const int64_t c1 = (c0 + block < in_dim) ? c0 + block : in_dim;
      for (int64_t c = c0; c < c1; ++c) dr[c] = g_e4m3_lut[wr[c]] * s;
    }
  }
}

// ---------------------------------------------------------------------------
// half-precision widenings
// ---------------------------------------------------------------------------

void fq_bf16_to_f32(const uint16_t* src, int64_t n, float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint32_t u = (uint32_t)src[i] << 16;
    std::memcpy(&dst[i], &u, 4);
  }
}

void fq_f16_to_f32(const uint16_t* src, int64_t n, float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint16_t h = src[i];
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t u;
    if (exp == 0) {
      if (mant == 0) {
        u = sign;
      } else {  // subnormal: normalize
        int shift = 0;
        while (!(mant & 0x400)) {
          mant <<= 1;
          ++shift;
        }
        mant &= 0x3FF;
        u = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
      }
    } else if (exp == 0x1F) {
      u = sign | 0x7F800000u | (mant << 13);
    } else {
      u = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    std::memcpy(&dst[i], &u, 4);
  }
}

// ---------------------------------------------------------------------------
// int4 planar pack/unpack (kernels/int4_matmul.py pack_weight_planar):
// byte c of row r = (q[r,c]+8) | ((q[r,c+k/2]+8) << 4)
// ---------------------------------------------------------------------------

void fq_pack_int4_planar(const int8_t* q, int64_t n, int64_t k, uint8_t* dst) {
  const int64_t kh = k / 2;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n; ++r) {
    const int8_t* qr = q + r * k;
    uint8_t* dr = dst + r * kh;
    for (int64_t c = 0; c < kh; ++c) {
      uint8_t lo = (uint8_t)(qr[c] + 8) & 0xF;
      uint8_t hi = (uint8_t)(qr[c + kh] + 8) & 0xF;
      dr[c] = lo | (hi << 4);
    }
  }
}

void fq_unpack_int4_planar(const uint8_t* p, int64_t n, int64_t k,
                           int8_t* dst) {
  const int64_t kh = k / 2;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n; ++r) {
    const uint8_t* pr = p + r * kh;
    int8_t* dr = dst + r * k;
    for (int64_t c = 0; c < kh; ++c) {
      dr[c] = (int8_t)(pr[c] & 0xF) - 8;
      dr[c + kh] = (int8_t)(pr[c] >> 4) - 8;
    }
  }
}

int fq_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
