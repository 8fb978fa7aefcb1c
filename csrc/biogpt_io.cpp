// biogpt_io — native codec core for the TPU framework's host-side IO.
//
// Bit-exact implementations of the ggml block-quant formats the engine
// serializes (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0; see quant/codecs.py for the layout
// spec, re-derived from the reference's codec usage at
// /root/reference/biogpt.cpp:565-585). Used by the Python layer through
// ctypes for fast checkpoint quantization/dequantization of multi-GB
// models, and doubles as an independent cross-check of the numpy codecs.
//
// Everything here is host-side: the TPU compute path consumes the plane
// layouts produced from these blocks.

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

// IEEE f32 -> f16 with round-to-nearest-even (matches numpy/GGML).
inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    const uint32_t sign = (x >> 16) & 0x8000u;
    const int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF) {                 // inf/nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0u));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);   // overflow -> inf
    if (exp <= 0) {                                   // subnormal / zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        const int shift = 14 - exp;
        uint32_t half = mant >> shift;
        const uint32_t rem = mant & ((1u << shift) - 1);
        const uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
    const uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

inline float f16_to_f32(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FFu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) {
            x = sign;
        } else {                                      // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400u)) { mant <<= 1; exp--; }
            mant &= 0x3FFu;
            x = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        x = sign | 0x7F800000u | (mant << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

constexpr int QK = 32;

}  // namespace

extern "C" {

// ---- encoders: x[n_blocks*32] f32 -> packed block bytes ----------------

void bgpt_quantize_q4_0(const float* x, uint8_t* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const float* xb = x + b * QK;
        uint8_t* ob = out + b * 18;
        float amax = 0.f, vmax = 0.f;
        for (int j = 0; j < QK; ++j) {
            const float v = xb[j];
            if (std::fabs(v) > amax) { amax = std::fabs(v); vmax = v; }
        }
        const float d = vmax / -8.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        for (int j = 0; j < 16; ++j) {
            int q0 = (int)(xb[j] * id + 8.5f);
            int q1 = (int)(xb[j + 16] * id + 8.5f);
            q0 = q0 < 0 ? 0 : (q0 > 15 ? 15 : q0);
            q1 = q1 < 0 ? 0 : (q1 > 15 ? 15 : q1);
            ob[2 + j] = (uint8_t)(q0 | (q1 << 4));
        }
    }
}

void bgpt_quantize_q4_1(const float* x, uint8_t* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const float* xb = x + b * QK;
        uint8_t* ob = out + b * 20;
        float mn = xb[0], mx = xb[0];
        for (int j = 1; j < QK; ++j) {
            if (xb[j] < mn) mn = xb[j];
            if (xb[j] > mx) mx = xb[j];
        }
        const float d = (mx - mn) / 15.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        const uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        std::memcpy(ob, &dh, 2);
        std::memcpy(ob + 2, &mh, 2);
        for (int j = 0; j < 16; ++j) {
            int q0 = (int)((xb[j] - mn) * id + 0.5f);
            int q1 = (int)((xb[j + 16] - mn) * id + 0.5f);
            q0 = q0 < 0 ? 0 : (q0 > 15 ? 15 : q0);
            q1 = q1 < 0 ? 0 : (q1 > 15 ? 15 : q1);
            ob[4 + j] = (uint8_t)(q0 | (q1 << 4));
        }
    }
}

void bgpt_quantize_q5_0(const float* x, uint8_t* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const float* xb = x + b * QK;
        uint8_t* ob = out + b * 22;
        float amax = 0.f, vmax = 0.f;
        for (int j = 0; j < QK; ++j) {
            const float v = xb[j];
            if (std::fabs(v) > amax) { amax = std::fabs(v); vmax = v; }
        }
        const float d = vmax / -16.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        uint32_t qh = 0;
        for (int j = 0; j < 16; ++j) {
            int q0 = (int)(xb[j] * id + 16.5f);
            int q1 = (int)(xb[j + 16] * id + 16.5f);
            q0 = q0 < 0 ? 0 : (q0 > 31 ? 31 : q0);
            q1 = q1 < 0 ? 0 : (q1 > 31 ? 31 : q1);
            ob[6 + j] = (uint8_t)((q0 & 0xF) | ((q1 & 0xF) << 4));
            qh |= (uint32_t)((q0 >> 4) & 1) << j;
            qh |= (uint32_t)((q1 >> 4) & 1) << (j + 16);
        }
        std::memcpy(ob + 2, &qh, 4);
    }
}

void bgpt_quantize_q5_1(const float* x, uint8_t* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const float* xb = x + b * QK;
        uint8_t* ob = out + b * 24;
        float mn = xb[0], mx = xb[0];
        for (int j = 1; j < QK; ++j) {
            if (xb[j] < mn) mn = xb[j];
            if (xb[j] > mx) mx = xb[j];
        }
        const float d = (mx - mn) / 31.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        const uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        std::memcpy(ob, &dh, 2);
        std::memcpy(ob + 2, &mh, 2);
        uint32_t qh = 0;
        for (int j = 0; j < 16; ++j) {
            int q0 = (int)((xb[j] - mn) * id + 0.5f);
            int q1 = (int)((xb[j + 16] - mn) * id + 0.5f);
            q0 = q0 < 0 ? 0 : (q0 > 31 ? 31 : q0);
            q1 = q1 < 0 ? 0 : (q1 > 31 ? 31 : q1);
            ob[8 + j] = (uint8_t)((q0 & 0xF) | ((q1 & 0xF) << 4));
            qh |= (uint32_t)((q0 >> 4) & 1) << j;
            qh |= (uint32_t)((q1 >> 4) & 1) << (j + 16);
        }
        std::memcpy(ob + 4, &qh, 4);
    }
}

void bgpt_quantize_q8_0(const float* x, uint8_t* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const float* xb = x + b * QK;
        uint8_t* ob = out + b * 34;
        float amax = 0.f;
        for (int j = 0; j < QK; ++j)
            if (std::fabs(xb[j]) > amax) amax = std::fabs(xb[j]);
        const float d = amax / 127.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        int8_t* q = (int8_t*)(ob + 2);
        for (int j = 0; j < QK; ++j)
            q[j] = (int8_t)std::roundf(xb[j] * id);
    }
}

// ---- decoders: block bytes -> f32[n_blocks*32] -------------------------

void bgpt_dequantize_q4_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* ib = in + b * 18;
        float* ob = out + b * QK;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        const float d = f16_to_f32(dh);
        for (int j = 0; j < 16; ++j) {
            ob[j] = ((ib[2 + j] & 0xF) - 8) * d;
            ob[j + 16] = ((ib[2 + j] >> 4) - 8) * d;
        }
    }
}

void bgpt_dequantize_q4_1(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* ib = in + b * 20;
        float* ob = out + b * QK;
        uint16_t dh, mh;
        std::memcpy(&dh, ib, 2); std::memcpy(&mh, ib + 2, 2);
        const float d = f16_to_f32(dh), m = f16_to_f32(mh);
        for (int j = 0; j < 16; ++j) {
            ob[j] = (ib[4 + j] & 0xF) * d + m;
            ob[j + 16] = (ib[4 + j] >> 4) * d + m;
        }
    }
}

void bgpt_dequantize_q5_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* ib = in + b * 22;
        float* ob = out + b * QK;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        uint32_t qh; std::memcpy(&qh, ib + 2, 4);
        const float d = f16_to_f32(dh);
        for (int j = 0; j < 16; ++j) {
            const int q0 = (ib[6 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
            const int q1 = (ib[6 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
            ob[j] = (q0 - 16) * d;
            ob[j + 16] = (q1 - 16) * d;
        }
    }
}

void bgpt_dequantize_q5_1(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* ib = in + b * 24;
        float* ob = out + b * QK;
        uint16_t dh, mh;
        std::memcpy(&dh, ib, 2); std::memcpy(&mh, ib + 2, 2);
        uint32_t qh; std::memcpy(&qh, ib + 4, 4);
        const float d = f16_to_f32(dh), m = f16_to_f32(mh);
        for (int j = 0; j < 16; ++j) {
            const int q0 = (ib[8 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
            const int q1 = (ib[8 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
            ob[j] = q0 * d + m;
            ob[j + 16] = q1 * d + m;
        }
    }
}

void bgpt_dequantize_q8_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* ib = in + b * 34;
        float* ob = out + b * QK;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        const float d = f16_to_f32(dh);
        const int8_t* q = (const int8_t*)(ib + 2);
        for (int j = 0; j < QK; ++j)
            ob[j] = q[j] * d;
    }
}

int bgpt_abi_version(void) { return 1; }

}  // extern "C"
