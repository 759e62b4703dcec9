// Native data-path kernels for wavenet_tpu: wav decode, polyphase
// resampling, RMS silence trimming, mu-law codec.
//
// The reference's data pipeline bottomed out in native code it didn't own
// (librosa -> audioread/libsndfile C decoders + resamplers, and
// tf.PaddingFIFOQueue's C++ queue kernels; reference audio_reader.py
// ≈:42-66). This library is our owned equivalent: a small C-ABI .so the
// Python loader calls through ctypes, so the host-side feed path does no
// per-sample Python work. Functions are pure buffer-in/buffer-out and
// thread-safe (no globals) — the AudioReader worker threads call them
// concurrently.
//
// Build: make (g++ -O3 -shared). Exact-parity contracts that tests pin:
//   * mu-law encode/decode match wavenet_tpu.audio formulas bit-for-bit
//     in float32 (same clamp, same +0.5 rounding),
//   * trim window matches the Python RMS-frame implementation,
//   * wav decode matches scipy.io.wavfile scaling for PCM16/PCM32/float32.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// mu-law codec (exact float32 parity with wavenet_tpu/audio.py)
// ---------------------------------------------------------------------------

void wn_mulaw_encode(const float* in, int64_t n, int32_t q, int32_t* out) {
    const float mu = (float)(q - 1);
    const float inv_log1p_mu = 1.0f / std::log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        float x = in[i];
        float safe = std::fabs(x);
        if (safe > 1.0f) safe = 1.0f;
        float magnitude = std::log1p(mu * safe) * inv_log1p_mu;
        float signal = (x > 0.0f ? 1.0f : (x < 0.0f ? -1.0f : 0.0f)) * magnitude;
        out[i] = (int32_t)((signal + 1.0f) / 2.0f * mu + 0.5f);
    }
}

void wn_mulaw_decode(const int32_t* in, int64_t n, int32_t q, float* out) {
    const float mu = (float)(q - 1);
    for (int64_t i = 0; i < n; ++i) {
        float signal = 2.0f * ((float)in[i] / mu) - 1.0f;
        float magnitude =
            (1.0f / mu) * (std::pow(1.0f + mu, std::fabs(signal)) - 1.0f);
        out[i] = (signal > 0.0f ? 1.0f : (signal < 0.0f ? -1.0f : 0.0f)) *
                 magnitude;
    }
}

// ---------------------------------------------------------------------------
// WAV decode (RIFF PCM16/PCM32/IEEE-float32, arbitrary channel count)
// ---------------------------------------------------------------------------

// Returns 0 on success. Caller frees *out with wn_free. Output is mono
// float32 in [-1, 1] (channel average), *n_out samples at *sr native rate.
int wn_load_wav(const char* path, float** out, int64_t* n_out, int32_t* sr) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    auto rd_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
    auto rd_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };

    char tag[4];
    uint32_t riff_size;
    if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) ||
        !rd_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
        std::memcmp(tag, "WAVE", 4)) {
        std::fclose(f);
        return -2;
    }

    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    long data_pos = -1;
    uint32_t data_len = 0;

    while (std::fread(tag, 1, 4, f) == 4) {
        uint32_t chunk_len;
        if (!rd_u32(&chunk_len)) break;
        if (!std::memcmp(tag, "fmt ", 4)) {
            uint32_t byte_rate;
            uint16_t block_align;
            if (!rd_u16(&fmt) || !rd_u16(&channels) || !rd_u32(&rate) ||
                !rd_u32(&byte_rate) || !rd_u16(&block_align) ||
                !rd_u16(&bits)) {
                std::fclose(f);
                return -3;
            }
            if (chunk_len > 16) std::fseek(f, chunk_len - 16, SEEK_CUR);
        } else if (!std::memcmp(tag, "data", 4)) {
            data_pos = std::ftell(f);
            data_len = chunk_len;
            std::fseek(f, (chunk_len + 1) & ~1u, SEEK_CUR);  // chunks pad to even
        } else {
            std::fseek(f, (chunk_len + 1) & ~1u, SEEK_CUR);
        }
    }
    if (data_pos < 0 || channels == 0) {
        std::fclose(f);
        return -4;
    }
    // WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real format in a
    // subchunk we skipped; PCM16 is the overwhelmingly common case there.
    bool is_float = (fmt == 3);
    if (fmt != 1 && fmt != 3 && fmt != 0xFFFE) {
        std::fclose(f);
        return -5;
    }

    std::fseek(f, data_pos, SEEK_SET);
    int64_t bytes_per_sample = bits / 8;
    int64_t frames = data_len / (bytes_per_sample * channels);
    float* mono = (float*)std::malloc(sizeof(float) * (size_t)frames);
    if (!mono) {
        std::fclose(f);
        return -6;
    }

    std::vector<uint8_t> buf((size_t)(bytes_per_sample * channels * 4096));
    int64_t written = 0;
    const float inv_ch = 1.0f / (float)channels;
    while (written < frames) {
        int64_t want = frames - written;
        if (want > 4096) want = 4096;
        size_t got = std::fread(buf.data(),
                                (size_t)(bytes_per_sample * channels),
                                (size_t)want, f);
        if (got == 0) break;
        for (size_t i = 0; i < got; ++i) {
            float acc = 0.0f;
            for (int c = 0; c < channels; ++c) {
                const uint8_t* p =
                    buf.data() + (i * channels + c) * bytes_per_sample;
                float v;
                if (is_float && bits == 32) {
                    float s;
                    std::memcpy(&s, p, 4);
                    v = s;
                } else if (bits == 16) {
                    int16_t s;
                    std::memcpy(&s, p, 2);
                    v = (float)s / 32768.0f;  // scipy parity
                } else if (bits == 32) {
                    int32_t s;
                    std::memcpy(&s, p, 4);
                    v = (float)((double)s / 2147483648.0);
                } else if (bits == 8) {
                    v = ((float)p[0] - 128.0f) / 128.0f;
                } else {
                    v = 0.0f;
                }
                acc += v;
            }
            mono[written + (int64_t)i] = acc * inv_ch;
        }
        written += (int64_t)got;
    }
    std::fclose(f);
    *out = mono;
    *n_out = written;
    *sr = (int32_t)rate;
    return 0;
}

void wn_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// Polyphase resampling (windowed-sinc, Kaiser window)
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
    // Series expansion; converges fast for the beta range we use.
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 64; ++k) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k));
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
    while (b) {
        int64_t t = a % b;
        a = b;
        b = t;
    }
    return a;
}

// Rational resample in[n] @ sr_in -> *out @ sr_out. Output length
// ceil(n * L / M) (scipy.signal.resample_poly convention). Caller frees.
int wn_resample(const float* in, int64_t n, int32_t sr_in, int32_t sr_out,
                float** out, int64_t* n_out) {
    if (sr_in == sr_out) {
        float* copy = (float*)std::malloc(sizeof(float) * (size_t)n);
        if (!copy) return -1;
        std::memcpy(copy, in, sizeof(float) * (size_t)n);
        *out = copy;
        *n_out = n;
        return 0;
    }
    int64_t g = gcd64(sr_in, sr_out);
    int64_t L = sr_out / g, M = sr_in / g;

    // Anti-alias lowpass at min(pi/L, pi/M), 10 taps per zero crossing.
    const int half_zeros = 10;
    double cutoff = 1.0 / (double)(L > M ? L : M);
    int64_t half_len = half_zeros * (L > M ? L : M);
    int64_t taps = 2 * half_len + 1;
    const double beta = 8.555;  // ~80 dB stopband (Kaiser)
    std::vector<double> h((size_t)taps);
    double i0b = bessel_i0(beta);
    for (int64_t i = 0; i < taps; ++i) {
        double m = (double)(i - half_len);
        double sinc = (m == 0.0)
                          ? cutoff
                          : std::sin(M_PI * cutoff * m) / (M_PI * m);
        double w = (double)i / (double)(taps - 1) * 2.0 - 1.0;
        double kaiser = bessel_i0(beta * std::sqrt(1.0 - w * w)) / i0b;
        h[(size_t)i] = (double)L * sinc * kaiser;
    }

    int64_t out_len = (n * L + M - 1) / M;
    float* res = (float*)std::malloc(sizeof(float) * (size_t)out_len);
    if (!res) return -1;

    // y[j] = sum_k h[j*M - k*L + half_len] * x[k]  (upfirdn)
    for (int64_t j = 0; j < out_len; ++j) {
        int64_t t = j * M;  // position on the upsampled grid
        // k range where h index in [0, taps)
        int64_t idx0 = t - half_len;  // h index for k via (t - k*L) + ...
        // h_index = t - k*L + half_len  in [0, taps) =>
        // k in ((t + half_len - (taps-1)) / L, (t + half_len) / L]
        int64_t k_min = (t - half_len + L - 1) / L;
        if (k_min < 0) k_min = 0;
        int64_t k_max = (t + half_len) / L;
        if (k_max >= n) k_max = n - 1;
        double acc = 0.0;
        for (int64_t k = k_min; k <= k_max; ++k) {
            int64_t hi = t - k * L + half_len;
            acc += h[(size_t)hi] * (double)in[k];
        }
        (void)idx0;
        res[j] = (float)acc;
    }
    *out = res;
    *n_out = out_len;
    return 0;
}

// ---------------------------------------------------------------------------
// RMS silence trim (parity with wavenet_tpu.audio.trim_silence)
// ---------------------------------------------------------------------------

// Writes [start, end) of the kept region into *start/*end; whole-silence
// clips yield start == end == 0.
void wn_trim_silence(const float* in, int64_t n, float threshold,
                     int32_t frame_length, int64_t* start, int64_t* end) {
    if (n < frame_length) frame_length = (int32_t)(n > 0 ? n : 1);
    int64_t hop = frame_length >= 4 ? frame_length / 4 : 1;
    int64_t pad = frame_length / 2;
    int64_t padded_n = n + 2 * pad;
    int64_t n_frames = 1 + (padded_n - frame_length) / hop;
    if (n_frames <= 0) {
        *start = *end = 0;
        return;
    }
    int64_t first_loud = -1, last_loud = -1;
    for (int64_t fidx = 0; fidx < n_frames; ++fidx) {
        int64_t f0 = fidx * hop;  // in padded coordinates
        double sumsq = 0.0;
        for (int64_t i = 0; i < frame_length; ++i) {
            int64_t p = f0 + i - pad;  // unpadded index
            float v = (p >= 0 && p < n) ? in[p] : 0.0f;
            sumsq += (double)v * (double)v;
        }
        float rms = (float)std::sqrt(sumsq / (double)frame_length);
        if (rms > threshold) {
            if (first_loud < 0) first_loud = fidx;
            last_loud = fidx;
        }
    }
    if (first_loud < 0) {
        *start = *end = 0;
        return;
    }
    *start = first_loud * hop;
    int64_t e = (last_loud + 1) * hop;
    *end = e < n ? e : n;
}

}  // extern "C"
